package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over interaction logs — the user↔item click graph a
  * recommendation / data-valuation pipeline builds from an events
  * table. Complements [[Dedup.connectedComponents]] (the other
  * iterative graph op) with rank propagation and degree synopses; the
  * same materialization discipline applies: per-iteration
  * localCheckpoint to truncate lineage, shuffles bounded by the edge
  * count, state bounded by the node count.
  */
object Graphs {

  /** Distinct directed edges (srcExpr → dstExpr) from an event log.
    * Callers offset one side's id space when the graph is bipartite
    * (users and items both small-integer keyed).
    */
  def edges(events: DataFrame, srcExpr: Column, dstExpr: Column): DataFrame =
    events.select(srcExpr.cast("long").as("src"),
      dstExpr.cast("long").as("dst")).distinct()

  /** PageRank in FIXED-POINT integer arithmetic: ranks are integers at
    * `scale` (1e6 = 6 decimal digits), the damping contribution is
    * integer division `(rank · dampNum) div (dampDen · outdeg)`, and
    * the per-node base is `scale · (dampDen − dampNum) / dampDen`. The
    * spec is DEFINED over integers so every engine — and every
    * execution order, since integer addition commutes exactly —
    * reproduces bit-identical ranks: floating-point PageRank is
    * summation-order-dependent, which is exactly what a cross-engine
    * verification gate cannot tolerate. Truncation loses < 1 ulp of
    * scale per in-edge per iteration (dangling mass is dropped, the
    * usual simplification).
    *
    * Plan per iteration: ranks ⋈ out-degrees ⋈ edges (all equi-joins
    * on node id, edge-bounded) → one aggregate on dst → left join onto
    * the node list for dangling nodes. Each round materializes via
    * localCheckpoint exactly like [[Dedup.connectedComponents]] — an
    * unbounded iterative plan would re-execute every prior round at
    * every action. State is (node, rank): two longs per node.
    */
  def pageRankFixedPoint(edgeDf: DataFrame, iters: Int,
      scale: Long = 1000000L, dampNum: Long = 85,
      dampDen: Long = 100): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen, "bad params")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edgeDf.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct().persist(MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist(MEMORY_AND_DISK)
    val base = scale * (dampDen - dampNum) / dampDen
    def materialize(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint()
      c.sparkSession.createDataFrame(c.rdd, c.schema)
    }
    var ranks = materialize(nodes.select(col("id"), lit(scale).as("rank")))
    for (_ <- 1 to iters) {
      val contrib = e.join(outdeg, Seq("src"))
        .join(ranks, e("src") === ranks("id"))
        .select(col("dst").as("id"),
          expr(s"(rank * $dampNum) div ($dampDen * deg)").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = materialize(nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("s"), lit(0L))).as("rank")))
    }
    e.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks
  }

  /** Degree distribution per direction: (side, deg, n_nodes) where
    * side 'out' buckets source nodes by out-degree and 'in' buckets
    * destinations by in-degree — the synopsis that tells you whether a
    * rank/join over this graph needs skew handling BEFORE running it.
    * Two edge-bounded aggregates; output is as many rows as distinct
    * degrees.
    */
  def degreeHistogram(edgeDf: DataFrame): DataFrame = {
    def hist(keyCol: String, side: String) =
      edgeDf.groupBy(col(keyCol)).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
        .select(lit(side).as("side"), col("deg"), col("n_nodes"))
    hist("src", "out").unionByName(hist("dst", "in"))
  }
}
