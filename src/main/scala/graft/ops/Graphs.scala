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
    // e is materialized eagerly (r17): the outdeg/nodes/ed cache builds
    // below are concurrent AQE stages that would otherwise race to
    // compute a lazily-persisted distinct (see Dedup.materialized)
    val e = Dedup.materialized(
      edgeDf.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct())
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist(MEMORY_AND_DISK)
    val base = scale * (dampDen - dampNum) / dampDen
    // materialize WITHOUT the external-Row round-trip (r16): fresh
    // attribute ids + truncated lineage via internal rows — see
    // GraftColumnBridge.freshAttributes
    def materialize(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftColumnBridge.freshAttributes(
        df.localCheckpoint())
    // the edge ⋈ outdeg join is LOOP-INVARIANT (guide §2.4): hoist it
    // out of the iteration and persist it hash-partitioned by src, so
    // each round joins only the (small) rank frame against an already
    // co-partitioned edge table instead of re-joining and re-shuffling
    // the edges every iteration
    val ed = e.join(outdeg, Seq("src"))
      .repartition(col("src"))
      .persist(MEMORY_AND_DISK)
    // Checkpoint CADENCE, not every round (r16): each round references
    // the previous rank frame exactly ONCE, so the un-checkpointed plan
    // grows linearly (unlike CC's 3-references-per-round shape that
    // motivated per-round checkpoints), and a handful of rounds execute
    // as ONE job with end-to-end AQE instead of paying an eager
    // checkpoint write + a fixed 32-partition cached scan per round —
    // measured ~1.5 s of q_pagerank's 2.9 s at sf0.1. The cadence keeps
    // the lineage bound for large `iters`.
    val ckptEvery = 8
    var ranks: DataFrame = nodes.select(col("id"), lit(scale).as("rank"))
    for (i <- 1 to iters) {
      val contrib = ed
        .join(ranks, ed("src") === ranks("id"))
        .select(col("dst").as("id"),
          expr(s"(rank * $dampNum) div ($dampDen * deg)").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      val next = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
      ranks = if (i % ckptEvery == 0) materialize(next) else next
    }
    // materialize the final frame BEFORE releasing the caches it is
    // built over — the lazy plan must not recompute e/ed/nodes uncached
    // at the caller's action
    val result = materialize(ranks)
    ed.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    result
  }

  /** Multi-source BFS hop distances: the minimum number of edges from
    * any seed node, up to `maxHops` — reachability/influence radius
    * over the interaction graph (e.g. "how far does a purchasing
    * cohort sit from each item"). Exactly `maxHops` rounds of
    * min-propagation with the [[Dedup.connectedComponents]]
    * materialization discipline; distances are small integers, so the
    * result is engine-exact and a bounded recursive CTE replays it.
    * Unreached nodes are absent from the output (no sentinel rows).
    * Each round's shuffle is edge-bounded; state is (node, dist).
    */
  def bfsHops(edgeDf: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "maxHops >= 1")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edgeDf.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct().persist(MEMORY_AND_DISK)
    // internal-row materialize — see GraftColumnBridge.freshAttributes
    def materialize(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftColumnBridge.freshAttributes(
        df.localCheckpoint())
    var dist = materialize(
      seeds.select(col("id").cast("long").as("id"), lit(0).as("hops"))
        .distinct())
    for (_ <- 1 to maxHops) {
      val prop = e.join(dist, e("src") === dist("id"))
        .select(col("dst").as("id"), (col("hops") + 1).as("hops"))
      dist = materialize(prop.unionByName(dist)
        .groupBy(col("id")).agg(min(col("hops")).as("hops")))
    }
    e.unpersist(blocking = false)
    dist
  }

  /** Per-window novel-edge rate: of the distinct edges active in each
    * time bucket, how many were seen for the FIRST time — the graph-
    * drift monitor that separates "traffic grew" from "the graph
    * itself is changing" (new user-item relations, new crawl
    * frontier). One distinct pass feeds both the first-seen aggregate
    * and the per-bucket rollup, joined back on the edge key — the
    * [[Dedup.noveltyScores]] shape applied to edges.
    */
  def edgeNovelty(events: DataFrame, srcExpr: Column, dstExpr: Column,
      bucketExpr: Column): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val eb = events.select(srcExpr.cast("long").as("src"),
        dstExpr.cast("long").as("dst"), bucketExpr.as("bucket"))
      .distinct().persist(MEMORY_AND_DISK)
    val first = eb.groupBy(col("src"), col("dst"))
      .agg(min(col("bucket")).as("_first"))
    eb.join(first, Seq("src", "dst"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_edges"),
        sum((col("bucket") === col("_first")).cast("long")).as("n_new"))
      .withColumn("novelty", round(
        col("n_new").cast("double") / col("n_edges").cast("double"), 6))
  }

  /** Event-type transition counts — the first-order Markov synopsis of
    * user behavior (from_type → to_type → n): each user's events in
    * (ts, tieCol) order, LEAD per user, one aggregate. The window
    * partitions by user, so no global sort ever happens; tieCol makes
    * the order total when timestamps collide (the q_window_* lesson —
    * a nondeterministic frame order breaks cross-engine hashes).
    */
  def typeTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Frequent length-`len` event-type paths (sequential pattern mining
    * at the cheap, useful end): consecutive type n-grams per user
    * under the total order (ts, tie), counted exactly, top-`topK`
    * under (n DESC, path ASC) — the "what do users actually do in a
    * row" synopsis behind funnel design. One user-key shuffle for the
    * LEAD window; the ranking runs on the ≤|types|^len path frame.
    */
  def frequentPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, len: Int = 3,
      topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(len >= 2, "need len >= 2")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val stepCols = (0 until len).map { i =>
      (if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
        .as(s"step${i + 1}")
    }
    val stepNames = (1 to len).map(i => col(s"step$i"))
    val ranked = Window.orderBy(
      (col("n").desc +: stepNames.map(_.asc)): _*)
    events.select(stepCols: _*)
      .filter(stepNames.map(_.isNotNull).reduce(_ && _))
      .groupBy(stepNames: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(ranked))
      .filter(col("rank") <= topK)
  }

  /** Market-basket item co-occurrence: items seen together in the same
    * (user, bucket) basket, with pair SUPPORT = number of distinct
    * baskets containing both. The co-click projection that turns an
    * interaction log into an item graph (recs, related-content,
    * [[triangleCounts]] input).
    *
    * Skew guard: a basket with more than `maxBasketSize` distinct items
    * is DROPPED ENTIRELY before the self-join — a bot user's
    * 10⁶-item basket would otherwise fan out 10¹² pair rows; dropping
    * oversized baskets (rather than truncating) keeps the support
    * semantics exact over the retained baskets and is the standard
    * market-basket guard. The self-join key is (user, bucket), so pair
    * fan-out is Σ C(|basket|,2) ≤ baskets · C(cap,2).
    */
  def itemCooccurrence(events: DataFrame, userCol: String,
      bucketExpr: Column, itemExpr: Column, minSupport: Long = 2,
      maxBasketSize: Int = 100): DataFrame =
    pairsFromBaskets(
      events.select(col(userCol).cast("long").as("u"),
        bucketExpr.as("b"), itemExpr.cast("long").as("item")),
      maxBasketSize)
      .filter(col("support") >= minSupport)

  /** (item_a < item_b, support) from a (u, b, item) basket frame —
    * the shared core of [[itemCooccurrence]], [[updateCooccurrence]]
    * and [[recHitRate]].
    */
  private def pairsFromBaskets(basketRows: DataFrame,
      maxBasketSize: Int): DataFrame =
    pairCounts(keptBaskets(basketRows, maxBasketSize))

  /** Distinct (u, b, item) rows with oversized baskets dropped — the
    * input is materialized once (eager checkpoint + barrier, r17 — a
    * lazy persist let the size aggregate and the semi-join probe side
    * race to compute it; see Dedup.materialized) because the size
    * filter and every downstream consumer re-read it.
    */
  private def keptBaskets(basketRows: DataFrame,
      maxBasketSize: Int): DataFrame = {
    val baskets = Dedup.materialized(basketRows.distinct())
    val ok = baskets.groupBy(col("u"), col("b"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBasketSize)
      .select(col("u"), col("b"))
    baskets.join(ok, Seq("u", "b"), "left_semi")
  }

  private def pairCounts(kept: DataFrame): DataFrame =
    kept.select(col("u"), col("b"), col("item").as("item_a"))
      .join(kept.select(col("u"), col("b"), col("item").as("item_b")),
        Seq("u", "b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))

  /** Per-item kept-basket counts — the denominator table of
    * [[itemSimilarity]]'s cosine, exposed so a pipeline can persist it
    * next to its co-click pair table (both are deterministic functions
    * of the same basket build; a stored-fixture consumer reads them
    * instead of rebuilding the baskets per run).
    */
  def basketItemCounts(events: DataFrame, userCol: String,
      bucketExpr: Column, itemExpr: Column,
      maxBasketSize: Int = 100): DataFrame =
    keptBaskets(
      events.select(col(userCol).cast("long").as("u"),
        bucketExpr.as("b"), itemExpr.cast("long").as("item")),
      maxBasketSize)
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))

  /** [[itemSimilarity]] with the pair and count tables supplied — the
    * serving shape: a production recommender reads the co-click pair
    * table and the per-item basket counts a prior job wrote (both
    * stored fixtures here), so this prices the cosine + top-k ranking,
    * not the basket rebuild. `pairs` is (item_a < item_b, support)
    * already thresholded; `counts` is (item, cnt). Identical output to
    * [[itemSimilarity]] at the same parameters.
    */
  def itemSimilarityFromPairs(pairs: DataFrame, counts: DataFrame,
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = counts.select(col("item"), col("cnt"))
    val both = pairs
      .select(col("item_a").as("item"), col("item_b").as("neighbor"),
        col("support"))
      .unionByName(pairs.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), col("support")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("sim").desc, col("neighbor"))
    both
      .join(cnt.select(col("item"), col("cnt").as("n_item")), Seq("item"))
      .join(cnt.select(col("item").as("neighbor"), col("cnt").as("n_nbr")),
        Seq("neighbor"))
      .withColumn("sim", round(col("support").cast("double") /
        (sqrt(col("n_item").cast("double")) *
          sqrt(col("n_nbr").cast("double"))), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("item"), col("neighbor"), col("support"),
        col("n_item"), col("n_nbr"), col("sim"), col("rank"))
  }

  /** Association rules over the co-occurrence pairs (the Agrawal-style
    * market-basket step after [[itemCooccurrence]]): each frequent
    * unordered pair yields BOTH directed rules a→b and b→a with
    * support, confidence = support/n(a), lift = support·N/(n(a)·n(b))
    * and leverage = support/N − n(a)·n(b)/N². Every metric is a fixed
    * expression over exact BIGINT counts (basket totals, per-item
    * basket counts, pair supports), so the rounded doubles are
    * engine-exact and an oracle mirrors them term for term.
    *
    * Scale shape: identical to [[itemCooccurrence]] — the basket
    * distinct is the only corpus-scale shuffle, the pair build is
    * bounded by maxBasketSize², and the metric joins run at item/pair
    * grain (≪ corpus). The rule frame is 2× the pair frame.
    */
  def associationRules(events: DataFrame, userCol: String,
      bucketExpr: Column, itemExpr: Column, minSupport: Long = 2,
      maxBasketSize: Int = 100): DataFrame = {
    val kept = keptBaskets(
      events.select(col(userCol).cast("long").as("u"),
        bucketExpr.as("b"), itemExpr.cast("long").as("item")),
      maxBasketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // delegate to the FromPairs tail (same rationale as itemSimilarity)
    associationRulesFromPairs(
      pairCounts(kept).filter(col("support") >= minSupport),
      kept.groupBy(col("item")).agg(count(lit(1)).as("cnt")),
      kept.select(col("u"), col("b")).distinct()
        .agg(count(lit(1)).as("n_baskets")))
  }

  /** Total kept-basket count — the N in [[associationRules]]' lift and
    * leverage, exposed for the stored-fixture consumer (a 1-row frame
    * a pipeline persists next to its pair and item-count tables).
    */
  def basketTotal(events: DataFrame, userCol: String,
      bucketExpr: Column, itemExpr: Column,
      maxBasketSize: Int = 100): DataFrame =
    keptBaskets(
      events.select(col(userCol).cast("long").as("u"),
        bucketExpr.as("b"), itemExpr.cast("long").as("item")),
      maxBasketSize)
      .select(col("u"), col("b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))

  /** [[associationRules]] with the pair table, per-item basket counts,
    * and the basket total supplied — the serving shape (all three are
    * deterministic functions of one basket build an earlier job
    * wrote). `pairs` is (item_a < item_b, support) already
    * thresholded; `itemCnt` is (item, cnt); `total` is the 1-row
    * (n_baskets). Identical output to [[associationRules]] at the
    * same parameters.
    */
  def associationRulesFromPairs(pairs: DataFrame, itemCnt: DataFrame,
      total: DataFrame): DataFrame = {
    val rules = pairs
      .select(col("item_a").as("antecedent"), col("item_b").as("consequent"),
        col("support"))
      .unionByName(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("support")))
    val sD = col("support").cast("double")
    val caD = col("n_ante").cast("double")
    val cbD = col("n_cons").cast("double")
    val nD = col("n_baskets").cast("double")
    rules
      .join(itemCnt.select(col("item").as("antecedent"), col("cnt").as("n_ante")),
        Seq("antecedent"))
      .join(itemCnt.select(col("item").as("consequent"), col("cnt").as("n_cons")),
        Seq("consequent"))
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("n_ante"), col("n_cons"),
        round(sD / caD, 6).as("confidence"),
        round(sD * nD / (caD * cbD), 6).as("lift"),
        round(sD / nD - caD / nD * (cbD / nD), 6).as("leverage"))
  }

  /** O(batch) incremental maintenance of the co-occurrence pair table:
    * supports are counts over DISJOINT baskets, so merging the stored
    * (unthresholded) pair frame with the new batch's pairs by summing
    * supports is EXACTLY the rebuild — provided batch boundaries never
    * split a basket (cut on the basket bucket, e.g. ship whole days
    * when bucketing by hour) — the [[Profile.updateFingerprint]]
    * pattern applied to the item graph. Daily cost scales with the
    * batch, never the history; thresholds are applied by the READER
    * ([[itemCooccurrence]]'s minSupport is a filter, not state).
    */
  def updateCooccurrence(stored: DataFrame, newEvents: DataFrame,
      userCol: String, bucketExpr: Column, itemExpr: Column,
      maxBasketSize: Int = 100): DataFrame =
    stored.select(col("item_a"), col("item_b"), col("support"))
      .unionByName(itemCooccurrence(newEvents, userCol, bucketExpr,
        itemExpr, minSupport = 1, maxBasketSize = maxBasketSize))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("support")).as("support"))

  /** Offline recommender evaluation — hit-rate@k of the co-occurrence
    * recommender under a TIME split, the standard leave-last-out
    * protocol: train-period baskets build the pair table; each user's
    * held-out target is their first test-period item NOT already in
    * their train history; the recommendation list is the top-k unseen
    * items by summed co-occurrence support with the user's history
    * (ties by item id — the order is total, so the list is
    * engine-exact). Returns one row per evaluable user:
    * (user_id, heldout, hit_rank ∈ [1,k] or NULL, hit).
    *
    * Every stage is an equi-join or a per-user window: pairs are
    * basket-bounded, candidate scoring joins history × pair table on
    * the item key, and the top-k rank compiles to WindowGroupLimit.
    * Nothing is per-user-quadratic and nothing leaks test data into
    * the pair table — the leakage direction the time split exists to
    * prevent.
    */
  def recHitRate(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, itemExpr: Column, bucketExpr: Column,
      splitTs: Column, k: Int = 5, maxBasketSize: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ev = events.select(col(userCol).cast("long").as("u"),
        col(tsCol).as("ts"), col(tieCol).as("tie"),
        itemExpr.cast("long").as("item"), bucketExpr.as("b"))
      .persist(MEMORY_AND_DISK)
    val pairs = pairsFromBaskets(
      ev.filter(col("ts") < splitTs).select(col("u"), col("b"), col("item")),
      maxBasketSize)
    val hist = ev.filter(col("ts") < splitTs)
      .select(col("u"), col("item")).distinct().persist(MEMORY_AND_DISK)
    val w = Window.partitionBy(col("u")).orderBy(col("ts"), col("tie"))
    val heldout = ev.filter(col("ts") >= splitTs)
      .join(hist, Seq("u", "item"), "left_anti")
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("u"), col("item").as("heldout"))
    val sym = pairs.select(col("item_a").as("i"), col("item_b").as("j"),
        col("support"))
      .unionByName(pairs.select(col("item_b").as("i"),
        col("item_a").as("j"), col("support")))
    val scores = hist.withColumnRenamed("item", "i")
      .join(sym, Seq("i"))
      .select(col("u"), col("j").as("cand"), col("support"))
      .join(hist.select(col("u"), col("item").as("cand")),
        Seq("u", "cand"), "left_anti")
      .groupBy(col("u"), col("cand")).agg(sum(col("support")).as("score"))
    val wk = Window.partitionBy(col("u"))
      .orderBy(col("score").desc, col("cand"))
    val topk = scores.withColumn("_hr", row_number().over(wk))
      .filter(col("_hr") <= k)
    heldout.join(topk.select(col("u"), col("cand").as("heldout"),
        col("_hr").as("hit_rank")), Seq("u", "heldout"), "left")
      .select(col("u").as("user_id"), col("heldout"),
        col("hit_rank"), col("hit_rank").isNotNull.as("hit"))
  }

  /** Per-node triangle counts over an undirected graph given as
    * (item_a < item_b) edges — the clustering/cohesion signal of the
    * co-click graph. Ordered-adjacency enumeration: each triangle
    * (a < b < c) is found exactly once by joining e(a,b) ⋈ e(b,c) ⋈
    * e(a,c), then exploded to its three members for the per-node
    * rollup. Two equi-joins on node ids; with edges sorted by degree
    * this is the standard distributed triangle-count shape (the
    * wedge-check join is bounded by Σ deg² over the lower-degree
    * endpoint).
    */
  def triangleCounts(edgeDf: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edgeDf.select(col("item_a").cast("long").as("a"),
        col("item_b").cast("long").as("b"))
      .distinct().persist(MEMORY_AND_DISK)
    val tri = e
      .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("item"))
    tri.groupBy(col("item")).agg(count(lit(1)).as("n_triangles"))
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

  /** Item-item cosine similarity from co-occurrence counts — the
    * classic item-based collaborative-filtering neighbor table
    * (Sarwar et al., WWW'01): sim(a,b) = support(a,b)/(√n(a)·√n(b))
    * where support and both basket counts are exact BIGINTs, so the
    * similarity (two IEEE sqrts, one divide) is engine-exact; the
    * top-`topK` neighbors per item rank under the total order
    * (sim DESC, neighbor ASC) and compile to WindowGroupLimit.
    * Same scale shape as [[itemCooccurrence]]: the basket distinct is
    * the only corpus-scale shuffle, everything after runs at
    * item/pair grain.
    */
  def itemSimilarity(events: DataFrame, userCol: String,
      bucketExpr: Column, itemExpr: Column, minSupport: Long = 2,
      topK: Int = 5, maxBasketSize: Int = 100): DataFrame = {
    val kept = keptBaskets(
      events.select(col(userCol).cast("long").as("u"),
        bucketExpr.as("b"), itemExpr.cast("long").as("item")),
      maxBasketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // delegate to the FromPairs tail so the build path and the
    // stored-fixture serving path cannot silently de-synchronize
    itemSimilarityFromPairs(
      pairCounts(kept).filter(col("support") >= minSupport),
      kept.groupBy(col("item")).agg(count(lit(1)).as("cnt")), topK)
  }

  /** Degree assortativity of an undirected edge frame: the Pearson
    * correlation of endpoint degrees over the doubled edge list —
    * positive means hubs link hubs (social shape), negative means
    * hubs link leaves (star/hub-and-spoke shape), the one-number
    * structure check run before trusting community or similarity
    * output. Every sum (Σx, Σy, Σxy, Σx², Σy² over 2·|E| endpoint
    * pairs) is an exact BIGINT, so the rounded coefficient is
    * engine-exact; NULL when either side is degree-constant.
    * Two edge-bounded aggregates, nothing corpus-scale.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst")).persist(MEMORY_AND_DISK)
    val deg = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val pairsDir = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .join(deg.select(col("node").as("src"), col("deg").as("dx")),
        Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("dy")),
        Seq("dst"))
    val g = pairsDir.agg(count(lit(1)).as("m"),
      sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
      sum(col("dx") * col("dy")).as("sxy"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"))
    val mD = col("m").cast("double")
    val covN = mD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varXN = mD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val varYN = mD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    g.select((col("m") / 2L).cast("long").as("n_edges"),
      when(varXN > 0 && varYN > 0,
        round(covN / (sqrt(varXN) * sqrt(varYN)), 6)).as("assortativity"))
  }

  /** k-core peeling over an undirected (src, dst) edge frame: `rounds`
    * synchronous rounds of "drop every node with degree < k, drop
    * every edge touching a dropped node" — the community-density
    * filter that strips hangers-on before clustering or embedding a
    * behavior graph. The round count is FIXED (so the computation is
    * replayable as unrolled SQL) and `converged` reports whether the
    * fixpoint was actually reached: true iff no surviving node is
    * below k in the final edge set, i.e. round rounds+1 would remove
    * nobody. Returns surviving (node, degree, converged).
    *
    * Scale shape: each round is one edge-bounded degree count plus two
    * semi joins — the [[pageRankFixedPoint]] cost model, including its
    * per-round localCheckpoint: round r+1 references round r THREE
    * times (both degree sides and the edge filter), so without lineage
    * truncation the logical plan grows 3^rounds copies of the input
    * subplan and the optimizer, not the data, blows the heap. Real
    * diameter-heavy graphs converge in few rounds because each round
    * peels a full shell, not one node.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 4): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1, rounds >= 1")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var cur = edges.select(col("src"), col("dst")).localCheckpoint()
    var kept: DataFrame = null
    for (_ <- 1 to rounds) {
      kept = degrees(cur).filter(col("deg") >= k).select(col("node"))
        .localCheckpoint()
      cur = cur
        .join(kept.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(kept.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint()
    }
    val out = kept.join(degrees(cur), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("degree"))
    val conv = out.agg(
      (sum((col("degree") < k).cast("long")) === 0L).as("converged"))
    out.crossJoin(broadcast(conv))
  }

  /** Link prediction over an undirected item graph given as
    * (item_a < item_b) edges — the graph-completion step behind
    * "related items you haven't linked yet" and graph-based data
    * augmentation. For every NON-adjacent pair sharing at least one
    * common neighbor, the score is the common-neighbor count
    * (Liben-Nowell & Kleinberg '03), tie-broken by preferential
    * attachment deg(u)·deg(v) then the neighbor id — every term an
    * exact BIGINT, so the per-node top-`k` is a total order both
    * engines replay branch for branch.
    *
    * Skew guard (the no-silent-caps discipline): a wedge-center node of
    * degree d fans out d² candidate rows, so nodes with degree >
    * `maxDeg` are excluded from the CENTER role before the two-path
    * join — wedge volume is then Σ_w deg(w)² ≤ maxDeg·|E|. They remain
    * eligible as ENDPOINTS (their links are still predictable through
    * low-degree centers). Dropped hubs are not silent: [[hubAudit]]
    * counts them and the edges they touch. Scale shape: one adjacency
    * distinct, one bounded two-path equi-join, aggregates at candidate
    * grain, and the per-node top-k compiles to WindowGroupLimit.
    */
  def linkPrediction(edgeDf: DataFrame, maxDeg: Int = 64,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    require(maxDeg >= 2 && k >= 1, "need maxDeg >= 2, k >= 1")
    // materialized, not lazily persisted (r17): e feeds the adjacency
    // explode AND the new-link anti-join; deg feeds the hub list and
    // both score joins; mid feeds both wedge self-join sides — all
    // concurrently-materialized AQE stages (see Dedup.materialized)
    val e = Dedup.materialized(
      edgeDf.select(col("item_a").cast("long").as("a"),
        col("item_b").cast("long").as("b")).distinct())
    // explode-symmetrize, not a self-union: a union evaluates the edge
    // subtree once per branch; the explode reads the stored frame once
    val adj = e.select(explode(array(
        struct(col("a").as("u"), col("b").as("w")),
        struct(col("b").as("u"), col("a").as("w")))).as("_e"))
      .select(col("_e.u").as("u"), col("_e.w").as("w"))
    val deg = Dedup.materialized(
      adj.groupBy(col("u")).agg(count(lit(1)).as("deg")))
    val hubs = deg.filter(col("deg") > maxDeg)
      .select(col("u").as("w"))
    val mid = Dedup.materialized(
      adj.join(broadcast(hubs), Seq("w"), "left_anti"))
    val cand = mid
      .join(mid.select(col("w"), col("u").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cn"))
      .join(e.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti") // predicted links must be NEW
    val scored = cand
      .join(deg.select(col("u"), col("deg").as("_du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("_dv")), Seq("v"))
      .withColumn("pa", col("_du") * col("_dv"))
    // same trick for the symmetric output: one evaluation of `scored`
    val sym = scored.select(explode(array(
        struct(col("u").as("node"), col("v").as("other")),
        struct(col("v").as("node"), col("u").as("other")))).as("_p"),
        col("cn"), col("pa"))
      .select(col("_p.node").as("node"), col("_p.other").as("other"),
        col("cn"), col("pa"))
    sym.withColumn("_rn", row_number().over(
        Window.partitionBy(col("node"))
          .orderBy(col("cn").desc, col("pa").desc, col("other"))))
      .filter(col("_rn") <= k)
      .select(col("node"), col("other"), col("cn"), col("pa"),
        col("_rn").as("rank"))
  }

  /** The wedge-center hub audit for [[linkPrediction]]: how many nodes
    * the `maxDeg` cap excludes from the center role, the edges
    * touching them, and the kept-node count — one degree aggregate
    * plus one semi-join count, never a pair.
    */
  def hubAudit(edgeDf: DataFrame, maxDeg: Int = 64): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist: the (possibly expensive) edge build feeds the degree
    // aggregate AND both hub-touch semi-joins
    val e = edgeDf.select(col("item_a").cast("long").as("a"),
      col("item_b").cast("long").as("b")).distinct()
      .persist(MEMORY_AND_DISK)
    val deg = e.select(explode(array(col("a"), col("b"))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val hubs = deg.filter(col("deg") > maxDeg).select(col("u"))
    val nHubs = deg.agg(
      coalesce(sum((col("deg") > maxDeg).cast("long")), lit(0L))
        .as("n_hubs_dropped"),
      coalesce(sum((col("deg") <= maxDeg).cast("long")), lit(0L))
        .as("n_nodes_kept"))
    val touched = e
      .join(hubs.select(col("u").as("a")), Seq("a"), "left_semi")
      .unionByName(
        e.join(hubs.select(col("u").as("b")), Seq("b"), "left_semi"))
      .distinct()
      .agg(count(lit(1)).as("n_edges_touching_hubs"))
    nHubs.crossJoin(touched)
  }
}
