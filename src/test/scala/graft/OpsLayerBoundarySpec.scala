package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The loadSpread boundary, pinned (r11 verdict item 7).
  *
  * `Tables.loadSpread`'s contract says its explicit-count repartition
  * prices the map-side parallelism that single-file TEST tables lack —
  * at production scale real input splits provide it and the extra
  * shuffle is pure overhead. That lever must live at the query-harness
  * layer only: `ops/` functions receive DataFrames and must not inject
  * explicit repartitions of their own when the input is already wide
  * (the one sanctioned exception is `Dedup.widen`, which is a
  * documented NO-OP on wide inputs — asserted here in both
  * directions — and layout operators like Bucketing whose very
  * contract is a requested partitioning).
  *
  * Two guards:
  *  1. source boundary — no `ops/` file references the test-data
  *     loading layer (`Tables.`/`loadSpread`): operators take frames,
  *     never scale-factor directories;
  *  2. plan walk — representative operators from each family, applied
  *     to natively-wide inputs (range leaves at defaultParallelism —
  *     no Repartition node anywhere in the INPUT plan), must produce
  *     plans with ZERO repartition nodes.
  */
class OpsLayerBoundarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("ops/ sources never reference the test-data loading layer") {
    val dir = new java.io.File("src/main/scala/graft/ops")
    assert(dir.isDirectory, s"expected ${dir.getAbsolutePath}")
    val offenders = dir.listFiles().filter(_.getName.endsWith(".scala"))
      .flatMap { f =>
        val src = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        // strip comments PROPERLY before the code-level check: block/
        // scaladoc comments first (non-greedy, dotall), then // line
        // tails. A naive cut-at-first-'/' would both miss references
        // after any path or division slash and false-positive on
        // scaladoc prose documenting the contract.
        val code = src
          .replaceAll("(?s)/\\*.*?\\*/", "")
          .replaceAll("//.*", "")
        if (code.contains("loadSpread") || code.contains("Tables."))
          Some(f.getName)
        else None
      }
    assert(offenders.isEmpty,
      s"ops/ must not reach into the loading layer: ${offenders.mkString(", ")}")
  }

  private def countRepartitions(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case r: Repartition => r
      case r: RepartitionByExpression => r
    }.size

  /** A natively-wide documents-like frame: a Range leaf at
    * defaultParallelism — partition width comes from the LEAF, the way
    * a 100 TB scan's splits do, with no Repartition node in the plan.
    */
  private def wideDocs(n: Int = 400): DataFrame =
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism)
      .select(col("id"),
        concat_ws(" ", md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string")),
          md5((col("id") % 7).cast("string")),
          md5((col("id") % 13).cast("string")),
          md5((col("id") % 3).cast("string"))).as("text"))

  private def wideVecs(n: Int = 400): DataFrame =
    spark.range(0L, n, 1L, spark.sparkContext.defaultParallelism)
      .select(col("id"),
        transform(sequence(lit(1), lit(64)),
          d => sin(col("id") * d.cast("double"))).as("vec"))

  test("operators on wide inputs inject no repartition nodes (widen is a no-op)") {
    val docs = wideDocs()
    assert(countRepartitions(docs) === 0, "control: input must be clean")
    val plans: Seq[(String, DataFrame)] = Seq(
      "ngramJaccardPairs" ->
        graft.ops.Dedup.ngramJaccardPairs(docs, "id", "text", n = 3,
          threshold = 0.2, maxShingleDf = 50),
      "minhashSignature" ->
        graft.ops.Dedup.minhashSignature(docs, "id", "text", k = 16),
      "winnowMatchPairs" ->
        graft.ops.Dedup.winnowMatchPairs(docs, "id", "text"),
      "knnGraphLsh" ->
        graft.ops.Similarity.knnGraphLsh(wideVecs(), "id", "vec", k = 3),
      "textAnalyze" ->
        graft.ops.TextAnalysis.analyze(docs, "id", "text"),
      "parseHeaders" ->
        graft.ops.Multimodal.parseHeaders(
          graft.ops.Multimodal.syntheticMediaHeaders(docs, "id"), "payload"),
      "urlApplyRules" ->
        graft.ops.Urls.applyRules(
          docs.select(col("id").as("url_id"),
            concat(lit("https://h"), (col("id") % 5).cast("string"),
              lit(".example.com/p/"), col("id").cast("string")).as("url")),
          "url", {
            import spark.implicits._
            Seq(("h1.example.com", "/p", true)).toDF("host", "prefix", "allow")
          }),
      "linkPrediction" ->
        graft.ops.Graphs.linkPrediction(
          docs.select((col("id") % 50).as("item_a"),
            ((col("id") + 7) % 50).as("item_b")), maxDeg = 16, k = 2))
    plans.foreach { case (name, out) =>
      assert(countRepartitions(out) === 0,
        s"$name injected an explicit repartition on a wide input")
    }
  }

  test("widen spreads a single-split input exactly once, at the operator entry") {
    // the sanctioned exception, pinned in its OTHER direction: a
    // 1-partition frame (the single-file test-table shape) gets one
    // defaultParallelism spread so per-row shingle work parallelizes
    val narrow = wideDocs().coalesce(1)
    // coalesce itself is a (non-shuffle) Repartition node — the widen
    // contribution is the DELTA over the input's own count
    val base = countRepartitions(narrow)
    val out = graft.ops.Dedup.minhashSignature(narrow, "id", "text", k = 16)
    assert(countRepartitions(out) === base + 1,
      "widen must spread a narrow input exactly once")
  }
}
