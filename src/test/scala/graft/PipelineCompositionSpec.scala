package graft

import graft.ops.{Bucketing, Pipelines, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composition layer: corpus-prep pipeline end-to-end, bucketed
  * zero-exchange joins, and sketch tolerance checks.
  */
class PipelineCompositionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("corpus pipeline: drops junk, exact dups, and near-dups; keeps min ids") {
    val base = "the quick brown fox jumps over the lazy dog and it is a very fine day in the park"
    val docs = Seq(
      (1L, base),
      (2L, base),                                   // exact dup of 1
      (3L, base.replace("park", "yard")),           // near dup of 1
      (4L, "!!! ### $$$ %%"),                       // junk (quality gate)
      (5L, "completely different words entirely unrelated to all other documents here today my friend")
    ).toDF("doc_id", "text")
    val cleaned = Pipelines.prepareCorpus(docs, "doc_id", "text",
      Pipelines.CorpusConfig(minQuality = 0.3, nearDupThreshold = 0.5))
    val kept = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L), s"kept $kept")
    assert(cleaned.columns.contains("n_tokens") && cleaned.columns.contains("quality"))
    val stats = Pipelines.corpusStats(docs, cleaned, "doc_id").collect().head
    assert(stats.getLong(0) == 5 && stats.getLong(1) == 2 && stats.getLong(2) == 3)
  }

  test("corpusStats reads the pipeline lineage with exactly one action") {
    // r7 verdict finding 2: the old two-action form (count + sum) re-
    // executed an unpersisted pipeline per action. Count Spark jobs
    // whose traced lineage is `after`: the fused aggregate must submit
    // exactly one job over it (plus one for the cheap `before` count).
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is a very fine day"),
      (2L, "completely different words entirely unrelated to all other documents here today my friend")
    ).toDF("doc_id", "text")
    val after = Pipelines.prepareCorpus(docs, "doc_id", "text")
    // count ACTIONS (query executions), not Spark jobs — AQE submits a
    // job per materialized shuffle stage, making job counts noisy
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Pipelines.corpusStats(docs, after, "doc_id").collect()
      // listener delivery is async: wait until the count is stable for
      // 500 ms so a late 4th action can't slip past the assertion
      var last = -1
      var stable = 0
      while (stable < 5) {
        Thread.sleep(100)
        if (actions.get() == last) stable += 1 else { stable = 0; last = actions.get() }
      }
    } finally spark.listenerManager.unregister(listener)
    // exactly: before.count + ONE fused aggregate over `after` + the
    // 1-row toDF collect — the old two-action form measured 4 here
    assert(actions.get() <= 3, s"corpusStats ran ${actions.get()} actions")
  }

  test("corpus pipeline on real documents keeps the planted near-dup survivors") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cleaned = Pipelines.prepareCorpus(docs, "doc_id", "text",
      Pipelines.CorpusConfig(minQuality = 0.0, nearDupThreshold = 0.5))
    val n = cleaned.count()
    assert(n > 0 && n < docs.count()) // planted near-dups removed
  }

  test("bucketed join on the same key runs with zero exchange") {
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .withColumnRenamed("o_custkey", "custkey")
    val c = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .withColumnRenamed("c_custkey", "custkey")
    Bucketing.writeBucketed(o, "orders_b", "custkey", 8, sortBy = Some("custkey"))
    Bucketing.writeBucketed(c, "customer_b", "custkey", 8, sortBy = Some("custkey"))
    // disable broadcast so the planner must pick sort-merge — the case
    // bucketing exists for (fact⋈fact, both sides too big to broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b", "custkey")
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == o.count()) // every order matches its customer
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("range-sorted layout: disjoint per-file key intervals, range filter pushed") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val dir = java.nio.file.Files.createTempDirectory("range_sorted").toString
    try {
      Bucketing.writeRangeSorted(li, dir, "l_shipdate", nFiles = 6)
      // every file covers a disjoint l_shipdate interval — the property
      // that lets parquet min/max stats skip row groups outside a
      // queried time slice
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("l_shipdate").cast("string")).as("lo"),
          max(col("l_shipdate").cast("string")).as("hi"))
        .collect().map(r => (r.getString(1), r.getString(2)))
        .sortBy(_._1) // ISO timestamp strings sort chronologically
      assert(spans.length > 1)
      spans.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"overlapping file intervals: $hi > $lo")
      }
      val sliced = spark.read.parquet(dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      val p = sliced.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_shipdate"), p)
      assert(sliced.count() == li.filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")).count())
    } finally {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.iterator.asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally s.close()
    }
  }

  test("sketches: HLL distinct within rsd, quantiles within tolerance, heavy hitters") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = Sketches.approxDistinct(li, "l_orderkey").head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15, s"$approx vs $exact")

    val qs = Sketches.approxQuantiles(li, "l_quantity", Seq(0.0, 0.5, 1.0))
      .head().getSeq[Double](0)
    assert(qs.head == 1.0 && qs.last == 50.0 && math.abs(qs(1) - 25) <= 3, qs)

    val hh = Sketches.heavyHitters(
      Tables.load(spark, "/root/testdata/sf0.001", "orders"), "o_orderpriority", 0.1)
    assert(hh.count() >= 1) // priorities are uniform-ish, all above 10%
  }
}
