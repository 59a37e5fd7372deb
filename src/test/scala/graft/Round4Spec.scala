package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operator pack: connected-component clustering invariants,
  * stratified-sample determinism, heavy-hitter thresholds, sweep-line
  * conservation, feature-hash completeness, and the plan shapes that
  * matter at scale for the new TPC-H-shaped queries.
  */
class Round4Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("connectedComponents: chain + triangle + isolated pair") {
    import spark.implicits._
    // chain 1-2-3-4 (transitivity past direct neighbors), triangle
    // 10-11-12, pair 20-21; 2 reaches 1 only through the chain
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: a 60-node path converges via pointer jumping") {
    import spark.implicits._
    // without the label(label) jump this needs ~59 rounds — far past
    // maxIter; with it, O(log n) rounds
    val n = 60
    val chain = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(chain).collect()
    assert(labels.length === n)
    assert(labels.forall(_.getLong(1) === 1L), "all chain nodes must reach label 1")
  }

  test("q_dedup_cluster: labels are component minima of the pair graph") {
    val pairs = Dedup.ngramJaccardPairs(Tables.load(spark, sf, "documents"),
      "doc_id", "text", n = 3, threshold = 0.2, maxShingleDf = 50)
      .select(col("id_a"), col("id_b")).cache()
    val clusters = SparkEntry.queries("q_dedup_cluster")(spark, sf).cache()
    // every doc in a pair is labeled, label <= id, and both ends of
    // every pair share a label (single-step consistency)
    assert(clusters.filter(col("cluster_id") > col("id")).count() === 0)
    val ids = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id"))).distinct()
    assert(clusters.select("id").except(ids).count() === 0)
    assert(ids.except(clusters.select("id")).count() === 0)
    val la = clusters.select(col("id").as("id_a"), col("cluster_id").as("ca"))
    val lb = clusters.select(col("id").as("id_b"), col("cluster_id").as("cb"))
    assert(pairs.join(la, "id_a").join(lb, "id_b")
      .filter(col("ca") =!= col("cb")).count() === 0,
      "pair endpoints in different clusters")
    pairs.unpersist(); clusters.unpersist()
  }

  test("q_sample_stratified: deterministic, stratum rates in band") {
    val a = SparkEntry.queries("q_sample_stratified")(spark, sf)
    val b = SparkEntry.queries("q_sample_stratified")(spark, sf)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    val orders = Tables.load(spark, sf, "orders")
    val rates = a.groupBy("o_orderpriority").count()
      .join(orders.groupBy("o_orderpriority").count()
        .withColumnRenamed("count", "total"), "o_orderpriority")
      .select(col("o_orderpriority"),
        (col("count").cast("double") / col("total").cast("double")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // 0x80/0x100 = 50%, 0x1a/0x100 ≈ 10.2%; wide bands for small strata
    assert(rates("1-URGENT") > 0.35 && rates("1-URGENT") < 0.65, rates.toString)
    rates.filterNot(_._1 == "1-URGENT").foreach { case (k, v) =>
      assert(v > 0.04 && v < 0.20, s"$k rate $v")
    }
  }

  test("q_heavy_hitters: every row exceeds the share threshold") {
    val hh = SparkEntry.queries("q_heavy_hitters")(spark, sf).cache()
    // the filter runs on the unrounded ratio; the reported share is
    // rounded to 6 dp and may land exactly ON the threshold
    assert(hh.filter(col("share") < 0.01).count() === 0)
    // shares are fractions of the type total: per-type sum bounded by 1
    // (up to 6-dp rounding of each term — at tiny SF every user passes
    // the filter and the rounded shares sum to 1 ± n*5e-7)
    val over = hh.groupBy("event_type").agg(sum("share").as("s"))
      .filter(col("s") > 1.0 + 1e-4).count()
    assert(over === 0)
    hh.unpersist()
  }

  test("q_concurrency: sweep line conserves sessions") {
    val daily = SparkEntry.queries("q_concurrency")(spark, sf).cache()
    assert(daily.filter(col("max_concurrent") < 0).count() === 0)
    assert(daily.agg(max("max_concurrent")).head().getLong(0) >= 1)
    daily.unpersist()
  }

  test("q_concurrency: single-task stages only on the day-total frame") {
    // the r4 form ran the running sum through Window.orderBy(es) with no
    // partition key — one task over every distinct event-second. The
    // stitched form keeps the event-scale frames day-partitioned; the
    // ONLY single-partition exchange allowed is the carry window over
    // the per-day total frame (one row per calendar day — bounded by
    // the calendar, not the corpus).
    // NOTE: formatted explain prints exchange arguments on a separate
    // "Arguments:" line, so the executed-plan string (inline args) is
    // what a SinglePartition count must run against.
    val df = SparkEntry.queries("q_concurrency")(spark, sf)
    df.collect()
    val exec = df.queryExecution.executedPlan.toString
    val lines = exec.linesIterator.toIndexedSeq
    val singles = lines.indices.filter(i => lines(i).contains("Exchange SinglePartition"))
    assert(singles.nonEmpty, "carry window vanished from the plan:\n" + exec)
    // AQE may print a materialized query stage twice; every occurrence
    // must sit directly on the day-total aggregate, never an event frame
    singles.foreach { i =>
      val child = lines.slice(i + 1, i + 4).mkString("\n")
      assert(child.contains("HashAggregate(keys=[day_idx"),
        s"single-partition exchange not on the day-total frame:\n$child\n$exec")
    }
    val p = plan("q_concurrency")
    assert(p.contains("hashpartitioning(day_idx"),
      "event-scale window lost its day partitioning:\n" + p)
    assert(p.contains("BroadcastHashJoin"), "carry frame must broadcast: " + p)
  }

  test("q_rolling_wau: bounded explode + scalar cutoff — no join in the plan") {
    // the r4 form range-joined the spine (a BroadcastNestedLoopJoin
    // testing every (day, user) against every spine day); the r5 form
    // equi-semi-joined a days-distinct. The r6 form needs NEITHER: the
    // spine tail is cut by a max-date scalar filter, so any Join node
    // is a regression.
    val p = plan("q_rolling_wau")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range join leaked back into the day spine:\n" + p)
    assert(!p.contains("Join"),
      "the day-spine bound must be a scalar filter, not a join:\n" + p)
  }

  test("q_feature_hash: bucket counts cover every token") {
    val fh = SparkEntry.queries("q_feature_hash")(spark, sf)
    val nTokens = Tables.load(spark, sf, "documents")
      .select(size(graft.ops.TextAnalysis.tokens(col("text"))).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(fh.agg(sum("n")).head().getLong(0) === nTokens)
    // bucket ids are 2 lowercase hex chars
    assert(fh.filter(!col("bucket").rlike("^[0-9a-f]{2}$")).count() === 0)
  }

  test("q_bigram_pmi: bounded output, finite scores") {
    val pmi = SparkEntry.queries("q_bigram_pmi")(spark, sf).cache()
    assert(pmi.count() <= 50)
    assert(pmi.filter(col("pmi").isNull || isnan(col("pmi"))).count() === 0)
    pmi.unpersist()
  }

  test("q_anomaly_zscore: all rows are 3-sigma outliers") {
    val z = SparkEntry.queries("q_anomaly_zscore")(spark, sf)
    assert(z.filter(abs(col("z")) <= 3).count() === 0)
  }

  test("q_tpch_q14/q18: dims broadcast, date filters pushed") {
    val p14 = plan("q_tpch_q14")
    assert(p14.contains("BroadcastHashJoin"), p14)
    assert(p14.contains("PushedFilters") && p14.contains("l_shipdate"), p14)
    val p18 = plan("q_tpch_q18")
    assert(p18.contains("BroadcastHashJoin"), p18)
  }

  test("q_tpch_q12: shipdate predicate reaches the lineitem scan") {
    val p = plan("q_tpch_q12")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
  }

  test("q_tpch_q10: dims broadcast, predicates pushed to both scans") {
    val p = plan("q_tpch_q10")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters") && p.contains("l_returnflag"), p)
  }

  test("q_winsorize: clipped values inside the percentile band") {
    val w = SparkEntry.queries("q_winsorize")(spark, sf).cache()
    assert(w.count() === Tables.load(spark, sf, "lineitem").count())
    // a clip may only move a value TO one of its group's two percentile
    // bounds: raised values must land exactly on some p01, lowered
    // values exactly on some p99 (rounded to the query's 6 dp). This is
    // the real never-widens invariant — the r4 form AND-ed two mutually
    // exclusive comparisons and was vacuous.
    // per-group check (the r5 global-isin would admit a value clipped
    // to ANOTHER group's percentile): the output carries its return
    // flag, so join that group's OWN rounded bounds and require the
    // clip to land exactly on them.
    val pct = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.01)"), 6).as("p01r"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99r"))
    val wg = w.join(pct, "l_returnflag")
    assert(wg.filter(col("clipped") > col("l_extendedprice") &&
      col("clipped") =!= col("p01r")).count() === 0,
      "a raised value did not land on its own group's p01")
    assert(wg.filter(col("clipped") < col("l_extendedprice") &&
      col("clipped") =!= col("p99r")).count() === 0,
      "a lowered value did not land on its own group's p99")
    val p = plan("q_winsorize")
    assert(p.contains("BroadcastHashJoin"), "percentile frame must broadcast: " + p)
    w.unpersist()
  }

  test("q_rolling_wau: weekly actives bounded by user universe") {
    val wau = SparkEntry.queries("q_rolling_wau")(spark, sf).cache()
    val nUsers = Tables.load(spark, sf, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(wau.filter(col("wau") > nUsers).count() === 0)
    // a 7-day window can only see more users than its final day alone
    val daily = Tables.load(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("spine_d"))
      .agg(countDistinct(col("user_id")).as("dau"))
    assert(wau.join(daily, "spine_d").filter(col("wau") < col("dau")).count() === 0)
    wau.unpersist()
  }

  test("q_cohort: offset-0 cell equals each cohort's size") {
    val c = SparkEntry.queries("q_cohort")(spark, sf).cache()
    // every user appears in their own cohort's week-0 cell
    val wk0 = c.filter(col("week_offset") === 0)
      .agg(sum("n_users")).head().getLong(0)
    val nUsers = Tables.load(spark, sf, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(wk0 === nUsers)
    // later offsets never exceed the cohort's week-0 population
    val base = c.filter(col("week_offset") === 0)
      .select(col("cohort"), col("n_users").as("n0"))
    assert(c.join(base, "cohort").filter(col("n_users") > col("n0")).count() === 0)
    c.unpersist()
  }

  test("q_tpch_q7: nation-filtered dims broadcast, one fact shuffle") {
    val p = plan("q_tpch_q7")
    assert(p.contains("BroadcastHashJoin"), p)
    // shuffle exchanges (formatted-plan detail headers "(n) Exchange",
    // which excludes BroadcastExchange): the two fact-join sides, the
    // aggregation, and the final sort — nothing else may shuffle
    val shuffles = """\(\d+\) Exchange\b""".r.findAllIn(p).size
    assert(shuffles <= 4, s"too many shuffle exchanges ($shuffles):\n$p")
  }

  test("q_label_centroid: one row per (label, dim), centroids bounded") {
    val c = SparkEntry.queries("q_label_centroid")(spark, sf).cache()
    val emb = Tables.load(spark, sf, "embeddings")
    val nLabels = emb.select(countDistinct(col("label"))).head().getLong(0)
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    assert(c.count() === nLabels * dims)
    // a mean is bounded by the member extremes
    val mx = emb.select(posexplode(col("embedding")))
      .agg(max(abs(col("col")))).head().getFloat(0)
    assert(c.filter(abs(col("c")) > mx).count() === 0)
    c.unpersist()
  }

  test("q_ngram_lm: one argmax row per left token, probabilities in (0,1]") {
    val lm = SparkEntry.queries("q_ngram_lm")(spark, sf).cache()
    assert(lm.groupBy("x").count().filter(col("count") > 1).count() === 0)
    assert(lm.filter(col("p") <= 0 || col("p") > 1).count() === 0)
    lm.unpersist()
  }

  test("q_chi2_features: scores non-negative, counts consistent") {
    val c = SparkEntry.queries("q_chi2_features")(spark, sf).cache()
    assert(c.count() <= 30)
    assert(c.filter(col("chi2") < 0 || col("chi2").isNull || isnan(col("chi2"))).count() === 0)
    // the English doc-frequency can never exceed the total doc-frequency
    assert(c.filter(col("e1") > col("n1")).count() === 0)
    c.unpersist()
  }

  test("q_group_topk: exactly k rows per group, ranks dense") {
    val t = SparkEntry.queries("q_group_topk")(spark, sf).cache()
    val perGroup = t.groupBy("l_returnflag").count().collect()
    assert(perGroup.forall(_.getLong(1) === 3L))
    assert(t.filter(col("rnk") < 1 || col("rnk") > 3).count() === 0)
    t.unpersist()
  }
}
