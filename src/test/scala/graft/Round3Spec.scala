package graft

import graft.ops.{Sampling, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 operator pack: md5 split properties, salted-join result
  * equivalence, sessionization invariants, and the plan shapes that
  * matter at scale for the TPC-H-shaped queries (pushdown + broadcast).
  */
class Round3Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("md5TrainTestSplit: disjoint, exhaustive, stable, ~trainPct sized") {
    val docs = Tables.load(spark, sf, "documents")
    val (train, test) = Sampling.md5TrainTestSplit(docs, "doc_id", 80)
    val nTrain = train.count(); val nTest = test.count(); val n = docs.count()
    assert(nTrain + nTest === n, "split not exhaustive")
    assert(train.select("doc_id").intersect(test.select("doc_id")).count() === 0)
    // 204/256 = 79.7% expected; allow sampling noise at 500 docs
    val frac = nTrain.toDouble / n
    assert(frac > 0.70 && frac < 0.90, s"train fraction $frac")
    // stability: same membership on re-evaluation
    val (train2, _) = Sampling.md5TrainTestSplit(docs, "doc_id", 80)
    assert(train.select("doc_id").except(train2.select("doc_id")).count() === 0)
  }

  test("saltedJoin matches the plain join result") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val c = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val salted = Skew.saltedJoin(o, c, "custkey", salts = 8)
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    val plain = o.join(c, "custkey")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    assert(salted.except(plain).count() === 0 && plain.except(salted).count() === 0)
  }

  test("saltedJoin splits a key across salts in the shuffle") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val c = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    // small side replicated once per salt
    val replicated = c.withColumn("_salt", explode(array((0 until 8).map(lit): _*)))
    assert(replicated.count() === c.count() * 8)
    // row count preserved through the salted join (inner, FK complete)
    assert(Skew.saltedJoin(o, c, "custkey", 8).count() === o.join(c, "custkey").count())
  }

  test("q_sessionize: session count bounded and durations non-negative") {
    val df = SparkEntry.queries("q_sessionize")(spark, sf).cache()
    val events = Tables.load(spark, sf, "events")
    assert(df.agg(min(col("duration_s"))).head().getLong(0) >= 0)
    assert(df.agg(sum(col("n_events"))).head().getLong(0) === events.count())
    // session ids start at 1 and are dense per user
    val bad = df.groupBy(col("user_id"))
      .agg(max(col("session_id")).as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad === 0, "session ids not dense per user")
    df.unpersist()
  }

  test("q_tpch_q3: date filters pushed to both scans, customer broadcast") {
    val p = plan("q_tpch_q3")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_tpch_q6: all predicates at the scan, no join, partial agg") {
    val p = plan("q_tpch_q6")
    assert(p.contains("PushedFilters") && p.contains("l_discount"), p)
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_tpch_q5: single fact shuffle — every dim join broadcast") {
    val p = plan("q_tpch_q5")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size <= 1, p)
  }

  test("q_funnel: stage counts are monotone non-increasing") {
    val r = SparkEntry.queries("q_funnel")(spark, sf).head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v $c $p")
    assert(v > 0)
  }

  test("q_date_fill: calendar is dense and counts total to the table") {
    val df = SparkEntry.queries("q_date_fill")(spark, sf).cache()
    val n = df.count()
    val span = df.agg(
      (datediff(max(col("d")), min(col("d"))) + 1).cast("long")).head().getLong(0)
    assert(n === span, "calendar has gaps")
    val total = df.agg(sum(col("n_orders"))).head().getLong(0)
    assert(total === Tables.load(spark, sf, "orders").count())
    df.unpersist()
  }

  test("q_tf_idf: scores positive and rare tokens outrank common ones") {
    val rows = SparkEntry.queries("q_tf_idf")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) > 0), "idf of df=N token must filter out")
  }

  test("q_token_freq: map-side partial aggregation before the shuffle") {
    val p = plan("q_token_freq")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_null_safe_join: tiny dim broadcasts") {
    val p = plan("q_null_safe_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_fuzzy_match: only off-by-one names survive") {
    val rows = SparkEntry.queries("q_fuzzy_match")(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(4) <= 1))
    // sanity: NATION_2 / NATION_20-24 style pairs exist, identical none
    assert(rows.forall(r => r.getString(2) != r.getString(3)))
  }

  test("q_merge_upsert: insert branch lands and matched rows update") {
    val df = SparkEntry.queries("q_merge_upsert")(spark, sf).cache()
    assert(df.filter(col("name") === "NEW").count() === 1)
    val nCust = Tables.load(spark, sf, "customer").count()
    assert(df.count() === nCust + 1)
    df.unpersist()
  }
}
