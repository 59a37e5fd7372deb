package graft

import graft.ops.{Graphs, Layout}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 20: path mining, partition advisor. */
class Round8tSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("frequentPaths: counts consecutive triples per user, ranks totally") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1: a b c a b c → (a,b,c)×2, (b,c,a)×1, (c,a,b)×1
    val ev = Seq("a", "b", "c", "a", "b", "c").zipWithIndex.map {
      case (ty, i) => (1L, t(i), ty, i.toLong)
    }.toDF("user_id", "ts", "event_type", "event_id")
    val r = Graphs.frequentPaths(ev, "user_id", "ts", "event_type",
        "event_id", len = 3, topK = 20)
      .orderBy(col("rank")).collect()
    assert(r.length === 3)
    assert((r(0).getAs[String]("step1"), r(0).getAs[String]("step2"),
      r(0).getAs[String]("step3"), r(0).getAs[Long]("n")) ===
      (("a", "b", "c", 2L)))
    // ties (n=1) rank by path order: (b,c,a) before (c,a,b)
    assert(r(1).getAs[String]("step1") === "b")
    assert(r(2).getAs[String]("step1") === "c")
  }

  test("frequentPaths: windows never cross users") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq((1L, t(0), "a", 0L), (1L, t(1), "b", 1L),
      (2L, t(2), "c", 2L), (2L, t(3), "d", 3L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val r = Graphs.frequentPaths(ev, "user_id", "ts", "event_type",
      "event_id", len = 2, topK = 20).collect()
    val paths = r.map(x => (x.getAs[String]("step1"),
      x.getAs[String]("step2"))).toSet
    assert(paths === Set(("a", "b"), ("c", "d"))) // no b→c bridge
  }

  test("partitionAdvisor: exact byte rule, ceil partitions, broadcast flag") {
    val small = Seq((1L, "ab"), (2L, "cdef")).toDF("k", "s")
    // rows: 8+2+4 = 14 and 8+4+4 = 16 → 30 bytes total
    val r = Layout.partitionAdvisor(Seq("small" -> small),
      targetPartitionBytes = 16L, broadcastThreshold = 64L).head()
    assert(r.getAs[Long]("est_bytes") === 30L)
    assert(r.getAs[Long]("est_row_bytes") === 15L)
    assert(r.getAs[Long]("n_partitions") === 2L) // ceil(30/16)
    assert(r.getAs[Boolean]("broadcastable"))
  }
}
