package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 4: interval-overlap join and interval coalescing. */
class Round10dSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("intervalOverlapJoin: overlap, touch, disjoint; multi-bin pairs appear once") {
    val left = Seq((1L, 10L, 0L, 100L)).toDF("user_id", "id", "lo", "hi")
    val right = Seq(
      (1L, 20L, 50L, 150L),  // overlaps [0,100]
      (1L, 21L, 100L, 200L), // touches at 100 (inclusive -> pair)
      (1L, 22L, 101L, 200L), // disjoint
      (2L, 23L, 0L, 100L)    // other key -> never paired
    ).toDF("user_id", "id", "lo", "hi")
    // binWidth 10 << interval width: the (10,20) pair shares ~6 bins
    val got = Joins.intervalOverlapJoin(left, right, "lo", "hi",
        binWidth = 10L, keys = Seq("user_id"))
      .select("user_id", "l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got === Seq((1L, 10L, 20L), (1L, 10L, 21L)))
  }

  test("intervalOverlapJoin matches the naive cross-join filter on random intervals") {
    val rnd = new scala.util.Random(7)
    val mk = (n: Int, off: Long) => (1 to n).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (rnd.nextInt(5).toLong, off + i, lo, lo + 1 + rnd.nextInt(300))
    }.toDF("k", "id", "lo", "hi")
    val l = mk(60, 1000L); val r = mk(60, 2000L)
    for (bw <- Seq(7L, 128L, 1024L)) {
      val got = Joins.intervalOverlapJoin(l, r, "lo", "hi", bw, Seq("k"))
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq
      val naive = l.toDF("k", "lid", "llo", "lhi")
        .join(r.toDF("k", "rid", "rlo", "rhi"), "k")
        .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(got.sorted === naive.sorted, s"binWidth=$bw")
      assert(got.size === got.distinct.size, s"dupes at binWidth=$bw")
    }
  }

  test("intervalOverlapJoin rejects an unkeyed call (bin-only join key skews at scale)") {
    val df = Seq((1L, 0L, 10L)).toDF("id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      Joins.intervalOverlapJoin(df, df, "lo", "hi", binWidth = 10L, keys = Nil)
    }
    assert(e.getMessage.contains("equi-key"))
  }

  test("coalesceIntervals: overlaps and touches merge, gaps split; covered is exact") {
    val df = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // merge -> [0,20]
      (1L, 20L, 30L),                 // touch -> still [0,30]
      (1L, 40L, 50L),                 // gap -> new span
      (1L, 42L, 44L),                 // nested -> absorbed
      (2L, 0L, 1L)
    ).toDF("user_id", "lo", "hi")
    val got = Joins.coalesceIntervals(df, Seq("user_id"), "lo", "hi")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 40L), (2L, 1L, 1L)))
  }
}
