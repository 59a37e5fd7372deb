package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 22: streaming rate limiting. */
class Round8vSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("userRateFlags: only over-limit (window, user) cells surface") {
    val ev = ((1 to 5).map(i => (1L, t(f"2024-01-01 10:00:$i%02d"))) ++
      Seq((2L, t("2024-01-01 10:00:30")),
        (1L, t("2024-01-01 11:00:00"))))
      .toDF("user_id", "ts")
    val r = Streams.userRateFlags(ev, "1 hour", limit = 3L).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("user_id") === 1L)
    assert(r(0).getAs[Long]("n") === 5L)
    assert(r(0).getAs[java.sql.Timestamp]("window_start") ===
      t("2024-01-01 10:00:00"))
  }

  test("userRateFlags runs as a real stream; flags equal batch replay") {
    val ev = ((1 to 60).map(i => (7L, t(f"2024-01-01 10:${i % 60}%02d:00"))) ++
      (1 to 5).map(i => (8L, t(f"2024-01-01 10:0$i:30"))))
      .toDF("user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graftrate")
    ev.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(ev.schema).parquet(s"$dir/in")
    val q = Streams.userRateFlags(stream, "1 hour", limit = 50L)
      .writeStream.outputMode("complete")
      .format("memory").queryName("rate_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("rate_out").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val want = Streams.userRateFlags(ev, "1 hour", limit = 50L).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
    assert(want.map(_._2) === Set(7L)) // user 8 stays under the limit
  }
}
