package graft

import graft.ingest.Ingest
import graft.ops.{Layout, Multimodal, Similarity, Sketches, Skew}
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 part 4: Z-order layout, stable id assignment, Bloom
  * runtime-filter joins, join-cardinality synopses, random projection,
  * schema-evolution merges, payload dedup, streaming drift.
  */
class Round8dSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- zValue / zorderStats ----

  test("zValue: matches bit-interleave brute force on the 16x16 grid") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }
    val grid = for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)
    val out = grid.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) => assert(out((x, y)) === morton(x, y, 4)) }
  }

  test("zorderStats: bucket rectangles are narrow vs the global span") {
    val grid = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val stats = Layout.zorderStats(grid.toDF("x", "y"),
      col("x"), col("y"), bits = 6, bucketBits = 4).collect()
    assert(stats.length === 16)
    // top-4 z-bits = one quadrant of a 4x4 recursive split: each bucket
    // covers a 16x32 or 32x16 rectangle of the 64x64 space, never the
    // global 64x64
    stats.foreach { r =>
      val xs = r.getAs[Long]("x_span"); val ys = r.getAs[Long]("y_span")
      assert(xs * ys <= (64L * 64L) / 16L,
        s"bucket ${r.getAs[Long]("bucket")} covers $xs x $ys")
    }
    assert(stats.map(_.getAs[Long]("n")).sum === 64L * 64L)
  }

  // ---- assignStableIds ----

  test("assignStableIds: dense permutation equal to global md5 order") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ids = (0L until 300L)
    val expected = ids.sortBy(i =>
        (java.lang.Long.parseLong(md5hex(s"sid:$i").take(15), 16), i))
      .zipWithIndex.toMap
    val out = Layout.assignStableIds(ids.toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSeq.sorted === (0L until 300L))
    ids.foreach(i => assert(out(i) === expected(i).toLong))
  }

  // ---- bloomPrunedJoin ----

  test("bloomPrunedJoin: equals the plain join; Bloom set broadcast") {
    val fact = (0L until 2000L).map(i => (i, i % 97L)).toDF("row_id", "fk")
    val dim = Seq((3L, "a"), (11L, "b"), (95L, "c")).toDF("pk", "name")
    val got = Skew.bloomPrunedJoin(fact, "fk", dim, "pk")
      .select("row_id", "fk", "pk", "name")
    val want = fact.join(dim, col("fk") === col("pk"))
      .select("row_id", "fk", "pk", "name")
    assert(got.collect().toSet === want.collect().toSet)
    assert(got.queryExecution.executedPlan.toString.contains("Broadcast"))
  }

  test("bloomPositions: k deterministic positions in [0, m)") {
    val pos = Seq(("k1"), ("k1"), ("k2")).toDF("k")
      .select(Skew.bloomPositions(col("k"), 1 << 12, 3).as("p"))
      .collect().map(_.getSeq[Long](0))
    assert(pos(0) === pos(1))           // deterministic
    assert(pos(0) !== pos(2))
    pos.flatten.foreach(p => assert(p >= 0L && p < (1L << 12)))
    assert(pos(0).length === 3)
  }

  // ---- joinCardinalityAudit ----

  test("joinCardinalityAudit: exact_pairs is the true join size; " +
      "bucketed synopsis is an upper bound, exact at buckets=1 totals") {
    val a = (0L until 500L).map(i => i % 13L).toDF("ka")
    val b = (0L until 300L).map(i => i % 7L).toDF("kb")
    val row = Sketches.joinCardinalityAudit(a, "ka", b, "kb", buckets = 8)
      .collect().head
    val trueSize = a.join(b, col("ka") === col("kb")).count()
    assert(row.getAs[Long]("exact_pairs") === trueSize)
    assert(row.getAs[Long]("bucket_upper") >= trueSize)
    assert(row.getAs[Long]("n_join_keys") === 7L) // keys 0..6 shared
    val one = Sketches.joinCardinalityAudit(a, "ka", b, "kb", buckets = 1)
      .collect().head
    assert(one.getAs[Long]("bucket_upper") === 500L * 300L)
  }

  // ---- randomProjection ----

  test("randomProjection: one-hot vectors recover the ±1 sign matrix") {
    val dims = 16; val outDims = 4
    val oneHots = (0 until dims).map(i =>
      (i.toLong, Array.tabulate(dims)(d => if (d == i) 1.0f else 0.0f)))
    val out = Similarity.randomProjection(oneHots.toDF("vid", "vec"),
        "vid", "vec", outDims = outDims, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (i <- 0 until dims; j <- 0 until outDims)
      assert(out((i.toLong, j.toLong)) === Similarity.rpSign(42L, j, i))
  }

  test("randomProjection: no shuffle — a pure per-row map") {
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("vid", "vec")
    val plan = Similarity.randomProjection(df, "vid", "vec",
      outDims = 2, dims = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- mergeSnapshots ----

  test("mergeSnapshots: by-name union with null-fill and provenance") {
    val v1 = Seq((1L, "a")).toDF("id", "text")
    val v2 = Seq((2L, "b", "en")).toDF("id", "text", "lang")
    val out = Ingest.mergeSnapshots(Seq("v1" -> v1, "v2" -> v2))
    assert(out.columns.toSet === Set("id", "text", "lang", "_version"))
    val rows = out.collect().map(r => r.getAs[String]("_version") ->
      ((r.getAs[Long]("id"), r.getAs[String]("lang")))).toMap
    assert(rows("v1") === ((1L, null)))
    assert(rows("v2") === ((2L, "en")))
  }

  // ---- payloadDedup ----

  test("payloadDedup: binary-identical payloads group; bytes reclaimed") {
    val media = Seq(
      (10L, Array[Byte](1, 2, 3)),
      (7L, Array[Byte](1, 2, 3)),
      (5L, Array[Byte](1, 2, 3)),
      (9L, Array[Byte](9, 9))).toDF("media_id", "payload")
    val out = Multimodal.payloadDedup(media, "media_id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(5L) === ((3L, 3L, 6L)))  // 3 copies x 3 bytes → 6 reclaimed
    assert(out(9L) === ((1L, 2L, 0L)))
  }

  // ---- driftOverCounts ----

  test("driftOverCounts: uniform windows have zero drift; a skewed " +
      "window's L1 matches hand arithmetic") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    // w0: 2 a + 2 b (the global blend); w1: 4 a only
    val counts = Seq((t0, "a", 2L), (t0, "b", 2L), (t1, "a", 4L))
      .toDF("window_start", "event_type", "n")
    val out = Streams.driftOverCounts(counts)
      .collect().map(r => r.getTimestamp(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // global: a=6/8, b=2/8. w0: a=1/2,b=1/2 → l1=|1/2-3/4|+|1/2-1/4|=0.5
    assert(out(t0) === ((4L, 0.5, 0.25)))
    // w1: a=1,b=0 → l1=|1-3/4|+|0-1/4|=0.5, max_dev=0.25
    assert(out(t1) === ((4L, 0.5, 0.25)))
  }

  test("windowedDrift: identical-mix windows drift zero end to end") {
    val rows = for {
      h <- 0 until 3; i <- 0 until 10
      tpe = if (i < 7) "view" else "click"
    } yield (java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:15:00"), tpe)
    val out = Streams.windowedDrift(rows.toDF("ts", "event_type"), "1 hour")
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Double]("l1") === 0.0)
      assert(r.getAs[Long]("n_events") === 10L)
    }
  }
}
