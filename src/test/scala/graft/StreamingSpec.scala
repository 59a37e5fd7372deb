package graft

import graft.streaming.Streams
import graft.streaming.Streams.Event
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics: a real readStream run must produce
  * exactly what the same plan produces in batch, and the two session
  * formulations (session_window vs custom state) must agree.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val events = Tables.load(spark, "/root/testdata/sf0.001", "events")

  test("event_id is unique in the base events table (q_stream_dedup oracle precondition)") {
    // q_stream_dedup's oracle (plain SELECT ... FROM events) and its
    // dropDuplicates determinism both assume the generator never emits
    // two different rows under one event_id — the non-unique-lineitem
    // precedent (ADVICE r6). A generator change must fail HERE, loudly,
    // not as a flaky hash mismatch in the driver gate — so check the
    // gate SF (0.01) as well as the test SF.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val ev = Tables.load(spark, dir, "events")
      val dups = ev.groupBy(col("event_id")).count().filter(col("count") > 1).count()
      assert(dups === 0, s"$dir has $dups duplicated event_ids")
    }
  }

  test("streaming tumbling agg over a file source equals the batch result") {
    val dir = Files.createTempDirectory("graftstream")
    // stage the events (ns→us already handled by Tables.load) as the stream source
    events.write.mode("overwrite").parquet(s"$dir/in")
    val schema = events.schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")

    val q = Streams.tumblingAgg(stream, "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("tumbling_out")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = Streams.tumblingAgg(events, "1 hour")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("streaming in-window value trend over a file source equals the batch result") {
    val dir = Files.createTempDirectory("graftstream")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Streams.windowedTrend(stream, windowSec = 3600L)
      .writeStream.outputMode("complete")
      .format("memory").queryName("trend_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("window_start", "event_type", "n", "slope_cents_per_sec",
        "mean_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getDouble(4))).toSet
    val got = key(spark.table("trend_out"))
    val want = key(Streams.windowedTrend(events, windowSec = 3600L))
    assert(got == want && want.nonEmpty)
  }

  test("streaming windowed approx-distinct over a file source equals the batch result") {
    val dir = Files.createTempDirectory("grafthll")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Streams.windowedApproxDistinct(stream, "1 hour", "event_type", "user_id")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("hll_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = Streams.windowedApproxDistinct(events, "1 hour", "event_type", "user_id")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && want.nonEmpty) // HLL++ is hash-based: identical in stream and batch
  }

  test("streaming windowed fingerprint over a file source equals the batch result") {
    val dir = Files.createTempDirectory("graftfp")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Streams.windowedFingerprint(stream, "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("fp_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("fp_out")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val want = Streams.windowedFingerprint(events, "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
    // the checksum is content-sensitive: perturbing one event's props
    // flips exactly that window's fingerprint
    val perturbed = Streams.windowedFingerprint(
      events.withColumn("props",
        when(col("event_id") === 0L, lit("tampered")).otherwise(col("props"))),
      "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(perturbed != want && (want -- perturbed).size == 1)
  }

  test("stream-stream interval join over file sources equals the batch result") {
    val dir = Files.createTempDirectory("graftssj")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Streams.viewClickJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ssj_out").select("view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Streams.viewClickJoin(events).select("view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("stream-stream LEFT OUTER interval join: matches eager, null rows on watermark") {
    val dir = Files.createTempDirectory("graftsslj")
    // one data batch (the initial watermark is 0, so nothing can be
    // dropped as late regardless of file listing order), then a sentinel
    // batch advances the watermark and flushes the outer state
    events.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Streams.viewClickJoinLeft(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sslj_out")
      .start()
    try {
      q.processAllAvailable()
      // advance BOTH watermarks decisively past every original event: a
      // sentinel view + click 2h after the corpus end. After this, every
      // original unmatched view is provably evictable and must emit.
      val maxTs = events.agg(max(col("ts"))).head.getTimestamp(0)
      val late = new java.sql.Timestamp(maxTs.getTime + 2 * 3600 * 1000L)
      Seq((-1L, late, -1L, "view", 0.0, "{}"), (-2L, late, -2L, "click", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .select(events.schema.fields.toSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sslj_out")
      .filter(col("view_id") >= 0) // drop the sentinel's own rows
      .collect().map(r => (r.getLong(1), Option(r.get(2)))).toSet
    val batch = Streams.viewClickJoinLeft(events)
      .collect().map(r => (r.getLong(1), Option(r.get(2)))).toSet
    // with the watermark past everything, stream == batch EXACTLY —
    // matched rows eagerly, null-padded rows on eviction
    assert(got == batch && batch.exists(_._2.isEmpty) && batch.exists(_._2.isDefined))
  }

  test("streaming dedup over a duplicated file source emits each event once") {
    val dir = Files.createTempDirectory("graftdedup")
    // stage the feed TWICE — the at-least-once delivery shape
    events.write.mode("overwrite").parquet(s"$dir/in")
    events.write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Streams.dedupStream(stream, Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_out").groupBy("event_id").count()
    assert(got.filter(col("count") =!= 1).count() === 0, "an event was emitted more than once")
    assert(got.count() === events.count(), "an event was lost")
    // and the batch form of the same semantics agrees
    val batch = SparkEntry.queries("q_stream_dedup")(spark, "/root/testdata/sf0.001")
    assert(batch.count() === events.count())
  }

  test("sliding windows produce window/slide multiples per event") {
    val got = Streams.slidingAgg(events, "1 hour", "30 minutes")
      .agg(sum("n")).head().getLong(0)
    // each event lands in exactly 2 sliding windows
    assert(got == 2 * events.count())
  }

  test("session_window agg and custom stateful sessionize agree") {
    val gapMs = 30 * 60 * 1000L
    val builtin = Streams.sessionAgg(events, "30 minutes")
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val custom = Streams.sessionizeBatch(events.as[Event], gapMs)
      .collect().map(s => (s.user_id, s.n_events))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(builtin == custom && builtin.nonEmpty)
  }

  test("sessionize splits on gap and merges within gap") {
    def ts(min: Int) = new Timestamp(min * 60000L)
    val evts = Seq(
      Event(1, ts(0), 1, "a", 1.0, ""), Event(2, ts(10), 1, "a", 2.0, ""),
      Event(3, ts(60), 1, "a", 3.0, ""), // > 30min gap → new session
      Event(4, ts(5), 2, "b", 4.0, "")
    ).toDS()
    val sessions = Streams.sessionizeBatch(evts, 30 * 60 * 1000L)
      .collect().sortBy(s => (s.user_id, s.started.getTime))
    assert(sessions.map(s => (s.user_id, s.n_events, s.total_value)).toSeq ==
      Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
  }

  test("streaming ingestion appends micro-batches into a catalog table") {
    val dir = Files.createTempDirectory("graftingest")
    val engine = new Engine(spark, Files.createTempDirectory("graftingestdb").toString)
    engine.execute("CREATE TABLE sink (event_id INT, user_id INT, value DECIMAL)")
    events.select("event_id", "user_id", "value").limit(200)
      .write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(events.select("event_id", "user_id", "value").schema)
      .parquet(s"$dir/in")
    val q = Streams.streamIntoCatalog(stream, engine.catalog, "sink")
    try q.processAllAvailable() finally q.stop()
    assert(engine.catalog.load("sink").count() == 200)
    // and it is queryable through both surfaces
    assert(engine.execute("SELECT COUNT(*) FROM sink").toOption.get.collect().head.getLong(0) == 200)
    assert(engine.sparkSql("SELECT COUNT(*) FROM sink").collect().head.getLong(0) == 200)
  }

  test("sparkSql passthrough: full SQL (join + window) over catalog tables") {
    val engine = new Engine(spark, Files.createTempDirectory("graftsqldb").toString)
    engine.execute("CREATE TABLE people (id INT, dept TEXT, pay DECIMAL)")
    Seq("(1, 'eng', 100)", "(2, 'eng', 120)", "(3, 'ops', 90)").foreach(v =>
      engine.execute(s"INSERT INTO people (id, dept, pay) VALUES $v"))
    val r = engine.sparkSql(
      """SELECT id, dept, RANK() OVER (PARTITION BY dept ORDER BY pay DESC) AS rk
         FROM people ORDER BY id""").collect()
    assert(r.map(x => (x.getLong(0), x.getInt(2))).toSeq == Seq((1L, 2), (2L, 1), (3L, 1)))
  }
}
