package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface over the `events` table shape
  * (SURVEY.md §2.10 — the reference has no streaming; semantics defined
  * fresh here per SURVEY §7 "What's hard" #5).
  *
  * Every transform takes a DataFrame that may be a batch read or a
  * `readStream` — identical plans either way, which is how the batch
  * oracle (q_events_hourly) and the streaming tests share semantics.
  * Watermarks bound state: at 100 TB/day the window state store only
  * holds `watermark` worth of late data per key.
  */
object Streams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionSummary(user_id: Long, n_events: Long,
      total_value: Double, started: Timestamp, ended: Timestamp)

  final case class SessionState(nEvents: Long, totalValue: Double,
      started: Long, lastTs: Long)

  /** Tumbling-window counts/sums per event type. */
  def tumblingAgg(events: DataFrame, window: String, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Tumbling-window approximate distinct counts — the streaming
    * cardinality dashboard (distinct users per hour per type) at a
    * state size the watermark bounds: HLL++ is a mergeable sketch, so
    * each open window holds one constant-size sketch per group instead
    * of the user-id set an exact distinct would buffer — the ONLY
    * viable distinct-count shape in a stream over 100 TB/day of
    * events (an exact streaming countDistinct would grow state with
    * cardinality and is not even supported in update mode).
    */
  def windowedApproxDistinct(events: DataFrame, window: String,
      keyCol: String, distinctCol: String, rsd: Double = 0.02,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col(keyCol))
      .agg(approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("approx_distinct"), col("n"))

  /** Tumbling-window content fingerprint — streaming data versioning:
    * each closed window carries an order-independent 60-bit checksum
    * (xor of per-event content hashes) so a replayed/backfilled window
    * can be compared to the original without storing the events.
    * bit_xor is a tiny commutative aggregate: one i64 of state per open
    * window, stream/batch identical (see [[graft.ops.Profile]] for the
    * batch corpus form of the same idea).
    */
  def windowedFingerprint(events: DataFrame, window: String,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("__h", graft.ops.Profile.contentHash60(
        col("event_id").cast("string"), col("user_id").cast("string"),
        coalesce(col("event_type"), lit("")), coalesce(col("props"), lit(""))))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(count(lit(1)).as("n_events"), expr("bit_xor(__h)").as("fingerprint"))
      .select(col("window.start").as("window_start"), col("n_events"),
        col("fingerprint"))

  /** Windowed top-k heavy hitters — the streaming trend dashboard:
    * within each tumbling window, the k event types with the most
    * events (ties: event_type asc, so the cut is deterministic). The
    * windowed count is the stream-safe stage (mergeable, watermark-
    * bounded state: one counter per open (window, type)); the top-k
    * cut is a per-window WindowGroupLimit over the FINALIZED window
    * counts — in a live deployment that stage runs on the aggregated
    * sink (foreachBatch / a downstream batch job over the append
    * output), which is why it takes the aggregate frame, not the raw
    * events. Identical plan in batch replay, which is what the oracle
    * recomputes.
    */
  def windowedTopK(events: DataFrame, window: String, k: Int,
      watermark: String = "10 minutes"): DataFrame =
    topKOverCounts(windowedCounts(events, window, watermark), k)

  /** The stream-safe half of [[windowedTopK]]: watermark-bounded
    * per-(window, type) counts — this is the stage that runs as a
    * writeStream (StreamingSpec drives it over a file source).
    */
  def windowedCounts(events: DataFrame, window: String,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** In-window value trend per event type: the exact OLS slope of each
    * event's value (in cents) against its OFFSET into the window — the
    * "is this metric rising or falling within the hour" signal a drift
    * monitor consumes per (window, type). All five regression moments
    * are plain BIGINT sums, so the whole thing is ONE watermarked
    * map-combinable aggregate: it runs unchanged as a writeStream
    * (state = five longs per open (window, type); the watermark evicts
    * closed windows) and as the batch plan the oracle replays. x is
    * the in-window second offset computed per row as ut mod windowSec
    * (tumbling windows are epoch-aligned, so no reference to the
    * window struct is needed pre-aggregation), which keeps Σx² exact
    * in a long; y casts through DECIMAL(18,2) so the cents are the
    * same integers in both engines. Slope = (nΣxy − ΣxΣy)/(nΣx² −
    * (Σx)²), one IEEE division after the exact sums; a window whose
    * events all share one second has no slope (NULL).
    */
  def windowedTrend(events: DataFrame, windowSec: Long = 21600L,
      watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val agg = events
      .withWatermark("ts", watermark)
      .withColumn("_x", pmod(unix_timestamp(col("ts")), lit(windowSec)))
      .withColumn("_y",
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
      .groupBy(window(col("ts"), s"$windowSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"))
    agg.select(col("window.start").as("window_start"), col("event_type"),
      col("n"),
      when(col("n") * col("_sxx") - col("_sx") * col("_sx") > 0,
        round((col("n") * col("_sxy") - col("_sx") * col("_sy"))
          .cast("double") /
          (col("n") * col("_sxx") - col("_sx") * col("_sx"))
            .cast("double"), 6)).as("slope_cents_per_sec"),
      round(col("_sy").cast("double") / (col("n") * 100L).cast("double"), 6)
        .as("mean_value"))
  }

  /** Streaming per-user rate limiting: (window, user) event counts
    * with a watermark — the same streamable aggregate shape as
    * [[windowedCounts]], keyed by user — filtered to windows where the
    * count exceeds `limit`. State is one counter per (open window,
    * active user); the watermark evicts closed windows, so state is
    * bounded by active-users × open-windows regardless of history.
    * Batch replay is the identical plan (what the oracle recomputes);
    * the flag filter is stateless and runs inside the streaming plan.
    */
  def userRateFlags(events: DataFrame, window: String, limit: Long,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > limit)
      .select(col("window.start").as("window_start"), col("user_id"),
        col("n"))

  /** The sink-side half of [[windowedTopK]]: rank the finalized window
    * counts and keep k per window. Runs over the aggregate sink (or the
    * same frame in batch replay), never inside the streaming plan —
    * row_number over a streaming aggregate is not a streamable shape.
    */
  def topKOverCounts(counts: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy(col("window_start"))
      .orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(rk).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Per-window distribution drift vs the corpus blend — the streaming
    * data-quality monitor that catches an upstream source going dark or
    * a scraper flooding one event type. Streaming half = the proven
    * [[windowedCounts]] aggregate (StreamingSpec drives it as a real
    * writeStream); this half runs sink-side over the finalized counts,
    * like [[topKOverCounts]].
    *
    * Deviations are computed on INTEGER numerators: |p_wt − p_t| =
    * |n_wt·N − n_t·N_w| / (N_w·N), so the per-window L1 distance is an
    * exact integer sum divided once — no float-accumulation order to
    * drift cross-engine — and max-deviation is a max (order-free).
    * Missing (window, type) cells count as 0 via the window×type grid.
    */
  def driftOverCounts(counts: DataFrame): DataFrame = {
    // the counts frame is windows×types — tiny and reused four times,
    // so persist it rather than re-running the event scan per branch
    val c = counts.persist()
    val g = c.groupBy("event_type").agg(sum("n").as("nt"))
    val wt = c.groupBy("window_start").agg(sum("n").as("nw"))
    val tot = c.agg(sum("n").as("n_total"))
    val grid = wt.crossJoin(broadcast(g))
    grid.join(c, Seq("window_start", "event_type"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .withColumn("_num",
        abs(col("n") * col("n_total") - col("nt") * col("nw")))
      .groupBy(col("window_start"), col("nw"), col("n_total"))
      .agg(sum(col("_num")).as("_l1num"), max(col("_num")).as("_mxnum"))
      .select(col("window_start"), col("nw").as("n_events"),
        round(col("_l1num").cast("double") /
          (col("nw") * col("n_total")).cast("double"), 6).as("l1"),
        round(col("_mxnum").cast("double") /
          (col("nw") * col("n_total")).cast("double"), 6).as("max_dev"))
  }

  /** [[windowedCounts]] (stream-safe) composed with [[driftOverCounts]]
    * (sink-side) — batch replay is the identical plan, which is what
    * the oracle recomputes.
    */
  def windowedDrift(events: DataFrame, window: String,
      watermark: String = "10 minutes"): DataFrame =
    driftOverCounts(windowedCounts(events, window, watermark))

  /** Windowed corpus-intake quality monitor: per event-time window,
    * how many arriving documents pass the quality filter. Takes a
    * frame with `ts` and a boolean `keep` (the per-row
    * [[graft.ops.TextAnalysis.qualityFilterReasons]] flag — pure
    * codegen'd row expressions, streamable inline) and runs the
    * proven watermark+window aggregate shape. A collapsing keep_rate
    * is the first signal a scraper started feeding junk.
    */
  def windowedKeepRate(df: DataFrame, window: String,
      watermark: String = "10 minutes"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_keep"))
      .select(col("window.start").as("window_start"), col("n_docs"),
        col("n_keep"),
        round(col("n_keep").cast("double") /
          col("n_docs").cast("double"), 6).as("keep_rate"))

  /** Watermark-lateness audit — the measurement that answers "what
    * watermark delay does this feed actually need?" before committing
    * state-eviction bounds. For each event, lateness = (max event-time
    * among events that ARRIVED before it) − (its own event-time); the
    * histogram's tail is the watermark you must tolerate, and events
    * past your chosen delay are the ones a streaming dedup/agg would
    * silently drop.
    *
    * The running max over arrival order is computed WITHOUT a global
    * window: arrival keys bucket into `blockSize` ranges (block id is
    * monotone in arrival), each block computes its running max in
    * parallel, and a block-count-sized carry frame contributes the
    * prefix max — the [[graft.ops.Packing]] distributed-scan shape
    * applied to max. Output: per-lateness-bucket counts with exact
    * integer second bounds; buckets cap at `maxBucket`.
    */
  def latenessProfile(events: DataFrame, arrivalCol: String,
      bucketSeconds: Int = 600, maxBucket: Int = 23,
      blockSize: Long = 100000L): DataFrame = {
    val e = events.select(col(arrivalCol).as("_arr"),
        col("event_id"), unix_micros(col("ts")).as("_tsu"))
      .withColumn("_blk", floor(col("_arr") / blockSize).cast("long"))
    val wIn = Window.partitionBy(col("_blk"))
      .orderBy(col("_arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val inBlk = e.withColumn("_run_in", max(col("_tsu")).over(wIn))
    val blockMax = e.groupBy(col("_blk")).agg(max(col("_tsu")).as("_bmax"))
    // exclusive prefix max over the tiny block frame (rows / blockSize)
    val wCarry = Window.orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = blockMax
      .withColumn("_carry", max(col("_bmax")).over(wCarry))
      .select(col("_blk"), col("_carry"))
    inBlk.join(carries, Seq("_blk"))
      .withColumn("_run", greatest(col("_run_in"),
        coalesce(col("_carry"), lit(Long.MinValue))))
      .withColumn("late_s", floor((col("_run") - col("_tsu")) / 1e6).cast("long"))
      .withColumn("late_bucket",
        least(floor(col("late_s") / bucketSeconds), lit(maxBucket.toLong)))
      .groupBy(col("late_bucket"))
      .agg(count(lit(1)).as("n"),
        max(col("late_s")).as("max_late_s"),
        sum((col("late_s") > 0L).cast("long")).as("n_late"))
  }

  /** Sliding-window aggregation. */
  def slidingAgg(events: DataFrame, window: String, slide: String,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows: events within `gap` of each other merge into one
    * session per user (built-in session_window — state is merged
    * incrementally, not buffered per event).
    */
  def sessionAgg(events: DataFrame, gap: String, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Watermarked streaming dedup: at-least-once sources (Kafka
    * replays, retried uploads) deliver duplicates; this emits each key
    * once, keeping per-key state only for `watermark` of event time —
    * the bounded-state streaming form of exact dedup. In batch the
    * same semantics are plain `dropDuplicates(keys)` (Spark restricts
    * dropDuplicatesWithinWatermark to streaming frames);
    * StreamingSpec proves the two agree on a duplicated feed.
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Continuous ingestion: append each micro-batch of a stream into a
    * catalog table (foreachBatch → the same append path DML uses, so
    * partitioning and schema alignment apply). Returns the handle;
    * callers own its lifecycle.
    */
  def streamIntoCatalog(stream: DataFrame, catalog: graft.catalog.Catalog,
      table: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = catalog.sparkSchema(table)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val aligned = batch.select(
          schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
        catalog.append(table, aligned)
      }
      .start()
  }

  /** Watermarked stream-stream interval join: each 'click' pairs with
    * the same user's 'view' events from the preceding `horizon`. The
    * time-bound join condition is what lets Spark evict join state once
    * the watermark passes view_ts + horizon — without it a
    * stream-stream join buffers both sides forever. Inner stream-stream
    * joins emit matches as they arrive (the watermark only bounds
    * state), and `withWatermark` is a no-op in batch, so a batch
    * DataFrame runs the identical plan — which is how the DuckDB
    * oracle checks the semantics.
    */
  def viewClickJoin(events: DataFrame, horizon: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    views.join(clicks,
        col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** LEFT OUTER watermarked stream-stream interval join — the
    * attribution report [[viewClickJoin]] can't produce: views with NO
    * click inside the horizon survive with null click columns. In a
    * stream, Spark emits the null-padded row only once the watermark
    * proves no matching click can still arrive (view_ts + horizon +
    * watermark delay passes) — the outer result is late by exactly the
    * eviction bound, but complete; in batch the identical plan emits it
    * immediately. Both watermarks and the time-bound condition are
    * REQUIRED for a streaming outer join (unbounded state otherwise —
    * Spark rejects the plan), which is why the bound lives in the join
    * condition here and not in a post-filter.
    */
  def viewClickJoinLeft(events: DataFrame, horizon: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    views.join(clicks,
        col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
        "left_outer")
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Streaming exact dedup: drops rows whose key was already seen
    * within the watermark horizon — the streaming face of
    * Dedup.exact, with state bounded by the watermark instead of
    * growing forever.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Custom stateful sessionization via flatMapGroupsWithState: emits a
    * SessionSummary when a user's session times out. Demonstrates
    * arbitrary per-key state (the mapGroupsWithState surface) beyond
    * what session_window can express.
    */
  def sessionize(events: Dataset[Event], gapMillis: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._

    def update(userId: Long, evts: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionSummary] = {
      val sorted = evts.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val out = Seq.newBuilder[SessionSummary]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs <= gapMillis =>
            cur = Some(SessionState(s.nEvents + 1, s.totalValue + e.value, s.started, t))
          case Some(s) =>
            out += SessionSummary(userId, s.nEvents, s.totalValue,
              new Timestamp(s.started), new Timestamp(s.lastTs))
            cur = Some(SessionState(1, e.value, t, t))
          case None =>
            cur = Some(SessionState(1, e.value, t, t))
        }
      }
      cur match {
        case Some(s) if state.hasTimedOut =>
          out += SessionSummary(userId, s.nEvents, s.totalValue,
            new Timestamp(s.started), new Timestamp(s.lastTs))
          state.remove()
        case Some(s) =>
          state.update(s)
          state.setTimeoutDuration(gapMillis)
        case None => ()
      }
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(update)
  }

  /** Flush any open sessions in a *batch* context (no timeouts fire in
    * batch execution): sessionize then append the still-open tail
    * sessions computed from the same grouping. Used by tests.
    */
  def sessionizeBatch(events: Dataset[Event], gapMillis: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId, evts) =>
      val sorted = evts.toSeq.sortBy(_.ts.getTime)
      val sessions = Seq.newBuilder[SessionSummary]
      var open: Option[(Long, Double, Long, Long)] = None // n, total, started, last
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some((n, tot, st, last)) if t - last <= gapMillis =>
            open = Some((n + 1, tot + e.value, st, t))
          case Some((n, tot, st, last)) =>
            sessions += SessionSummary(userId, n, tot, new Timestamp(st), new Timestamp(last))
            open = Some((1L, e.value, t, t))
          case None => open = Some((1L, e.value, t, t))
        }
      }
      open.foreach { case (n, tot, st, last) =>
        sessions += SessionSummary(userId, n, tot, new Timestamp(st), new Timestamp(last))
      }
      sessions.result().iterator
    }
  }
}
