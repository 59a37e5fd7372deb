package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series diagnostics over the daily event grain: an
  * exact finite-lookback EWMA with integer anomaly bands, and the
  * autocorrelation function at small lags. Both collapse the corpus
  * to (key, day) counts FIRST — one map-combinable shuffle — and run
  * every window partitioned by the series key over a frame bounded by
  * CALENDAR DAYS, so the post-aggregate cost is independent of corpus
  * size. All decision arithmetic is integral (scaled rational weights,
  * cross-multiplied thresholds); doubles appear only in final ROUNDed
  * display columns, keeping every value engine-exact for the oracle.
  */
object TimeSeries {

  /** (key, day_idx, n) daily counts — the single corpus-scale shuffle
    * shared by both diagnostics. day_idx is the UTC epoch day.
    */
  private def dailyCounts(events: DataFrame, tsCol: String,
      keyCol: String): DataFrame =
    events
      .select(col(keyCol).as("k"),
        (unix_timestamp(col(tsCol)) - pmod(unix_timestamp(col(tsCol)),
          lit(86400L))).as("_ds"))
      .select(col("k"), (col("_ds") / 86400L).cast("long").as("day_idx"))
      .groupBy(col("k"), col("day_idx")).agg(count(lit(1)).as("n"))

  /** Finite-lookback EWMA (α = 1/4) over each key's daily count
    * series, with a cross-multiplied integer anomaly test.
    *
    * The textbook EWMA is the recursion e_t = α·x_t + (1−α)·e_{t−1};
    * its infinite tail is float-recursive and engine-divergent. With
    * lookback L the truncated, RENORMALIZED form
    *   e_t = Σ_{j=0..L} w_j·x_{t−j} / Σ_{j=0..L} w_j,  w_j = 3^j·4^{L−j}
    * (weights scaled by 4^L so every w_j is a whole number) is pure
    * integer window algebra: L+1 LAGs in ONE key-partitioned Window
    * node, two BIGINT dot products (numerator and, for rows near the
    * series start, the weight mass actually present), one correctly
    * rounded IEEE division at the end. Missing lags (series head, or
    * gaps — the series is the OBSERVED-day grain, not zero-filled)
    * simply drop out of both sums.
    *
    * The anomaly flag compares today's count to the PRIOR-days EWMA
    * (lags 1..L only — today must not vote on its own baseline):
    * |x_t − e_prev| / e_prev > thrNum/thrDen, cross-multiplied to the
    * integer test |x_t·den_p − num_p| · thrDen > thrNum · num_p so no
    * float enters the decision. First observed day per key has no
    * baseline → ewma_prev NULL, is_anomaly false.
    *
    * Scale shape: corpus → (key, day) counts in one map-combinable
    * aggregate; ONE window sort per key over ≤366 rows/key/year.
    * BIGINT bounds: daily counts up to ~2^53/4^L (≈137 B at L=8) are
    * exact — beyond that, widen the dot products to decimal(38,0).
    */
  def ewmaDaily(events: DataFrame, tsCol: String, keyCol: String,
      lookback: Int = 8, thrNum: Int = 1, thrDen: Int = 2): DataFrame = {
    require(lookback >= 1 && lookback <= 20, "1 <= lookback <= 20 (4^L fits a long)")
    require(thrNum >= 0 && thrDen >= 1, "threshold is a non-negative rational")
    val L = lookback
    def w(j: Int): Long = {
      var p = 1L; (1 to j).foreach(_ => p *= 3L)
      (j until L).foreach(_ => p *= 4L); p
    }
    val win = Window.partitionBy(col("k")).orderBy(col("day_idx"))
    val lagged = (1 to L).foldLeft(
        dailyCounts(events, tsCol, keyCol)
          .withColumn("_l0", col("n"))) { (df, j) =>
      df.withColumn(s"_l$j", lag(col("n"), j).over(win))
    }
    def dot(from: Int, f: Int => Column): Column =
      (from to L).map { j =>
        when(col(s"_l$j").isNotNull, f(j)).otherwise(lit(0L))
      }.reduce(_ + _)
    lagged
      .withColumn("_num", dot(0, j => lit(w(j)) * col(s"_l$j")))
      .withColumn("_den", dot(0, j => lit(w(j))))
      .withColumn("_nump", dot(1, j => lit(w(j)) * col(s"_l$j")))
      .withColumn("_denp", dot(1, j => lit(w(j))))
      .select(col("k"), col("day_idx"), col("n"),
        round(col("_num").cast("double") / col("_den").cast("double"), 6)
          .as("ewma"),
        when(col("_denp") > 0,
          round(col("_nump").cast("double") / col("_denp").cast("double"), 6))
          .as("ewma_prev"),
        (col("_denp") > 0 &&
          abs(col("n") * col("_denp") - col("_nump")) * thrDen >
            lit(thrNum.toLong) * col("_nump")).as("is_anomaly"))
  }

  /** Autocorrelation of each key's daily count series at lags
    * 1..maxLag: the Pearson correlation of (x_t, x_{t−j}) over the
    * aligned pairs, r_j = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)·(n·Σy² −
    * (Σy)²)). Every Σ is an exact BIGINT over integer counts (one
    * key-grain aggregate of the lag columns — the same single Window
    * sort as [[ewmaDaily]]); the ratio is two correctly rounded IEEE
    * ops on exactly representable integers, so ROUND(r, 6) is
    * engine-identical. Zero-variance sides → NULL. Pairs are over the
    * OBSERVED-day sequence (lag j = j observed days back).
    *
    * Returns (k, lag, n_pairs, acf) exploded from one row per key —
    * the output is |keys|·maxLag rows, never corpus-scale.
    */
  def acfDaily(events: DataFrame, tsCol: String, keyCol: String,
      maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1 && maxLag <= 14, "1 <= maxLag <= 14")
    val win = Window.partitionBy(col("k")).orderBy(col("day_idx"))
    val base = dailyCounts(events, tsCol, keyCol)
    val withLags = (1 to maxLag).foldLeft(base) { (df, j) =>
      df.withColumn(s"_y$j", lag(col("n"), j).over(win))
    }
    val aggs = (1 to maxLag).flatMap { j =>
      val pair = col(s"_y$j").isNotNull
      Seq(
        sum(when(pair, lit(1L)).otherwise(lit(0L))).as(s"_np$j"),
        sum(when(pair, col("n")).otherwise(lit(0L))).as(s"_sx$j"),
        sum(when(pair, col(s"_y$j")).otherwise(lit(0L))).as(s"_sy$j"),
        sum(when(pair, col("n") * col(s"_y$j")).otherwise(lit(0L))).as(s"_sxy$j"),
        sum(when(pair, col("n") * col("n")).otherwise(lit(0L))).as(s"_sx2$j"),
        sum(when(pair, col(s"_y$j") * col(s"_y$j")).otherwise(lit(0L))).as(s"_sy2$j"))
    }
    val perKey = withLags.groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
    val rows = (1 to maxLag).map { j =>
      val np = col(s"_np$j"); val sx = col(s"_sx$j"); val sy = col(s"_sy$j")
      val num = np * col(s"_sxy$j") - sx * sy
      val d1 = np * col(s"_sx2$j") - sx * sx
      val d2 = np * col(s"_sy2$j") - sy * sy
      struct(lit(j).as("lag"), np.as("n_pairs"),
        when(d1 > 0 && d2 > 0,
          round(num.cast("double") /
            sqrt(d1.cast("double") * d2.cast("double")), 6)).as("acf"))
    }
    perKey
      .select(col("k"), explode(array(rows: _*)).as("_r"))
      .select(col("k"), col("_r.lag").as("lag"),
        col("_r.n_pairs").as("n_pairs"), col("_r.acf").as("acf"))
  }

  /** Rolling LOCAL TREND per series: the exact ordinary-least-squares
    * slope of daily count vs day over each key's trailing `window`
    * OBSERVED days — the "is this series rising or falling right now"
    * diagnostic a drift monitor thresholds (EWMA answers "is today far
    * from baseline"; this answers "which way is the baseline moving").
    *
    * All five regression moments (count, Σx, Σy, Σxy, Σx²; x = epoch
    * day, y = daily count) are BIGINT sums over ONE key-partitioned
    * ROWS-frame window; slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is
    * computed in double only AFTER the exact sums — one IEEE division
    * of two exact integers, correctly ROUNDed, so both engines emit
    * identical bits. A window with fewer than 2 observed days has no
    * slope (NULL; the denominator is 0 exactly when n ≤ 1 since
    * observed day_idx are distinct). mean_level = ROUND(Σy/n, 6) rides
    * along as the window's level.
    *
    * Scale shape: corpus → (key, day) counts in one map-combinable
    * aggregate, then one window sort per key over ≤366 rows/key/year —
    * identical to [[ewmaDaily]]. BIGINT bounds: x ≈ 2·10⁴ epoch days,
    * so Σxy stays exact for daily counts up to ~10¹⁴ per key; beyond
    * that widen the moment sums to decimal(38,0).
    */
  def rollingTrend(events: DataFrame, tsCol: String, keyCol: String,
      window: Int = 7): DataFrame = {
    require(window >= 2 && window <= 60, "2 <= window <= 60")
    val win = Window.partitionBy(col("k")).orderBy(col("day_idx"))
      .rowsBetween(-(window - 1), Window.currentRow)
    dailyCounts(events, tsCol, keyCol)
      .withColumn("_cnt", count(lit(1)).over(win))
      .withColumn("_sx", sum(col("day_idx")).over(win))
      .withColumn("_sy", sum(col("n")).over(win))
      .withColumn("_sxy", sum(col("day_idx") * col("n")).over(win))
      .withColumn("_sxx", sum(col("day_idx") * col("day_idx")).over(win))
      .select(col("k"), col("day_idx"), col("n"),
        col("_cnt").as("n_obs"),
        when(col("_cnt") * col("_sxx") - col("_sx") * col("_sx") > 0,
          round((col("_cnt") * col("_sxy") - col("_sx") * col("_sy"))
            .cast("double") /
            (col("_cnt") * col("_sxx") - col("_sx") * col("_sx"))
              .cast("double"), 6)).as("slope"),
        round(col("_sy").cast("double") / col("_cnt").cast("double"), 6)
          .as("mean_level"))
  }
}
