package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks as primitives, built by composition
  * (build-prompt preference (a): compose existing ops when semantics
  * allow — no custom SparkPlan needed for either).
  */
object Joins {

  /** Backward as-of join: attach to each left row the latest right row
    * with rightTime <= leftTime, per key (inclusive, like DuckDB's
    * `ASOF JOIN ... ON l.t >= r.t`).
    *
    * Composition: union both sides tagged, one window per key ordered
    * by (time, right-before-left-at-ties), carry the last-seen right
    * payload forward, keep left rows. ONE shuffle on the key — no
    * inequality join, no per-row scan of the right side; at 100 TB
    * this is a sort within key partitions, which is what a native
    * as-of operator would do anyway.
    *
    * Output: all left columns + the right payload columns (null when
    * no right row precedes the left row).
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq

    // The whole right payload travels as ONE struct ("_r"): the struct
    // is non-null for every right row even when individual payload
    // fields are null, so last(_, ignoreNulls) attaches the LATEST
    // right row — carrying bare payload columns would skip a right row
    // whose payload value is legitimately NULL and resurrect a stale
    // older value.
    val taggedRight = right.select(
      (Seq(col(keyCol), col(timeCol).as("_t"), lit(1).as("_is_right")) ++
        leftCols.filterNot(c => c == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("_r")): _*)
    val rStructType = taggedRight.schema("_r").dataType
    val taggedLeft = left.select(
      (Seq(col(keyCol), col(timeCol).as("_t"), lit(0).as("_is_right")) ++
        leftCols.filterNot(c => c == keyCol).map(col) :+
        lit(null).cast(rStructType).as("_r")): _*)

    // right rows sort before left rows at equal timestamps → inclusive
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_t"), col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .select((Seq(col(keyCol), col("_t"), col("_is_right")) ++
        leftCols.filterNot(c => c == keyCol).map(col) :+
        last(col("_r"), ignoreNulls = true).over(w).as("_r")): _*)

    carried.filter(col("_is_right") === 0)
      .select((leftCols.map {
        case c if c == timeCol => col("_t").as(timeCol)
        case c => col(c)
      } ++ rightPayload.map(c => col(s"_r.$c").as(s"asof_$c"))): _*)
  }

  /** Point-in-range join: pairs (point, range) with lo <= point <= hi.
    *
    * A naive inequality join plans as BroadcastNestedLoopJoin — O(n·m).
    * Binning makes it an equi-join: every range explodes to the bins it
    * covers, every point maps to its single bin, join on bin, verify
    * the exact predicate. Each matching pair appears exactly once (a
    * point lives in one bin), so no dedup. Choose binWidth near the
    * typical range width: ranges explode to O(width/binWidth) rows.
    */
  def pointInRangeJoin(points: DataFrame, ranges: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedPoints = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val binnedRanges = ranges
      .withColumn("_bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    binnedPoints.join(binnedRanges, "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Interval-overlap join: pairs of intervals ([lo1,hi1], [lo2,hi2])
    * that INTERSECT (inclusive bounds), optionally under equi-`keys`
    * (the realistic shape: overlapping sessions PER USER, concurrent
    * spans PER resource). The naive inequality join is a nested loop;
    * binning turns it into an equi-join on (keys, bin) with both sides
    * exploded to their covered bins. Unlike [[pointInRangeJoin]], an
    * overlapping pair can share SEVERAL bins — the exactly-once trick
    * is to keep a pair only in the FIRST bin both intervals cover,
    * `floor(max(lo1,lo2)/binWidth)`, a pure per-row predicate: no
    * `distinct`, no shuffle beyond the one equi-join. Explosion factor
    * is O(interval width / binWidth) per row; pick binWidth near the
    * typical width. Both sides are renamed with `l_`/`r_` prefixes in
    * the output (self-join safe).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      loCol: String, hiCol: String, binWidth: Long,
      keys: Seq[String]): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // unkeyed binning would make `_bin` the SOLE join key: every row of
    // a time slice lands in one shuffle partition — a skew degenerate at
    // scale. The contract is keyed overlap (per user / per resource);
    // for a genuinely global overlap join, bin against a composite key
    // family or use a range-join strategy instead of this operator.
    require(keys.nonEmpty,
      "intervalOverlapJoin requires >= 1 equi-key: with keys = Nil the " +
        "bin becomes the only join key and hot bins degenerate to " +
        "single-partition shuffles at scale")
    def binned(df: DataFrame, prefix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df) { (d, c) =>
        if (keys.contains(c)) d else d.withColumnRenamed(c, s"$prefix$c")
      }
      renamed.withColumn("_bin", explode(sequence(
        floor(col(s"$prefix$loCol") / binWidth).cast("long"),
        floor(col(s"$prefix$hiCol") / binWidth).cast("long"))))
    }
    binned(left, "l_").join(binned(right, "r_"),
        keys :+ "_bin")
      .filter(col(s"l_$loCol") <= col(s"r_$hiCol") &&
        col(s"r_$loCol") <= col(s"l_$hiCol"))
      .filter(col("_bin") ===
        floor(greatest(col(s"l_$loCol"), col(s"r_$loCol")) / binWidth)
          .cast("long"))
      .drop("_bin")
  }

  /** Coalesce overlapping-or-touching intervals per key into maximal
    * disjoint spans, reporting per key the span count and total
    * covered length Σ(span_hi − span_lo). The interval variant of
    * gaps-and-islands: per key, sorted by (lo, hi), an interval opens
    * a new span iff its lo exceeds the running max hi of everything
    * before it; the span id is the running count of such opens. All
    * windows are PARTITIONED by the key (per-key interval counts are
    * bounded; key cardinality carries the parallelism), integers in,
    * integers out — engine-replayable exactly.
    */
  def coalesceIntervals(df: DataFrame, keys: Seq[String], loCol: String,
      hiCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kcols = keys.map(col)
    val w = Window.partitionBy(kcols: _*)
      .orderBy(col(loCol), col(hiCol))
    val prevMax = max(col(hiCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val spans = df
      .withColumn("_open",
        when(col(loCol) > coalesce(prevMax, lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("_span", sum(col("_open"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((kcols :+ col("_span")): _*)
      .agg(min(col(loCol)).as("_slo"), max(col(hiCol)).as("_shi"))
    spans.groupBy(kcols: _*)
      .agg(count(lit(1)).as("n_spans"),
        sum(col("_shi") - col("_slo")).as("covered"))
  }
}
