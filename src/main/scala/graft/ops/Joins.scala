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
}
