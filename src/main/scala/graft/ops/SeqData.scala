package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-example construction for sequence models over an event
  * log — the step that turns raw interactions into the (history →
  * next item) records a sequential recommender / behavior LM actually
  * trains on. Everything is per-user windows over ONE shuffle on the
  * user key; no self-joins, no collect.
  */
object SeqData {

  /** Next-item-prediction examples: sessions break on a > `gapSec`
    * silence (the [[graft.streaming.Streams.sessionizeBatch]] islands
    * pattern); inside a session every event with at least one
    * predecessor becomes an example whose input is the up-to-
    * `maxHistory` previous items IN ORDER and whose label is the
    * current item. History rides a bounded ROWS frame (the frame cap
    * is what bounds per-row state at 100 TB — an unbounded frame would
    * buffer whole sessions) and is serialized to a comma string so the
    * example is engine-exact under the (epoch-seconds, tie) total
    * order.
    *
    * Also emits `negK` DETERMINISTIC sampled-softmax negatives per
    * example: pseudo-items `md5(u:s:pos:i) mod nItems` — md5-derived,
    * so any engine reproduces the exact sample (the RNG-free analogue
    * of the md5 split/mixture machinery); collisions with the label or
    * history are the training loader's filter, as with any uniform
    * sampler.
    */
  def seqExamples(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, itemExpr: Column, gapSec: Long = 1800,
      maxHistory: Int = 8, negK: Int = 3, nItems: Long = 100): DataFrame = {
    require(maxHistory >= 1 && negK >= 0 && nItems >= 1, "bad params")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("u")).orderBy(col("es"), col("tie"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ws = Window.partitionBy(col("u"), col("session_id"))
      .orderBy(col("es"), col("tie"))
    val hist = ws.rowsBetween(-maxHistory, -1)
    val sessioned = events
      .select(col(userCol).cast("long").as("u"),
        unix_timestamp(col(tsCol)).as("es"), col(tieCol).as("tie"),
        itemExpr.cast("long").as("item"))
      .withColumn("_new",
        when(lag(col("es"), 1).over(w).isNull ||
          col("es") - lag(col("es"), 1).over(w) > gapSec, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new")).over(run))
    // negK=0 → empty string (array() of zero columns is NullType-typed)
    val negs = if (negK == 0) lit("") else array_join(
      array((1 to negK).map { i =>
        pmod(
          conv(substring(md5(concat_ws(":", col("u"), col("session_id"),
            col("pos"), lit(i))), 1, 8), 16, 10).cast("long"),
          lit(nItems))
      }: _*), ",")
    sessioned
      .withColumn("pos", row_number().over(ws))
      .withColumn("history", array_join(collect_list(col("item")).over(hist), ","))
      .filter(col("pos") >= 2)
      .select(col("u").as("user_id"), col("session_id"), col("pos"),
        col("history"), col("item").as("label"), negs.as("negatives"))
  }
}
