package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pre-training: documents are concatenated in a
  * deterministic order and cut into fixed-size token sequences (the
  * standard concat-then-chunk batching; documents may straddle a
  * boundary). Each document gets the sequence id and offset where its
  * first token lands.
  *
  * The global exclusive prefix sum of token counts is computed as a
  * two-level scan — the distributed prefix-sum shape, not a global
  * `Window.orderBy` (which would funnel the corpus through ONE task):
  * level 1 is a per-block running sum (parallel across blocks), level
  * 2 carries block totals forward with a window over the block-total
  * frame, which is `blockSize`× smaller than the corpus. At 10^9+
  * documents the same construction recurses once more on the block
  * frame; one extra level per 1000× of scale.
  */
object Packing {

  /** (idCol, n_tokens, seq_id, seq_offset) for concat-then-chunk
    * packing of `textCol` into `seqTokens`-token sequences, ordered by
    * `idCol`. `blockSize` is the level-1 fan-in of the prefix scan.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      seqTokens: Int = 512, blockSize: Int = 1000): DataFrame = {
    require(seqTokens > 0 && blockSize > 0, "need positive seqTokens/blockSize")
    val d = df.select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("blk", floor(col("id") / blockSize))
    // level 1: exclusive running sum inside each block (parallel)
    val wInBlk = Window.partitionBy(col("blk")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBlk = d.withColumn("off_in_blk",
      sum(col("n_tokens")).over(wInBlk) - col("n_tokens"))
    // level 2: carry = sum of all prior blocks' totals — a window over
    // the block-total frame only (corpus/blockSize rows)
    val wCarry = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = d.groupBy(col("blk")).agg(sum(col("n_tokens")).as("blk_total"))
      .withColumn("carry", coalesce(sum(col("blk_total")).over(wCarry), lit(0L)))
      .select(col("blk"), col("carry"))
    // plain equi-join on blk (no broadcast hint): the carry frame is
    // corpus/blockSize rows — tiny at bench SF (AQE broadcasts it),
    // but at 10^9 docs it must be allowed to shuffle-join
    inBlk.join(carries, Seq("blk"))
      .withColumn("off", col("carry") + col("off_in_blk"))
      .select(col("id").as(idCol), col("n_tokens"),
        floor(col("off") / seqTokens).cast("long").as("seq_id"),
        (col("off") % seqTokens).as("seq_offset"))
  }
}
