package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 part 4: mixed-language span segmentation building blocks. */
class Round11dSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chunk-grain language ID + islands slice a language-switching doc into spans") {
    // 8 en tokens, then 8 de tokens, then 8 en tokens -> with 4-token
    // chunks: en en de de en en -> three spans
    val text = "the cat of the dog and it is " +
      "der hund und die katze ist nicht ein " +
      "the bird in a tree that it is"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = df.select(col("doc_id"),
        posexplode(TextAnalysis.chunkTokens(col("text"), 4, 0)))
      .select(col("doc_id"), col("pos").cast("long").as("idx"),
        TextAnalysis.langId(col("col")).as("lang"))
    val w = Window.partitionBy(col("doc_id"), col("lang")).orderBy(col("idx"))
    val spans = chunks
      .withColumn("_isl", col("idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("lang"), col("_isl"))
      .agg(min(col("idx")).as("s"), max(col("idx")).as("e"),
        count(lit(1)).as("n"))
      .orderBy(col("s")).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(spans === Seq(
      ("en", 0L, 1L, 2L), ("de", 2L, 3L, 2L), ("en", 4L, 5L, 2L)))
  }

  test("a monolingual doc yields exactly one span") {
    val text = "the cat of the dog and it is that for the a of and to in"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = df.select(col("doc_id"),
        posexplode(TextAnalysis.chunkTokens(col("text"), 4, 0)))
      .select(col("doc_id"), col("pos").cast("long").as("idx"),
        TextAnalysis.langId(col("col")).as("lang"))
    val w = Window.partitionBy(col("doc_id"), col("lang")).orderBy(col("idx"))
    val spans = chunks
      .withColumn("_isl", col("idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("lang"), col("_isl"))
      .agg(count(lit(1)).as("n")).collect()
    assert(spans.length === 1 && spans.head.getString(1) === "en")
  }
}
