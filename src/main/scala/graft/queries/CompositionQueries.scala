package graft.queries

import graft.Tables
import graft.ops.{Pipelines, Sketches}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed operators: the end-to-end corpus-prep pipeline and sketch
  * aggregates. Rows-only in the driver gate (MinHash/HLL aren't
  * ANSI-SQL-reproducible); semantics covered by
  * PipelineCompositionSpec against exact ground truth.
  */
object CompositionQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_corpus" -> ((s, dir) => {
      Pipelines.prepareCorpus(Tables.load(s, dir, "documents"), "doc_id", "text",
          Pipelines.CorpusConfig(minQuality = 0.0, nearDupThreshold = 0.5))
        .select(col("doc_id"), col("lang_pred"), round(col("quality"), 4).as("quality"),
          col("n_tokens"), col("n_bpeish_tokens"))
        .orderBy(col("doc_id"))
    }),
    "q_sketch_distinct" -> ((s, dir) => {
      Sketches.approxDistinctBy(
          Tables.load(s, dir, "orders"), "o_orderpriority", "o_custkey")
        .orderBy(col("o_orderpriority"))
    })
  )

  def oracles: Map[String, String] = Map.empty
}
