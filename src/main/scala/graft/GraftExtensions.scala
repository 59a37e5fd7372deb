package graft

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the graft native functions
  * available in ANY session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the standard
  * deployment path for a library of custom Catalyst expressions (no
  * per-session registerAll call needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => DotProduct(exprs(0), exprs(1))))
  }
}
