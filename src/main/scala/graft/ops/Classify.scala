package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised text classification over the corpus, built so that
  * training AND evaluation are engine-exact: centroids live in integer
  * token-count space, similarities are ratios of exact BIGINT dot
  * products (one IEEE sqrt each — correctly rounded, hence portable),
  * and the argmax is a total order. No float accumulates in any
  * aggregation, so a DuckDB oracle reproduces the confusion matrix
  * bit for bit — the property log-prob naive Bayes cannot give
  * (ln() is not correctly rounded across libms).
  */
object Classify {

  /** Nearest-centroid (Rocchio) source classifier with an honest
    * held-out evaluation: docs are split train/test by salted md5
    * (first hex digit < `trainHexLt` ⇒ train, so 'c' ≈ 75%), each
    * source's centroid is its summed train token-count vector, and
    * every test doc is assigned the source maximizing
    * cos(doc, centroid) = dot/(‖doc‖·‖centroid‖) where dot and both
    * squared norms are exact BIGINT sums. Ties (and docs sharing no
    * token with any centroid → 'none') break on the source name, so
    * the prediction is a total order any engine replays. Returns the
    * confusion matrix (true_source, pred_source, n_docs).
    *
    * Scale shape: the (doc, word) count build is the one corpus-scale
    * shuffle; the dot-product join fans each test word out by at most
    * |sources| (the intrinsic cost of scoring k classes); the argmax
    * compiles to WindowGroupLimit at (doc, source) grain. Centroid
    * counts are BIGINT-safe to ~10^9 occurrences per (source, word);
    * beyond that, downsample the train split — the split knob is
    * already there.
    */
  def centroidConfusion(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, salt: String = "cls",
      trainHexLt: String = "c"): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val d = docs.select(col(idCol).cast("long").as("id"),
        col(srcCol).as("source"), coalesce(col(textCol), lit("")).as("text"))
      .withColumn("is_train",
        substring(md5(concat_ws(":", lit(salt), col("id"))), 1, 1) <
          trainHexLt)
    val tw = d.select(col("id"), col("source"), col("is_train"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("id"), col("source"), col("is_train"), col("w"))
      .agg(count(lit(1)).as("c"))
      .persist(MEMORY_AND_DISK)
    val cen = tw.filter(col("is_train"))
      .groupBy(col("source").as("s"), col("w"))
      .agg(sum(col("c")).as("sc"))
      .persist(MEMORY_AND_DISK)
    val sn = cen.groupBy(col("s")).agg(sum(col("sc") * col("sc")).as("n2"))
    val test = tw.filter(!col("is_train"))
    val dn = test.groupBy(col("id")).agg(sum(col("c") * col("c")).as("d2"))
    val dot = test.join(cen, Seq("w"))
      .groupBy(col("id"), col("s"))
      .agg(sum(col("c") * col("sc")).as("dp"))
    val sim = dot.join(dn, Seq("id")).join(broadcast(sn), Seq("s"))
      .withColumn("cos", col("dp").cast("double") /
        (sqrt(col("d2").cast("double")) * sqrt(col("n2").cast("double"))))
    val w = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("s"))
    val pred = sim.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("id"), col("s").as("pred_source"))
    d.filter(!col("is_train")).select(col("id"), col("source"))
      .join(pred, Seq("id"), "left")
      .groupBy(col("source").as("true_source"),
        coalesce(col("pred_source"), lit("none")).as("pred_source"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
