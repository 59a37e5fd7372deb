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

  /** (id, source, hex, w, c) token-count frame: one row per distinct
    * (doc, token) with its count, plus the doc's md5 split digit —
    * the one corpus-scale shuffle every consumer shares.
    */
  private def tokenCounts(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, salt: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        col(srcCol).as("source"), coalesce(col(textCol), lit("")).as("text"))
      .withColumn("hex",
        substring(md5(concat_ws(":", lit(salt), col("id"))), 1, 1))
      .select(col("id"), col("source"), col("hex"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("id"), col("source"), col("hex"), col("w"))
      .agg(count(lit(1)).as("c"))

  /** (id, pred_source) for every test doc that shares ≥1 token with a
    * centroid: cos = BIGINT dot / (sqrt·sqrt of BIGINT norms), argmax
    * under the total order (cos DESC, source ASC).
    */
  private def predictions(train: DataFrame, test: DataFrame): DataFrame =
    predictionsFromCentroids(
      train.groupBy(col("source").as("s"), col("w")).agg(sum(col("c")).as("sc")),
      test)

  /** [[predictions]] from a PRE-BUILT (s, w, sc) centroid table — the
    * stored-model form (centroid norms re-derive from the model table
    * itself, a model-sized aggregate).
    */
  private def predictionsFromCentroids(cen: DataFrame, test: DataFrame): DataFrame = {
    val sn = cen.groupBy(col("s")).agg(sum(col("sc") * col("sc")).as("n2"))
    val dn = test.groupBy(col("id")).agg(sum(col("c") * col("c")).as("d2"))
    val dot = test.join(cen, Seq("w"))
      .groupBy(col("id"), col("s"))
      .agg(sum(col("c") * col("sc")).as("dp"))
    val sim = dot.join(dn, Seq("id")).join(broadcast(sn), Seq("s"))
      .withColumn("cos", col("dp").cast("double") /
        (sqrt(col("d2").cast("double")) * sqrt(col("n2").cast("double"))))
    val w = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("s"))
    sim.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("id"), col("s").as("pred_source"))
  }

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
    val tw = tokenCounts(docs, idCol, srcCol, textCol, salt)
      .persist(MEMORY_AND_DISK)
    val pred = predictions(tw.filter(col("hex") < trainHexLt),
      tw.filter(col("hex") >= trainHexLt).select(col("id"), col("w"), col("c")))
    confusionOf(docs, idCol, srcCol, salt, trainHexLt, pred)
  }

  /** The (s, w, sc) centroid model table for the `trainHexLt` train
    * split — the write-once training artifact
    * [[centroidConfusionFromCentroids]] scores against.
    */
  def trainCentroids(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, salt: String = "cls",
      trainHexLt: String = "c"): DataFrame =
    tokenCounts(docs, idCol, srcCol, textCol, salt)
      .filter(col("hex") < trainHexLt)
      .groupBy(col("source").as("s"), col("w"))
      .agg(sum(col("c")).as("sc"))

  /** [[centroidConfusion]] scoring a PRE-TRAINED centroid table — the
    * train-once / score-many serving shape: the timed work is
    * tokenizing the held-out split, the dot-product join against the
    * stored model, and the confusion rollup. Bit-identical output to
    * [[centroidConfusion]] when `centroids` was built by
    * [[trainCentroids]] with the same salt and split.
    */
  def centroidConfusionFromCentroids(docs: DataFrame, idCol: String,
      srcCol: String, textCol: String, centroids: DataFrame,
      salt: String = "cls", trainHexLt: String = "c"): DataFrame = {
    val test = tokenCounts(docs, idCol, srcCol, textCol, salt)
      .filter(col("hex") >= trainHexLt)
      .select(col("id"), col("w"), col("c"))
    confusionOf(docs, idCol, srcCol, salt, trainHexLt,
      predictionsFromCentroids(centroids, test))
  }

  /** Held-out confusion rollup shared by both entry points. */
  private def confusionOf(docs: DataFrame, idCol: String, srcCol: String,
      salt: String, trainHexLt: String, pred: DataFrame): DataFrame =
    docs.select(col(idCol).cast("long").as("id"), col(srcCol).as("source"))
      .withColumn("hex",
        substring(md5(concat_ws(":", lit(salt), col("id"))), 1, 1))
      .filter(col("hex") >= trainHexLt)
      .join(pred, Seq("id"), "left")
      .groupBy(col("source").as("true_source"),
        coalesce(col("pred_source"), lit("none")).as("pred_source"))
      .agg(count(lit(1)).as("n_docs"))

  /** Learning curve for the centroid classifier: accuracy on one FIXED
    * held-out set (split digit ≥ 'c', never trained on) as the train
    * fraction grows through nested md5 prefixes (< '4' ≈ 25%,
    * < '8' ≈ 50%, < 'c' ≈ 75%) — the data-scaling diagnostic that says
    * whether labeling more docs is still buying anything. Nested
    * splits mean each curve point reuses the same persisted
    * token-count frame; coverage (fraction of test docs scoring any
    * centroid) is reported next to accuracy because with a tiny train
    * slice 'none' predictions, not mistakes, dominate the error.
    */
  def learningCurve(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, salt: String = "cls",
      points: Seq[(String, String)] = Seq(
        ("train25", "4"), ("train50", "8"), ("train75", "c"))): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    require(points.nonEmpty, "need at least one curve point")
    val tw = tokenCounts(docs, idCol, srcCol, textCol, salt)
      .persist(MEMORY_AND_DISK)
    val test = tw.filter(col("hex") >= "c")
      .select(col("id"), col("w"), col("c")).persist(MEMORY_AND_DISK)
    val labels = docs
      .select(col(idCol).cast("long").as("id"), col(srcCol).as("source"))
      .withColumn("hex",
        substring(md5(concat_ws(":", lit(salt), col("id"))), 1, 1))
      .filter(col("hex") >= "c")
      .select(col("id"), col("source"))
    points.map { case (label, t) =>
      val pred = predictions(tw.filter(col("hex") < t), test)
      labels.join(pred, Seq("id"), "left")
        .agg(count(lit(1)).as("n_test"),
          sum(col("pred_source").isNotNull.cast("long")).as("n_predicted"),
          sum((col("pred_source") <=> col("source")).cast("long"))
            .as("n_correct"))
        .select(lit(label).as("train_frac"), col("n_test"),
          col("n_predicted"), col("n_correct"),
          round(col("n_correct").cast("double") /
            col("n_test").cast("double"), 6).as("accuracy"),
          round(col("n_predicted").cast("double") /
            col("n_test").cast("double"), 6).as("coverage"))
    }.reduce(_.unionByName(_))
  }
}
