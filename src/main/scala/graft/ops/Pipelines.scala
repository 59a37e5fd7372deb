package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation — the composition a training-data
  * pipeline actually runs, built from the individual operators:
  *
  *   quality filter → language filter → exact dedup → near-dedup
  *   (MinHash-LSH candidates + exact-Jaccard verification) →
  *   per-document stats
  *
  * Plan shape at scale: the per-document stages are one pass with no
  * shuffle; exact dedup is one hash aggregation; near-dedup is the
  * banded-LSH equality join plus a candidate-bounded verify join.
  * Nothing here is quadratic in corpus size. The verification step
  * (r7) is what makes the whole pipeline's survivor set reproducible
  * by an external engine: the drop decision is the TRUE
  * distinct-shingle Jaccard against `nearDupThreshold`, not the
  * signature estimate (see Dedup.lshVerifiedPairs).
  */
object Pipelines {

  final case class CorpusConfig(
      minQuality: Double = 0.3,
      keepLangs: Set[String] = Set.empty, // empty = keep all
      nearDupThreshold: Double = 0.6, // TRUE distinct-shingle Jaccard
      minhashK: Int = 64,
      lshBands: Int = 16)

  /** Clean a document corpus; returns the surviving documents with
    * analysis columns attached. Deterministic: survivors of a near-dup
    * cluster are the smallest doc_id (same keep-min rule as exact
    * dedup).
    */
  def prepareCorpus(docs: DataFrame, idCol: String, textCol: String,
      config: CorpusConfig = CorpusConfig()): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)

    // 1+2: quality + language gates — single scan, no shuffle
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityScore(text))
      .withColumn("lang_pred", TextAnalysis.langId(text))
      .filter(col("quality") >= config.minQuality)
      .filter(if (config.keepLangs.isEmpty) lit(true)
        else col("lang_pred").isin(config.keepLangs.toSeq: _*))

    // 3: exact dedup — keep the smallest id per canonical fingerprint.
    // Persisted (it feeds BOTH the LSH signature build and the final
    // anti-join, and its quality/lang expressions are the expensive
    // per-document stage — recomputing them twice measured ~2x the
    // whole pipeline) and consumed through a fresh-attribute LogicalRDD
    // barrier (r17): the barrier stops the quality/lang expression
    // forest from being re-canonicalized at every downstream cache
    // probe — see Dedup.lshVerifiedPairsFromShingles for the
    // materialization rationale.
    val keepExact = org.apache.spark.sql.GraftColumnBridge.freshAttributes(
      scored
        .withColumn("fp", TextAnalysis.fingerprintMd5(text))
        .withColumn("keep_id", min(id).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .filter(id === col("keep_id"))
        .drop("keep_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // 4: near-dedup — drop the larger id of every pair whose exact
    // Jaccard clears the threshold among the LSH candidates
    val dropIds = Dedup.lshVerifiedPairs(keepExact, idCol, textCol,
        k = config.minhashK, bands = config.lshBands,
        threshold = config.nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val deduped = keepExact.join(dropIds, Seq(idCol), "left_anti")

    // 5: stats for downstream selection
    deduped
      .withColumn("n_tokens", TextAnalysis.tokenCount(text))
      .withColumn("n_bpeish_tokens", TextAnalysis.bpeishTokenCount(text))
  }

  /** Corpus-level report of what the pipeline kept/dropped. `after`'s
    * lineage is typically the whole pipeline, so it is read by exactly
    * ONE aggregate action (count and token sum fused) — the r7 review
    * found the earlier two-action form re-executed an unpersisted
    * pipeline end to end per action. `before` is the raw input scan;
    * its count is a second, cheap action.
    */
  def corpusStats(before: DataFrame, after: DataFrame, idCol: String): DataFrame = {
    val spark = before.sparkSession
    import spark.implicits._
    val nBefore = before.count()
    // sum over zero rows is NULL — an all-filtered corpus must report 0
    val row = after.agg(count(lit(1)).as("n"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("tok")).head()
    val (nAfter, tokens) = (row.getLong(0), row.getLong(1))
    Seq((nBefore, nAfter, nBefore - nAfter, tokens))
      .toDF("docs_in", "docs_kept", "docs_dropped", "tokens_kept")
  }

  /** Per-source data card: size, content checksum, and target-affinity
    * in one frame — the catalog entry a corpus registry keeps per
    * source. Composes two oracle-verified operators:
    * [[Profile.corpusFingerprint]] (docs/tokens/xor-checksum) and
    * [[Sampling.importanceWeights]] (per-doc integer importance),
    * rolled up to a per-token affinity — integer sums with ONE final
    * IEEE division, so the whole row is deterministic cross-engine.
    * Both inputs group on the same source key, so the final join is
    * co-partitioned; everything upstream is scan + broadcast.
    */
  def sourceCatalog(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, isTarget: org.apache.spark.sql.Column): DataFrame = {
    val fp = Profile.corpusFingerprint(docs, idCol, textCol, srcCol)
    val imp = Sampling.importanceWeights(docs, idCol, textCol, isTarget)
      .join(docs.select(col(idCol).as("id"), col(srcCol).as("grp")), Seq("id"))
      .groupBy("grp")
      .agg(sum(col("score")).as("_score"), sum(col("n_tokens")).as("_tok"))
      .select(col("grp"),
        when(col("_tok") > 0,
          round(col("_score").cast("double") / col("_tok").cast("double"), 6))
          .otherwise(lit(0.0)).as("affinity_per_token"))
    fp.join(imp, Seq("grp"))
  }
}
