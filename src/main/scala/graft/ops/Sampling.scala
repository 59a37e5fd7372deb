package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Everything keys off a hash of a stable id — NOT `rand()` — so splits
  * are reproducible across runs, machines, and cluster sizes, and a
  * document's split assignment never changes when the corpus grows
  * (the property training pipelines need to avoid test-set leakage
  * between dataset versions).
  */
object Sampling {

  /** Per-source sampling plan against a token budget: given an INTEGER
    * mixture weight per source (`weightExpr`, evaluated against the
    * per-source aggregate row) and a total token budget, compute each
    * source's target tokens — `budget * w DIV sum(w)`, exact integer
    * arithmetic so any engine reproduces it bit-for-bit — plus the
    * sampling rate (< 1 = downsample), epoch count (> 1 = the source
    * must repeat to fill its share, the multi-epoch regime of
    * under-resourced sources in LLM mixtures) and the unfillable
    * deficit beyond `maxEpochs`.
    *
    * Scale shape: ONE corpus scan (groupBy source + token sum); the
    * plan math runs on the sources-sized frame against a broadcast
    * one-row total. Nothing else touches corpus rows.
    */
  def tokenBudgetPlan(df: DataFrame, srcCol: String, textCol: String,
      weightExpr: Column, budgetTokens: Long, maxEpochs: Double = 4.0): DataFrame = {
    require(budgetTokens > 0, "need budgetTokens > 0")
    require(maxEpochs > 0, "need maxEpochs > 0")
    val per = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("avail_tokens"))
      .withColumn("weight", weightExpr.cast("long"))
    val tot = per.agg(sum(col("weight")).as("_w_total"))
    per.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        expr(s"${budgetTokens}L * weight DIV _w_total"))
      .withColumn("sample_rate",
        round(least(lit(1.0), col("target_tokens").cast("double") /
          col("avail_tokens").cast("double")), 6))
      .withColumn("epochs",
        round(least(lit(maxEpochs), col("target_tokens").cast("double") /
          col("avail_tokens").cast("double")), 6))
      .withColumn("deficit_tokens",
        greatest(lit(0L), col("target_tokens") -
          expr(s"CAST(floor(avail_tokens * ${maxEpochs}d) AS BIGINT)")))
      .drop("_w_total")
  }

  /** Stable per-row bucket in [0, buckets): pmod(xxhash64(id, salt)). */
  def hashBucket(id: Column, buckets: Int, salt: Int = 0): Column =
    pmod(xxhash64(id, lit(salt)), lit(buckets)).cast("int")

  /** Deterministic train/test split: rows whose hash bucket falls below
    * `trainPct` go to train. Returns (train, test).
    */
  def trainTestSplit(df: DataFrame, idCol: String, trainPct: Int,
      salt: Int = 0): (DataFrame, DataFrame) = {
    require(trainPct > 0 && trainPct < 100, "trainPct in (0,100)")
    val b = hashBucket(col(idCol), 100, salt)
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }

  /** md5-based train/test split: same stability guarantees as
    * `trainTestSplit`, but the bucket is the first byte of
    * md5(id-as-string) — recomputable in any engine with an md5
    * function, so an independent system can verify the exact split
    * membership (xxhash64 is Spark-specific). Granularity is 1/256:
    * `trainPct`=80 keeps floor(256*0.80)=204 buckets ≈ 79.7%.
    */
  def md5TrainTestSplit(df: DataFrame, idCol: String, trainPct: Int): (DataFrame, DataFrame) = {
    require(trainPct > 0 && trainPct < 100, "trainPct in (0,100)")
    val thr = f"${(256 * trainPct) / 100}%02x"
    val b = substring(md5(col(idCol).cast("string").cast("binary")), 1, 2)
    (df.filter(b < lit(thr)), df.filter(b >= lit(thr)))
  }

  /** Multi-way deterministic split label (e.g. train/val/test) from md5
    * bucket thresholds: cumulative percentages map to first-byte hex
    * boundaries, so ANY engine with md5 recomputes the exact assignment
    * ([[md5TrainTestSplit]] generalized past two ways). Percentages must
    * sum to 100; granularity is 1/256 per boundary.
    */
  def md5SplitLabel(id: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.size >= 2 && splits.forall(_._2 > 0) && splits.map(_._2).sum == 100,
      s"need >=2 positive percentages summing to 100, got $splits")
    val b = substring(md5(id.cast("string").cast("binary")), 1, 2)
    val cum = splits.init.scanLeft(0)(_ + _._2).tail
    val cases = splits.init.zip(cum).map { case ((name, _), c) =>
      (name, f"${(256 * c) / 100}%02x")
    }
    cases.tail.foldLeft(when(b < lit(cases.head._2), cases.head._1)) {
      case (acc, (name, thr)) => acc.when(b < lit(thr), name)
    }.otherwise(splits.last._1)
  }

  /** Deterministic per-stratum downsampling: keep ~fraction of each
    * stratum, chosen by id hash (reproducible, unlike sampleBy's RNG).
    * Fractions are per stratum value; absent strata keep everything.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], salt: Int = 0): DataFrame = {
    val b = pmod(xxhash64(col(idCol), lit(salt)), lit(10000)).cast("double") / 10000.0
    val keepExpr = fractions.foldLeft(lit(true)) { case (acc, (stratum, frac)) =>
      when(col(stratumCol) === stratum, b < frac).otherwise(acc)
    }
    df.filter(keepExpr)
  }

  /** Exact-quota deterministic per-stratum sample: EXACTLY
    * min(quota, |stratum|) rows per stratum — the eval-set/benchmark
    * construction rule, where a rate-based sample's ±binomial noise is
    * unacceptable. Selection order is md5(id) (then id, making ties
    * impossible and the full order total), so any engine recomputes
    * the exact membership and re-running on the same corpus is stable;
    * unlike [[stratifiedSample]]'s fixed hash threshold, adding corpus
    * rows CAN displace earlier picks — that is inherent to exact
    * quotas, and the md5 order makes the displacement deterministic.
    *
    * Plan: one hash shuffle on the stratum, per-stratum rank, filter —
    * Catalyst compiles the rank+filter to WindowGroupLimit, so each
    * partition keeps a quota-bounded heap instead of sorting the
    * stratum.
    */
  def quotaSample(df: DataFrame, idCol: String, stratumCol: String,
      quota: Int): DataFrame = {
    require(quota >= 1, "quota >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    // `_quota_rk` (1..quota, the selection rank) is part of the output
    // contract; the underscored name keeps it from colliding with (and
    // silently overwriting) an input column
    df.withColumn("_quota_rk", row_number().over(w))
      .filter(col("_quota_rk") <= quota)
  }

  /** Temperature-based mixture sampling (the GPT-3/PaLM data-mixture
    * rule): source s is kept at a rate making its share of the output
    * proportional to n_s^alpha — alpha < 1 upweights rare sources,
    * alpha = 1 is plain uniform downsampling to `targetFraction`.
    * rate_s = n_s^alpha / Σ n^alpha × N × targetFraction / n_s,
    * capped at 1 (a rare source whose quota exceeds its size keeps
    * everything; the output is then slightly under target — the
    * standard behavior).
    *
    * Fully in-plan and cross-engine deterministic: per-source counts
    * are a tiny map-combinable aggregate, rates broadcast back, and
    * membership is an md5-prefix threshold (16-bit granularity via the
    * first 4 hex chars) — no RNG state, no collect, and the corpus is
    * never shuffled: the plan is scan → broadcast-join → filter, so a
    * 100 TB mixture job is two scans of the fact (one count, one
    * filter) and nothing else.
    */
  def temperatureSample(df: DataFrame, idCol: String, srcCol: String,
      alpha: Double, targetFraction: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha out of (0,1]")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction $targetFraction out of (0,1]")
    // persist: this source-cardinality-sized frame is read by the
    // total aggregate AND the rates build — without the cache each
    // broadcast subtree re-evaluates it, i.e. re-scans the corpus,
    // making the job 3 fact scans instead of the 2 documented above
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("_n_src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tots = counts.agg(
      sum(col("_n_src")).cast("double").as("_n_total"),
      sum(pow(col("_n_src").cast("double"), lit(alpha))).as("_w_total"))
    val rates = counts.crossJoin(broadcast(tots))
      .withColumn("_rate",
        pow(col("_n_src").cast("double"), lit(alpha)) / col("_w_total") *
          col("_n_total") * lit(targetFraction) / col("_n_src").cast("double"))
      .select(col(srcCol), col("_rate"))
    // membership: first 16 bits of md5(id) vs the rate as a 4-hex-digit
    // threshold — lowercase-hex string compare ≡ numeric compare, and
    // any engine with md5 recomputes the sample. Near-exact, not
    // absolute (r7 advice): pow/ulp drift between engines cannot move
    // a doc's md5 hash, but when rate*65536 lands within an ulp of an
    // integer the floor itself can flip by 1, shifting the 16-bit
    // threshold for that whole source — probability ~2^-40 per source
    // for independent drift, zero when both engines' pow agree
    // bit-for-bit (they do on every tested SF).
    val thr = lpad(lower(hex(floor(col("_rate") * 65536).cast("long"))), 4, "0")
    val u = substring(md5(col(idCol).cast("string").cast("binary")), 1, 4)
    df.join(broadcast(rates), Seq(srcCol))
      .filter(col("_rate") >= 1.0 || u < thr)
      .drop("_rate")
  }

  /** DSIR-flavored importance scoring (Xie et al. 2023's hashed-n-gram
    * shape): score every document by how target-like its token
    * distribution is, using hashed unigram buckets, Laplace-smoothed
    * target/background bucket ratios, and a per-doc count-weighted sum.
    * Data selection then keeps the top-scoring documents.
    *
    * Determinism: the classic formulation sums log-likelihood ratios,
    * but `ln` is not correctly rounded and drifts across engines, so
    * the ratio is quantized to an exact integer first —
    * floor((p_b / q_b) * scale) with p/q built from exact integer
    * counts via IEEE-exact divides — and the per-doc score is then an
    * INTEGER sum, immune to aggregation order. (Monotone per bucket;
    * linear-space rather than log-space weighting, documented, not
    * hidden.) Same floor-grid caveat as [[temperatureSample]].
    *
    * Plan shape: one token explode feeding both the bucket-stats
    * aggregate (`buckets` rows) and the per-doc bucket counts; the
    * ratio table broadcasts; the only corpus-scale shuffles key on
    * (doc, bucket). The corpus itself is scanned, never collected.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256, scale: Long = 1000L): DataFrame = {
    val tok = df.select(col(idCol).as("id"), isTarget.as("is_t"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      // the 60-bit md5 hash contract lives in ONE place (oracles mirror
      // it byte-for-byte); concat_ws over a single column is identity
      .withColumn("b", Profile.contentHash60(col("w")) % buckets)
    val stats = tok.groupBy(col("b")).agg(
      sum(when(col("is_t"), lit(1L)).otherwise(lit(0L))).as("tcnt"),
      count(lit(1)).as("bcnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tots = stats.agg(sum(col("tcnt")).as("ttot"), sum(col("bcnt")).as("btot"))
    val pT = (col("tcnt") + lit(1L)).cast("double") /
      (col("ttot").cast("double") + lit(buckets.toDouble))
    val pB = (col("bcnt") + lit(1L)).cast("double") /
      (col("btot").cast("double") + lit(buckets.toDouble))
    val ratio = stats.crossJoin(broadcast(tots))
      .select(col("b"), floor(pT / pB * lit(scale.toDouble)).cast("long").as("r"))
    val perDoc = tok.groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
      .join(broadcast(ratio), Seq("b"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_tokens"), sum(col("c") * col("r")).as("score"))
    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Curriculum difficulty bucketing: assign every document a
    * difficulty bucket 1..n WITHIN its source by ascending token count
    * (ties by id — total order, so the cut is deterministic), the
    * standard length-based curriculum a trainer consumes easiest-first.
    * Per-source (not global) because sources have different length
    * regimes — a global cut would put all of one source in the hard
    * buckets. NTILE gives equal-sized buckets (earlier buckets take the
    * remainder), the property curriculum schedules assume.
    *
    * Scale shape: one hash shuffle on source + a per-source window
    * sort — the q_shard_plan shape; no global sort, no joins.
    */
  def curriculumBuckets(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_tokens"), col("id"))
    df.select(col(idCol).as("id"), col(srcCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("bucket", ntile(buckets).over(w).cast("long"))
  }

  /** Epoch-deterministic training order: every document gets a
    * (shard, pos) assignment for the given epoch — the materialized
    * "global shuffle" a trainer consumes as N shard files read
    * sequentially. Both coordinates derive from md5(epoch salt ++ id),
    * so the order is reproducible on any engine and any cluster size,
    * changes completely between epochs, and a grown corpus never
    * reorders the surviving documents of a shard (hash order is
    * insertion-stable, unlike rand() or zipWithIndex).
    *
    * Scale shape: NO global sort — a total order over 100 TB would
    * funnel through a single range-partitioned sort. Instead the hash
    * bucketing IS the shard split (one shuffle on `shard`), and the
    * within-shard ordinal is a per-shard window sort over corpus/nShards
    * rows. Ties in the 60-bit ord key are broken by id, so the result
    * is a total order even under hash collisions.
    */
  def epochShards(df: DataFrame, idCol: String, epoch: Int,
      nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Profile.contentHash60(
      concat(lit(s"epoch${epoch}:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col("id"))
    df.select(col(idCol).as("id"), ord.as("ord"))
      .withColumn("shard", (col("ord") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select(col("id"), col("shard"), col("pos"))
  }

  /** Largest-remainder (Hamilton) token-budget allocation: where
    * [[tokenBudgetPlan]]'s floor division leaves up to |sources|−1
    * tokens of the budget unassigned, this apportions them — source i
    * gets base_i = ⌊B·w_i/W⌋ plus one extra token iff its remainder
    * B·w_i mod W ranks among the top (B − Σ base) under the total
    * order (remainder DESC, source ASC). Σ target_tokens == B exactly,
    * every step is BIGINT arithmetic, and the ranking is replayable by
    * any engine — the property a budget contract needs and a float
    * proportional split cannot give.
    *
    * Scale shape: ONE corpus scan (source token sums); everything
    * after runs on the sources-sized frame (window over |sources|
    * rows). B·w_i must fit a long.
    */
  def tokenBudgetExact(df: DataFrame, srcCol: String, textCol: String,
      weightExpr: Column, budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens > 0, "need budgetTokens > 0")
    val per = df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("avail_tokens"))
      .withColumn("weight", weightExpr.cast("long"))
    // fail fast in-plan: a zero/negative weight total (e.g. fractional
    // weightExpr truncated to 0 by the long cast) would otherwise
    // yield silent NULL targets, violating Σ target_tokens == budget
    val tot = per.agg(sum(col("weight")).as("_w_total"))
      .withColumn("_w_total", when(col("_w_total") > 0, col("_w_total"))
        .otherwise(raise_error(concat(
          lit("tokenBudgetExact: weight total must be positive, got "),
          col("_w_total").cast("string")))))
    val based = per.crossJoin(broadcast(tot))
      .withColumn("base_tokens",
        expr(s"${budgetTokens}L * weight DIV _w_total"))
      .withColumn("remainder",
        expr(s"${budgetTokens}L * weight % _w_total"))
    val wRank = Window.orderBy(col("remainder").desc, col("source"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    based
      .withColumn("_rk", row_number().over(wRank).cast("long"))
      .withColumn("_short",
        lit(budgetTokens) - sum(col("base_tokens")).over(wAll))
      .withColumn("extra", (col("_rk") <= col("_short")).cast("long"))
      .select(col("source"), col("n_docs"), col("avail_tokens"),
        col("weight"), col("base_tokens"), col("remainder"), col("extra"),
        (col("base_tokens") + col("extra")).as("target_tokens"))
  }
}
