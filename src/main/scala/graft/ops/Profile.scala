package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality / data-versioning operators: whole-table column
  * profiling, order-independent corpus fingerprinting, and snapshot
  * diffing. The reference engine exposes none of this; it belongs to
  * the beyond-reference pipeline layer — at 100 TB you never re-read a
  * corpus to answer "did anything change?", you compare fingerprints,
  * and you gate every ingest behind a profile (null explosions, type
  * drift, cardinality collapse are cheaper to catch in one aggregate
  * than in a failed training run).
  */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** One-pass column profile: for every column, row/null/distinct
    * counts plus min/max (numeric columns as exact doubles, timestamps
    * as epoch micros, strings by binary collation). Exact
    * `count(distinct)` makes Catalyst plan an Expand (input × ncols)
    * before the single shuffle — right for a profile you hash-verify;
    * [[profileApprox]] is the 100 TB variant (one pass, no Expand,
    * HLL++ distinct).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val schema = df.schema
    val aggs = cols.flatMap { c =>
      val dt = schema(c).dataType
      val (minNum, maxNum) = dt match {
        case t if isNumeric(t) =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"))
        case _: TimestampType | _: TimestampNTZType =>
          // NTZ casts to session-tz timestamp first (no shift under the
          // engine's pinned UTC session); epoch micros are exact i64
          (min(unix_micros(col(c).cast("timestamp"))).cast("double"),
            max(unix_micros(col(c).cast("timestamp"))).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minStr, maxStr) = dt match {
        case _: StringType => (min(col(c)), max(col(c)))
        case _ => (lit(null).cast("string"), lit(null).cast("string"))
      }
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        minNum.as(s"__mn_$c"), maxNum.as(s"__mx_$c"),
        minStr.as(s"__ms_$c"), maxStr.as(s"__xs_$c"))
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row into one output row per column
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"),
        lit(schema(c).dataType.simpleString).as("dtype"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
        col(s"__ms_$c").as("min_str"), col(s"__xs_$c").as("max_str"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** The profile a 100 TB table actually gets: the count columns of
    * [[profile]] (col_name, dtype, n_rows, n_null, n_distinct — no
    * min/max columns) with `approx_count_distinct` — single pass, no
    * Expand, mergeable sketches instead of exact distinct shuffles.
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    val schema = df.schema
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        approx_count_distinct(col(c), rsd).as(s"__nd_$c"))
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"),
        lit(schema(c).dataType.simpleString).as("dtype"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** 60-bit content hash both engines can recompute: md5 of the
    * ':'-joined parts, first 15 hex chars parsed base-16. 60 bits keeps
    * the value non-negative in an i64 and leaves xor-combination exact.
    * Shared by the corpus fingerprint, snapshot diff, and the streaming
    * windowed fingerprint.
    */
  def contentHash60(parts: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    conv(substring(md5(concat_ws(":", parts: _*)), 1, 15), 16, 10).cast("long")

  private def docHash(idCol: String, textCol: String) =
    contentHash60(col(idCol).cast("string"), coalesce(col(textCol), lit("")))

  /** Order-independent corpus fingerprint per group: doc count, token
    * count, and the XOR of per-doc content hashes. XOR is commutative/
    * associative and closed over 64 bits, so the fingerprint is
    * independent of partitioning, task order, and merge order — the
    * property that makes it usable as a distributed content checksum
    * (sum would need overflow bookkeeping; float anything would need
    * ordering). One scan, one small shuffle on the group key; two
    * corpora are equal-content iff every (group, fp, n_docs) row
    * matches, up to 2^-60-scale collision odds per group.
    */
  def corpusFingerprint(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        docHash(idCol, textCol).as("h"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        expr("bit_xor(h)").as("fingerprint"))

  /** Incremental fingerprint maintenance: advance a stored
    * [[corpusFingerprint]] frame by a removed/added delta WITHOUT
    * re-scanning the corpus — XOR is its own inverse, so removing a doc
    * is XOR-ing its hash back out, and counts are plain arithmetic.
    * Cost is O(|delta|) + a group-key-sized merge; the 100 TB version
    * audit goes from a full re-scan to the day's churn. An edit is
    * (old row in `removed`) + (new row in `added`). Groups that empty
    * out keep a row with n_docs 0 / fingerprint 0; brand-new groups
    * appear. Output schema = corpusFingerprint, so the result chains
    * into the next day's update — and equals a from-scratch rebuild
    * exactly (the q_fingerprint_update oracle proves it).
    */
  def updateFingerprint(baseFp: DataFrame, removed: DataFrame,
      added: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    def deltaFp(df: DataFrame, sign: Long) =
      df.select(col(groupCol).as("grp"),
          docHash(idCol, textCol).as("h"),
          TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
        .groupBy("grp")
        .agg((count(lit(1)) * sign).as("d_docs"),
          (sum(col("n_tok")) * sign).as("d_tokens"),
          expr("bit_xor(h)").as("d_fp"))
    val delta = deltaFp(removed, -1L).unionByName(deltaFp(added, 1L))
      .groupBy("grp")
      .agg(sum(col("d_docs")).as("d_docs"), sum(col("d_tokens")).as("d_tokens"),
        expr("bit_xor(d_fp)").as("d_fp"))
    baseFp.join(delta, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("d_docs"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("n_tokens"), lit(0L)) + coalesce(col("d_tokens"), lit(0L)))
          .as("n_tokens"),
        expr("coalesce(fingerprint, CAST(0 AS BIGINT)) ^ " +
          "coalesce(d_fp, CAST(0 AS BIGINT))").as("fingerprint"))
  }

  /** Snapshot diff: classify every doc id across two corpus versions as
    * added / removed / changed / unchanged by comparing content hashes,
    * and aggregate counts per group. One co-partitioned full-outer join
    * on the id — the 100 TB shape (both sides shuffle once on the same
    * key; with both snapshots bucketed by id it's shuffle-free).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
                   textCol: String, groupCol: String): DataFrame = {
    def prep(df: DataFrame) =
      df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        docHash(idCol, textCol).as("h"))
    val j = prep(v1).alias("a")
      .join(prep(v2).alias("b"), col("a.id") === col("b.id"), "full_outer")
    val status = when(col("a.id").isNull, "added")
      .when(col("b.id").isNull, "removed")
      .when(col("a.h") === col("b.h"), "unchanged")
      .otherwise("changed")
    j.select(coalesce(col("b.grp"), col("a.grp")).as("grp"),
        status.as("status"))
      .groupBy("grp", "status")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Content-defined chunking (the rsync/backup-dedup boundary rule at
    * token granularity): a token ENDS a chunk when its content hash ≡ 0
    * mod `modulus`, so expected chunk length is `modulus` tokens and —
    * the property that makes CDC the storage-dedup splitter — a
    * boundary depends only on the token itself: inserting text early in
    * a doc cannot shift any later chunk boundary (fixed-size blocks
    * reshift everything; the spec proves the stability property).
    * Returns the corpus-level storage synopsis: chunk counts, distinct
    * chunk counts (cross-doc dedup opportunity), and byte totals
    * before/after chunk dedup.
    *
    * Scale: one explode + a per-DOC ordered window (parallel across
    * docs, no global order), then two hash-keyed aggregates. Chunk
    * identity is md5 of the space-joined tokens, recomputable by any
    * engine.
    */
  def cdcChunkStats(df: DataFrame, idCol: String, textCol: String,
      modulus: Int = 16): DataFrame = {
    val toks = filter(graft.ops.TextAnalysis.tokens(col(textCol)),
      t => length(t) > 0)
    val pos = df.select(col(idCol).as("id"), posexplode(toks))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
      .withColumn("_b",
        (pmod(contentHash60(lit("cdc"), col("tok")), lit(modulus.toLong))
          === 0L).cast("long"))
    // chunk id = boundaries strictly before this token (the boundary
    // token itself closes its chunk)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // consumed by both the total and the distinct aggregate — persist
    // the chunk frame (rows ≈ tokens/modulus) instead of re-running
    // the explode+window lineage per branch
    val chunks = pos
      .withColumn("chunk", coalesce(sum(col("_b")).over(w), lit(0L)))
      .groupBy(col("id"), col("chunk"))
      .agg(count(lit(1)).as("n_toks"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok")), " ")).as("h"),
        (sum(length(col("tok"))) + count(lit(1)) - 1L).as("n_bytes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val per = chunks.agg(count(lit(1)).as("n_chunks"),
      sum(col("n_toks")).as("n_tokens"),
      sum(col("n_bytes")).as("bytes_total"))
    val uniq = chunks.groupBy(col("h"))
      .agg(first(col("n_bytes")).as("n_bytes"))
      .agg(count(lit(1)).as("n_distinct_chunks"),
        sum(col("n_bytes")).as("bytes_unique"))
    per.crossJoin(uniq)
      .select(col("n_chunks"), col("n_distinct_chunks"),
        (col("n_chunks") - col("n_distinct_chunks")).as("n_dup_chunks"),
        col("n_tokens"), col("bytes_total"), col("bytes_unique"),
        round(lit(1.0) - col("bytes_unique").cast("double") /
          col("bytes_total").cast("double"), 6).as("dedup_saving"))
  }

  /** k-anonymity generalization over quasi-identifier columns, with an
    * l-diversity audit on a sensitive column — the release gate applied
    * before person-linked metadata (user tables, document provenance)
    * can ship alongside a training corpus. Equivalence classes (unique
    * QI combinations) with fewer than k rows are SUPPRESSED: their QI
    * values generalize to "*" and their rows merge into one residual
    * class, so no published class isolates fewer than k individuals
    * (the residual class is itself published with its true size).
    * Each class also reports l-diversity — distinct sensitive values —
    * since a k-anonymous class with one sensitive value still leaks it
    * (Machanavajjhala et al., l-diversity).
    *
    * Plan: class sizes are one map-combinable aggregate over the QI
    * key; the tiny class table broadcasts back onto the fact, rows
    * relabel per-row, and ONE re-aggregate over the generalized key
    * produces the release — two fact scans, no shuffle wider than the
    * class cardinality, nothing collected.
    */
  def kAnonymityClasses(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 1, "need QI columns and k >= 1")
    val qi = qiCols.map(c => col(c).cast("string").as(c))
    val sizes = df.select(qi: _*).groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val small = col("_n") < k
    val generalized = df.select((qi :+ col(sensitiveCol).as("_s")): _*)
      .join(broadcast(sizes), qiCols)
      .select((qiCols.map(c =>
        when(small, lit("*")).otherwise(col(c)).as(c)) :+ col("_s")): _*)
    generalized.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("_s")).as("l_diversity"))
      .withColumn("suppressed", col(qiCols.head) === "*")
  }

  /** Exact ROC-AUC per group via the Mann–Whitney rank statistic — the
    * offline-eval number for any scoring filter ("how well does this
    * quality score actually separate junk from clean?"). Ties get the
    * conventional 0.5 credit through average ranks, but the whole
    * computation stays in INTEGER space: collapsing to distinct scores
    * first, AUC = Σ_s np_s·(2·nn_below_s + nn_s) / (2·npos·nneg), where
    * the doubled numerator is an exact BIGINT — one final division, so
    * the rounded AUC is engine-exact.
    *
    * Scale shape: the only corpus-scale exchange is the map-combinable
    * (group, score) count; the running negative count then runs over
    * the distinct-score frame (|scores| ≪ corpus), partitioned by
    * group. Nothing corpus-sized is sorted.
    */
  def rocAuc(df: DataFrame, groupCol: Column, scoreCol: Column,
      labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = df
      .select(groupCol.as("g"), scoreCol.as("s"),
        labelCol.cast("boolean").as("y"))
      .groupBy(col("g"), col("s"))
      .agg(sum(col("y").cast("long")).as("np"),
        sum((!col("y")).cast("long")).as("nn"))
    val w = Window.partitionBy(col("g")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("nn_below", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("g").as("grp"))
      .agg(sum(col("np") + col("nn")).as("n"),
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("nn_below") + col("nn"))).as("_num2"))
      .select(col("grp"), col("n"), col("n_pos"), col("n_neg"),
        // one-class groups have no rankable pairs: AUC undefined → NULL
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("_num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Inter-rater agreement between two deterministic boolean raters
    * (e.g. two quality-filter policies): the 2×2 confusion counts,
    * observed agreement p_o, chance agreement p_e, and Cohen's kappa —
    * the number that says whether two filters agree beyond what their
    * base rates force. One map-combinable aggregate; every output is a
    * ratio of exact integers, so the rounded row is engine-exact.
    * kappa is NULL when p_e = 1 (both raters constant — undefined).
    */
  def raterAgreement(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val a = aCol.cast("boolean")
    val b = bCol.cast("boolean")
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum((a && b).cast("long")).as("n_both_keep"),
      sum((a && !b).cast("long")).as("n_a_only"),
      sum((!a && b).cast("long")).as("n_b_only"),
      sum((!a && !b).cast("long")).as("n_both_drop"))
    val nD = col("n").cast("double")
    val pa = (col("n_both_keep") + col("n_a_only")).cast("double") / nD
    val pb = (col("n_both_keep") + col("n_b_only")).cast("double") / nD
    val po = (col("n_both_keep") + col("n_both_drop")).cast("double") / nD
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    agg.select(col("n"), col("n_both_keep"), col("n_a_only"),
      col("n_b_only"), col("n_both_drop"),
      round(po, 6).as("p_o"), round(pe, 6).as("p_e"),
      when(pe < lit(1.0),
        round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Reliability diagram + expected calibration error of a [0,1] score
    * against boolean ground truth (is the quality score an honest
    * probability, not just a good ranker — the companion number to
    * [[rocAuc]]). The score is lifted onto the integer micro-grid
    * (round(s·10⁶)), so per-bin mean prediction, positive fraction,
    * and the |mean_pred − frac_pos| gap are all ratios of exact BIGINT
    * sums: gap_micro_b = |Σmicro_b − 10⁶·npos_b| is exact, and
    * ECE = Σ_b (n_b/N)·gap_b/n_b = (Σ_b gap_micro_b)/(N·10⁶) needs ONE
    * division — the rounded output is engine-exact by construction,
    * with no float accumulation anywhere.
    *
    * Scale shape: one map-combinable groupBy(bin) over the corpus;
    * everything after runs on the bins-sized frame (broadcast 1-row
    * total). `bins` must divide 10⁶ so bin edges sit on the grid.
    */
  def calibration(df: DataFrame, scoreCol: Column, labelCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0 && 1000000 % bins == 0, "bins must divide 1e6")
    val width = 1000000 / bins
    val micro = round(scoreCol * 1e6).cast("long")
    val bin = least(floor(micro / lit(width.toDouble)).cast("long"),
      lit(bins - 1L))
    val perBin = df
      .select(bin.as("bin"), micro.as("m"),
        labelCol.cast("boolean").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y").cast("long")).as("n_pos"),
        sum(col("m")).as("_sm"))
      .withColumn("gap_micro",
        abs(col("_sm") - lit(1000000L) * col("n_pos")))
    val tot = perBin.agg(sum(col("n_docs")).as("_n_total"),
      sum(col("gap_micro")).as("_gap_total"))
    perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        round(col("_sm").cast("double") / col("n_docs").cast("double") /
          lit(1000000.0), 6).as("mean_pred"),
        round(col("n_pos").cast("double") / col("n_docs").cast("double"), 6)
          .as("frac_pos"),
        col("gap_micro"),
        round(col("_gap_total").cast("double") /
          col("_n_total").cast("double") / lit(1000000.0), 6).as("ece"))
  }

  /** Robust outlier audit via median absolute deviation — the
    * companion to the existing z-score detector that a heavy-tailed
    * value column actually needs (one whale inflates a z-score σ and
    * hides every other outlier; the median and MAD don't move).
    * Flags x where |x − median| > k·MAD with k defaulting to
    * 3·1.4826 ≈ 4.4478 (the normal-consistency constant). Inputs are
    * integer cents, medians are exact R-7 interpolations (.0/.5 —
    * exactly representable), so every flag and count is
    * engine-deterministic with no rounding anywhere.
    *
    * Scale shape: three passes over the persisted (group, cents)
    * projection — median, MAD, flag counts — each a sort-based exact
    * percentile per group; group frames (|groups| rows) broadcast
    * back. The approximate path for scans that can't afford exact
    * percentiles is [[Sketches]]; this is the audit-grade op.
    */
  def madOutliers(df: DataFrame, groupCol: Column, valueCents: Column,
      k: Double = 4.4478): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val v = df.select(groupCol.as("g"), valueCents.cast("long").as("x"))
      .persist(MEMORY_AND_DISK)
    val med = v.groupBy(col("g"))
      .agg(percentile(col("x"), lit(0.5)).as("median_cents"))
    val dev = v.join(broadcast(med), Seq("g"))
      .withColumn("_ad", abs(col("x").cast("double") - col("median_cents")))
    val mad = dev.groupBy(col("g"))
      .agg(percentile(col("_ad"), lit(0.5)).as("mad_cents"))
    dev.join(broadcast(mad), Seq("g"))
      .groupBy(col("g"), col("median_cents"), col("mad_cents"))
      .agg(count(lit(1)).as("n"),
        sum((col("_ad") > lit(k) * col("mad_cents")).cast("long"))
          .as("n_outliers"))
      .select(col("g"), col("n"), col("median_cents"), col("mad_cents"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n").cast("double"), 6)
          .as("outlier_rate"))
  }

  /** Approximate-percentile switch for [[madOutliers]], for scans where
    * the exact per-group percentile's buffer (∝ distinct values per
    * group — fine for day-gaps, risky for cents at 100 TB) is too
    * expensive: median and MAD come from `approx_percentile`'s
    * fixed-memory quantile sketch (rank error ≤ n/accuracy by its
    * merge-order-independent guarantee), and the row carries a
    * bounded-error AUDIT in RANK space — exact counts of values at or
    * below the sketch's output pin it inside the theorem band around
    * rank n/2. The sketch's VALUE may vary with partition merge order;
    * the band booleans may not — so the audit columns (and the exact
    * n / sum_cents) are what an oracle can hash, the
    * [[graft.ops.Sketches]] `q_sketch_distinct` pattern. The approx
    * median/MAD/outlier columns are the operational output.
    */
  def madOutliersApprox(df: DataFrame, groupCol: Column, valueCents: Column,
      k: Double = 4.4478, accuracy: Int = 50): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val v = df.select(groupCol.as("g"), valueCents.cast("long").as("x"))
      .persist(MEMORY_AND_DISK)
    val med = v.groupBy(col("g"))
      .agg(percentile_approx(col("x"), lit(0.5), lit(accuracy))
        .as("approx_median_cents"))
    val dev = v.join(broadcast(med), Seq("g"))
      .withColumn("_ad",
        abs(col("x").cast("double") - col("approx_median_cents").cast("double")))
      .persist(MEMORY_AND_DISK)
    val mad = dev.groupBy(col("g"))
      .agg(percentile_approx(col("_ad"), lit(0.5), lit(accuracy))
        .as("approx_mad_cents"))
    val audit = dev.join(broadcast(mad), Seq("g"))
      .groupBy(col("g"), col("approx_median_cents"), col("approx_mad_cents"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_cents"),
        sum((col("_ad") > lit(k) * col("approx_mad_cents")).cast("long"))
          .as("n_outliers_approx"),
        sum((col("x") <= col("approx_median_cents")).cast("long")).as("_med_le"),
        sum((col("x") < col("approx_median_cents")).cast("long")).as("_med_lt"),
        sum((col("_ad") <= col("approx_mad_cents")).cast("long")).as("_mad_le"),
        sum((col("_ad") < col("approx_mad_cents")).cast("long")).as("_mad_lt"))
    // the returned value's occurrence span is [lt+1, le]; the sketch
    // guarantees an occurrence within ±n/accuracy of rank ⌈n/2⌉ — the
    // +1 absolute slack absorbs the rank-convention off-by-one
    def bandOk(le: Column, lt: Column, n: Column): Column = {
      val target = ceil(n.cast("double") * 0.5)
      val slack = n.cast("double") / accuracy + 1.0
      (le.cast("double") >= target - slack) && (lt.cast("double") <= target + slack)
    }
    audit.select(col("g"), col("n"), col("sum_cents"),
      col("approx_median_cents"), col("approx_mad_cents"),
      col("n_outliers_approx"),
      bandOk(col("_med_le"), col("_med_lt"), col("n")).as("med_rank_ok"),
      bandOk(col("_mad_le"), col("_mad_lt"), col("n")).as("mad_rank_ok"))
  }

  /** One-pass Pearson correlation matrix over integer-cents columns:
    * ALL C(k,2) coefficients from a single corpus scan — per-row
    * products stay in long range, sums go through decimal(38,0) (the
    * Σx² of a 10⁷-cent column over 10⁶ rows overflows a long), and
    * each r is the usual (nΣxy−ΣxΣy)/(√·√) computed in double AFTER
    * the exact sums — both engines convert the same exact integers to
    * the same doubles, so the rounded matrix is engine-exact. NULL
    * where either column is constant.
    */
  def corrMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    // per-row products run in decimal(19,0)×decimal(19,0) →
    // decimal(38,0): exact, and immune to the ANSI long-overflow a
    // large-cents column squared would hit
    val named = cols.map { case (nm, c) =>
      nm -> c.cast("long").cast("decimal(19,0)") }
    val aggs =
      named.flatMap { case (nm, c) =>
        Seq(sum(c).as(s"_s_$nm"), sum(c * c).as(s"_ss_$nm"))
      } ++
      named.combinations(2).toSeq.map { case Seq((na, ca), (nb, cb)) =>
        sum(ca * cb).as(s"_sp_${na}_$nb")
      }
    val g = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val pairs = named.map(_._1).combinations(2).toSeq.map {
      case Seq(na, nb) =>
        val nD = col("_n").cast("double")
        val sx = col(s"_s_$na").cast("double")
        val sy = col(s"_s_$nb").cast("double")
        val sxy = col(s"_sp_${na}_$nb").cast("double")
        val sxx = col(s"_ss_$na").cast("double")
        val syy = col(s"_ss_$nb").cast("double")
        val varX = nD * sxx - sx * sx
        val varY = nD * syy - sy * sy
        struct(lit(na).as("col_a"), lit(nb).as("col_b"),
          col("_n").as("n"),
          when(varX > 0 && varY > 0,
            round((nD * sxy - sx * sy) / (sqrt(varX) * sqrt(varY)), 6))
            .as("corr"))
    }
    g.select(explode(array(pairs: _*)).as("p")).select(col("p.*"))
  }

  /** Quantile-rank (percent-rank) normalization table per group: for
    * every distinct integer value, percent_rank = (#values strictly
    * below)/(n−1) — the rank transform feature engineering applies to
    * heavy-tailed columns before any distance-based model. Computed at
    * DISTINCT-value grain (one corpus-scale count, then a window over
    * the per-group distinct-value frame, |values| ≪ rows), so the
    * lookup table this returns is exactly what a scoring join
    * broadcasts. All ratios of exact BIGINTs; NULL when a group has a
    * single row (undefined).
    */
  def quantileRank(df: DataFrame, groupCol: Column,
      valueCents: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(groupCol.as("g"), valueCents.cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = counts.groupBy(col("g")).agg(sum(col("n")).as("n_total"))
    counts
      .withColumn("n_below", coalesce(sum(col("n")).over(w), lit(0L)))
      .join(tot, Seq("g"))
      .select(col("g"), col("v").as("value_cents"), col("n"),
        when(col("n_total") > 1L,
          round(col("n_below").cast("double") /
            (col("n_total") - 1L).cast("double"), 6)).as("pct_rank"))
  }

  /** Declarative data-expectation audit (the Great-Expectations /
    * dbt-test shape): each row rule is (name, column, violation
    * predicate) — not-null, range, set membership, regex, anything
    * boolean — and ALL of them are counted in ONE map-combinable pass
    * over the table; uniqueness rules add one distinct-aggregate each
    * (n_violations = n_rows − n_distinct, so a NULL key also counts).
    * Returns (rule, col_name, n_checked, n_violations, pass) — the
    * contract table a 100 TB ingest gate publishes per batch.
    * Violation predicates must be null-safe (a NULL predicate row is
    * skipped by the sum, like SQL).
    */
  def expectations(df: DataFrame,
      rowRules: Seq[(String, String, Column)],
      uniqueCols: Seq[String] = Nil): DataFrame = {
    require(rowRules.nonEmpty, "need at least one row rule")
    val agg = df.agg(count(lit(1)).as("_n"),
      rowRules.zipWithIndex.map { case ((_, _, pred), i) =>
        sum(pred.cast("long")).as(s"_v$i")
      }: _*)
    val rowFrame = agg.select(explode(array(
        rowRules.zipWithIndex.map { case ((rule, c, _), i) =>
          struct(lit(rule).as("rule"), lit(c).as("col_name"),
            col("_n").as("n_checked"), col(s"_v$i").as("n_violations"))
        }: _*)).as("r"))
      .select(col("r.*"))
    val uniq = uniqueCols.map { c =>
      df.agg(count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col(c))).as("n_violations"))
        .select(lit("unique").as("rule"), lit(c).as("col_name"),
          col("n_checked"), col("n_violations"))
    }
    (rowFrame +: uniq).reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Benford first-digit probabilities log10(1 + 1/d), fixed to 10 dp
    * so both engines compare against the SAME literal grid.
    */
  val benfordProbs: Seq[(String, Double)] = Seq(
    "1" -> 0.3010299957, "2" -> 0.1760912591, "3" -> 0.1249387366,
    "4" -> 0.0969100130, "5" -> 0.0791812460, "6" -> 0.0669467896,
    "7" -> 0.0579919470, "8" -> 0.0511525224, "9" -> 0.0457574906)

  /** Benford first-digit audit of a positive value column — the
    * classic fabricated-data / unit-mixing smell test. Digits come
    * from exact integer-string extraction (no log10 per row), expected
    * counts multiply the observed total by the fixed 10-dp
    * [[benfordProbs]] grid, and χ² is an ORDERED fold over the 9
    * per-digit contributions (mirrored by DuckDB list_reduce) so every
    * output double is engine-exact. One map-combinable digit count is
    * the only corpus-scale exchange.
    */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val digit = substring(floor(value).cast("long").cast("string"), 1, 1)
    val obs = df.select(digit.as("digit"))
      .filter(col("digit").between("1", "9"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val e = benfordProbs.toDF("digit", "p")
      .join(obs, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    val tot = e.agg(sum(col("n_obs")).as("_nt"))
    val e3 = e.crossJoin(broadcast(tot))
      .withColumn("expected", col("_nt").cast("double") * col("p"))
      .withColumn("contrib",
        (col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) / col("expected"))
    val chi = e3
      .agg(collect_list(struct(col("digit"), col("contrib"))).as("_l"))
      .select(round(aggregate(
        transform(array_sort(col("_l")), x => x.getField("contrib")),
        lit(0.0), (a, x) => a + x), 6).as("chi2"))
    e3.crossJoin(broadcast(chi))
      .select(col("digit"), col("n_obs"), round(col("expected"), 6)
        .as("expected"), round(col("contrib"), 6).as("contrib"), col("chi2"))
  }

  /** Winsorized per-group statistics: values (as integer cents, so
    * every sum is engine-exact) are clipped at the k-th smallest and
    * k-th largest GLOBAL values with k = max(⌈N·tailFrac⌉, 1) — a
    * RANK-based clip, not a percentile-interpolation one, because the
    * k-th order statistic is a value that exists in the data and any
    * engine finds the same one, while interpolated percentiles differ
    * across engines in evaluation order at the ulp. The whale-damping
    * step before a mean/sum is trusted (ad spend, session length),
    * reported per group: row count, clip counts at each tail, and the
    * clipped integer sum.
    *
    * Scale shape: the two order statistics come from
    * [[Layout.orderStats]] (two-level rough-bucket rank — no task
    * holds more than ~1/64 of the column), broadcast back as one row;
    * the clip itself is a per-row expression feeding ONE
    * map-combinable aggregate. Two scans of the fact, zero extra
    * shuffles.
    */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
      tailFrac: Double): DataFrame = {
    require(tailFrac > 0 && tailFrac < 0.5, "tailFrac in (0, 0.5)")
    val cents = round(col(valueCol) * 100).cast("long")
    val keys = df.filter(col(valueCol).isNotNull).select(cents.as("_k"))
    val k = greatest(ceil(col("_N") * tailFrac), lit(1.0)).cast("long")
    val bounds = Layout.orderStats(keys, Seq(k, col("_N") + 1L - k))
      .select(element_at(col("_stats"), 1).as("_lo"),
        element_at(col("_stats"), 2).as("_hi"))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), cents.as("_c"))
      .crossJoin(broadcast(bounds))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum((col("_c") < col("_lo")).cast("long")).as("n_clip_lo"),
        sum((col("_c") > col("_hi")).cast("long")).as("n_clip_hi"),
        sum(greatest(least(col("_c"), col("_hi")), col("_lo")))
          .as("sum_cents_winsor"),
        min(col("_lo")).as("lo_cents"), min(col("_hi")).as("hi_cents"))
  }
}
