package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for interactive analytics at corpus scale —
  * constant-memory sketches where exact answers would shuffle the
  * world: HyperLogLog++ distinct counts, t-digest quantiles, and
  * frequent-item detection. All built-ins (codegen'd, mergeable
  * map-side), surfaced with the tolerances documented.
  */
object Sketches {

  /** HLL++ distinct count (relative error rsd, default 5%). */
  def approxDistinct(df: DataFrame, column: String, rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(col(column), rsd).as("approx_distinct"))

  /** Per-group HLL++ distinct counts. */
  def approxDistinctBy(df: DataFrame, groupCol: String, column: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(column), rsd).as("approx_distinct"),
        count(lit(1)).as("n"))

  /** Per-group HLL++ estimate audited against the exact count: emits
    * (group, exact_distinct, n, within_rel_err) where the boolean
    * states |approx − exact| ≤ relErr·exact. The estimate itself stays
    * approximate (and deterministic — HLL++ is hash-based), but the
    * bounded-error CLAIM is exact, so an independent engine that
    * recomputes the exact counts can hash-check the whole row — the
    * driver-oracle form of a sketch guarantee. The exact count rides
    * the same single aggregation (Expand-based distinct rewrite).
    */
  def approxDistinctAudit(df: DataFrame, groupCol: String, column: String,
      rsd: Double = 0.05, relErr: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(column), rsd).as("_approx"),
        countDistinct(col(column)).as("exact_distinct"),
        count(lit(1)).as("n"))
      .select(col(groupCol), col("exact_distinct"), col("n"),
        (abs(col("_approx") - col("exact_distinct")).cast("double") <=
          lit(relErr) * col("exact_distinct").cast("double")).as("within_rel_err"))

  /** Approximate quantiles via percentile_approx (t-digest style;
    * `accuracy` trades memory for error ≤ 1/accuracy).
    */
  def approxQuantiles(df: DataFrame, column: String,
      probabilities: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(column),
      typedlit(probabilities), lit(accuracy)).as("quantiles"))

  /** Items covering more than `support` fraction of rows (count-based
    * heavy hitters via a single aggregation + having).
    */
  def heavyHitters(df: DataFrame, column: String, support: Double = 0.01): DataFrame = {
    val total = df.count()
    df.groupBy(col(column)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(support * total))
      .orderBy(col("n").desc, col(column))
  }

  /** Join-size estimation BEFORE running the join — the planning
    * question every 100 TB shuffle should answer first ("is this
    * self-join 10^9 or 10^14 pairs?"). Two per-key aggregates give the
    * exact output cardinality Σ_k n_a(k)·n_b(k) at the cost of two
    * groupBys + a key-count-sized join — tiny next to materializing
    * the join itself. The bucketed variant collapses each side to
    * `buckets` hash-bucket totals first: O(buckets) state per side (a
    * fixed-size synopsis you can keep per table version), and
    * Σ_bucket n_a·n_b is a guaranteed UPPER bound (keys only collide
    * into buckets, never split). Output is one audit row:
    * (n_join_keys, exact_pairs, bucket_upper, overestimate) — every
    * field deterministic, so the oracle recomputes the whole row.
    */
  def joinCardinalityAudit(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, buckets: Int = 1024): DataFrame = {
    val ca = a.groupBy(col(aKey).as("k")).agg(count(lit(1)).as("na"))
    val cb = b.groupBy(col(bKey).as("k")).agg(count(lit(1)).as("nb"))
    val exact = ca.join(cb, "k")
      .agg(count(lit(1)).as("n_join_keys"),
        sum(col("na") * col("nb")).as("exact_pairs"))
    def bucketed(c: DataFrame, n: String) = c
      .withColumn("_bk", pmod(conv(substring(
        md5(col("k").cast("string")), 1, 15), 16, 10).cast("long"),
        lit(buckets.toLong)))
      .groupBy("_bk").agg(sum(col(n)).as(n))
    val upper = bucketed(ca, "na").join(bucketed(cb, "nb"), "_bk")
      .agg(sum(col("na") * col("nb")).as("bucket_upper"))
    exact.crossJoin(upper)
      .select(col("n_join_keys"), col("exact_pairs"), col("bucket_upper"),
        round(col("bucket_upper").cast("double") /
          col("exact_pairs").cast("double"), 6).as("overestimate"))
  }

  /** The count-min hash of one value for row `d`: the first
    * `widthHexChars` hex chars of md5("d:value") — a STRING bucket id,
    * so width is 16^widthHexChars and the whole sketch is replayable by
    * any engine with md5 (no 64-bit integer-conversion portability
    * games). Depth rows use independent hashes because the depth index
    * is baked into the hashed text.
    */
  private def cmBucket(d: Column, v: Column, widthHexChars: Int): Column =
    substring(md5(concat_ws(":", d, v)), 1, widthHexChars)

  /** Count-min sketch (Cormode & Muthukrishnan 2005) materialized as a
    * (d, bucket, cnt) table: `depth` independent hash rows over a
    * 16^widthHexChars-bucket space. Point-estimate = min over depth of
    * the bucket counts — ≥ the true count always, and within
    * ε·total with probability 1−δ for width ≥ e/ε, depth ≥ ln(1/δ).
    *
    * Scale shape: the corpus FIRST collapses to value grain (the
    * map-combinable word-count shuffle — the only corpus-scale
    * exchange), then fans out ×depth over the tiny distinct-value frame
    * into ≤ depth·width counter rows. The sketch table is mergeable by
    * construction (counts add cell-wise), which is what makes it the
    * right streaming/partitioned-corpus frequency synopsis at 100 TB:
    * each executor emits its partial cells and a byte-bounded reduce
    * combines them — never the values themselves.
    */
  def countMin(df: DataFrame, valueCol: String, depth: Int = 4,
      widthHexChars: Int = 2): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth in [1,16]")
    require(widthHexChars >= 1 && widthHexChars <= 8, "widthHexChars in [1,8]")
    df.groupBy(col(valueCol).cast("string").as("v"))
      .agg(count(lit(1)).as("c"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("d"),
        col("v"), col("c"))
      .groupBy(col("d"), cmBucket(col("d"), col("v"), widthHexChars).as("bucket"))
      .agg(sum(col("c")).as("cnt"))
  }

  /** Audit the sketch against ground truth for the `topN` most frequent
    * values: (v, true_cnt, est_cnt, overestimate). Joins the topN×depth
    * probe cells (tiny) against the sketch — the corpus is touched once
    * for the exact counts, the sketch not at all beyond its cells. The
    * CMS guarantee est ≥ true holds exactly, so the whole frame is
    * deterministic and oracle-recomputable.
    */
  def countMinAudit(sketch: DataFrame, df: DataFrame, valueCol: String,
      topN: Int = 20, depth: Int = 4, widthHexChars: Int = 2): DataFrame = {
    val truth = df.groupBy(col(valueCol).cast("string").as("v"))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("v"))
      .limit(topN)
    truth
      .select(col("v"), col("true_cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("bucket", cmBucket(col("d"), col("v"), widthHexChars))
      .join(sketch, Seq("d", "bucket"))
      .groupBy(col("v"), col("true_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col("v"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overestimate"))
  }
}
