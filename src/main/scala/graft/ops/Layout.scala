package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Write-time data layout for 100 TB corpora: Z-order (Morton)
  * multi-dimension clustering and contiguous global id assignment.
  *
  * Both solve the same scale problem from different ends: a table laid
  * out by ONE key prunes scans on that key only, while training-data
  * access patterns filter on several (customer AND date, source AND
  * length). Z-ordering interleaves the key bits so a contiguous file
  * range covers a small rectangle of the multi-dim space — parquet
  * min/max footer stats then prune on EVERY interleaved dimension at
  * once. Id assignment gives each row a dense ordinal without a global
  * sort (the classic driver bottleneck of `zipWithIndex`).
  */
object Layout {

  /** Morton/Z-value of two non-negative integer columns: the low
    * `bits` bits of `x` and `y` interleaved (x at even positions).
    * Pure long bit arithmetic — codegen'd, zero shuffle, and exactly
    * recomputable by any engine with shift/and (the oracle replays the
    * same terms in SQL). The bit terms are disjoint, so `+` is the
    * same as OR and stays an associative reduce.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    zValueN(Seq(x, y), bits)

  /** N-dimension Morton value: the low `bits` bits of every column
    * interleaved round-robin (column j of bit b lands at position
    * b*N + j, so the 2-column layout matches [[zValue]] exactly).
    * bits*N must fit a long's non-sign bits.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bits >= 1 && bits * cols.length <= 62,
      s"bits*dims must be in [1, 62], got ${bits * cols.length}")
    val d = cols.length
    (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * d + j)
      }
    }.reduce(_ + _)
  }

  /** Locality audit of a Z-order layout: bucket rows by the top
    * `bucketBits` of their z-value (one bucket ≈ one file/row-group in
    * a z-sorted write) and report the x/y rectangle each bucket covers.
    * Every bucket spanning a narrow x-range AND a narrow y-range is the
    * property that makes multi-dim data skipping work — the spec
    * asserts bucket spans ≪ global spans, and the DuckDB oracle
    * recomputes every row exactly (all-integer output).
    *
    * Scale: one map (the z bit terms) + one groupBy on the bucket id —
    * the same shape at 10^12 rows; the bucket count is 2^bucketBits
    * regardless of data size.
    */
  def zorderStats(df: DataFrame, x: Column, y: Column, bits: Int,
      bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      "bucketBits must be in [1, 2*bits]")
    df.select(x.cast("long").as("_x"), y.cast("long").as("_y"))
      .withColumn("_z", zValue(col("_x"), col("_y"), bits))
      .withColumn("bucket", shiftright(col("_z"), 2 * bits - bucketBits))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("_x").as("min_x"), max("_x").as("max_x"),
        min("_y").as("min_y"), max("_y").as("max_y"))
      .withColumn("x_span", col("max_x") - col("min_x") + 1L)
      .withColumn("y_span", col("max_y") - col("min_y") + 1L)
  }

  /** Dense contiguous ids 0..n-1 in deterministic md5 order, without a
    * global sort: the 60-bit order key's TOP 8 bits form 256 range
    * buckets (a bit-prefix, so bucket order IS global order), ranks are
    * computed per-bucket in parallel, and each bucket adds an exclusive
    * prefix of the bucket counts — a 256-row window, never the corpus.
    * md5 is uniform, so buckets are balanced with no planning pass.
    *
    * This is what `zipWithIndex` (driver round-trip, RDD lineage) or
    * `row_number()` over an unpartitioned window (single task holding
    * the corpus) get wrong at scale. Equals
    * `ROW_NUMBER() OVER (ORDER BY md5(salt:id), id) - 1` exactly —
    * the oracle recomputes it that way.
    */
  def assignStableIds(df: DataFrame, idCol: String,
      salt: String = "sid"): DataFrame = {
    val ord = conv(substring(
      md5(concat(lit(salt + ":"), col("id").cast("string"))), 1, 15),
      16, 10).cast("long")
    val o = df.select(col(idCol).as("id"))
      .withColumn("_ord", ord)
      .withColumn("_b", shiftright(col("_ord"), 52))
    val counts = o.groupBy("_b").agg(count(lit(1)).as("_n"))
    // 256 rows: the one ordered window runs over the bucket histogram,
    // not the data
    val w = Window.orderBy(col("_b")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(w), lit(0L)))
      .select(col("_b"), col("_off"))
    val rk = Window.partitionBy(col("_b")).orderBy(col("_ord"), col("id"))
    o.join(offs, Seq("_b"))
      .withColumn("new_id", col("_off") + row_number().over(rk).cast("long") - 1L)
      .select(col("id"), col("new_id"))
  }

  /** Range-partition planning for a global-sorted write: bounds from
    * exact discrete percentiles (`percentile_disc`), then the audit of
    * how many rows and what key range each partition would receive —
    * the decision input before committing a `repartitionByRange` /
    * sorted-write of a 100 TB table (a skewed key makes partition
    * sizes explode; this surfaces it for the cost of one aggregate +
    * one scan, no sort). The bounds row broadcasts; partition
    * assignment is a per-row fold over the bounds array. With row
    * counts divisible by `parts` (the bench tables), the discrete-
    * percentile definition coincides across engines, making every
    * output field oracle-exact.
    *
    * The bounds are EXACT order statistics found distributively (the
    * r9 rewrite of an r8 sorted-collect that buffered the whole key
    * column in one aggregate row — an OOM by design at 100 TB, in the
    * very operator whose purpose is planning 100 TB sorted writes):
    * `percentile_disc(p)` is the element at 1-based position ceil(p·N)
    * of the non-null ascending order (spec-pinned against the
    * built-in), and that element is located with the same two-level
    * shape as [[assignStableIds]] — rough order-preserving buckets
    * from `percentile_approx` cut points (their accuracy affects only
    * bucket BALANCE, never the answer: equal keys always share a
    * bucket and bucket order follows key order because the double
    * image of the key is monotone), a ≤64-row bucket histogram whose
    * prefix sums turn global target positions into (bucket, local
    * rank) addresses, and a rank window PARTITIONED by bucket that
    * runs only inside the ≤parts−1 owner buckets. No task ever holds
    * more than ~1/64 of one column, so the exact audit itself now
    * scales; keys must be numeric (double-castable) for the rough
    * cut-point pass.
    */
  def rangePartitionPlan(df: DataFrame, keyCol: String,
      parts: Int): DataFrame = {
    require(parts >= 2, "need parts >= 2")
    val keys = df.filter(col(keyCol).isNotNull).select(col(keyCol).as("_k"))
    // target 1-based global positions pos_i = max(ceil(N·i/parts), 1)
    val bounds = orderStats(keys, (1 until parts).map(i =>
        greatest(ceil(col("_N") * i.toDouble / parts), lit(1.0))
          .cast("long")))
      .select(col("_stats").as("_bounds"))
    // the bounds array has exactly parts−1 elements, so the fold
    // expands to a static codegen'd when-sum over element_at — same
    // rationale as the orderStats bucket expression (HOF lambdas are
    // interpreted per row), identical term-for-term semantics
    df.select(col(keyCol).as("_k")).crossJoin(broadcast(bounds))
      .withColumn("part", (1 until parts).map(i =>
        when(col("_k") > element_at(col("_bounds"), i), 1).otherwise(0))
        .reduce(_ + _))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n"),
        min(col("_k")).as("min_key"), max(col("_k")).as("max_key"))
  }

  /** Exact order statistics of a numeric column, distributively: the
    * values at the given 1-based positions of the ascending non-null
    * order of `keys`' `_k` column, without any task ever holding more
    * than ~1/64 of the column. Each element of `posExprs` may
    * reference `col("_N")` (the non-null row count) and must evaluate
    * to a 1-based long position; the result is ONE row whose `_stats`
    * array holds the value at each position, in `posExprs` order.
    *
    * Shape (shared by [[rangePartitionPlan]], [[assignStableIds]]'s
    * sibling, `Profile.winsorizedStats`): rough order-preserving
    * buckets from `percentile_approx` cut points — their accuracy
    * shapes only bucket BALANCE, never the answer, because the double
    * image of the key is monotone so equal keys share a bucket and
    * bucket order follows key order — then a ≤64-row bucket histogram
    * whose prefix sums translate global positions into (bucket, local
    * rank) addresses, and a rank window PARTITIONED by bucket that
    * runs only inside the owner buckets. The one ordered-unpartitioned
    * window is over the histogram; the final collect_list sees
    * |posExprs| rows, not the corpus.
    */
  private[graft] def orderStats(keys: DataFrame,
      posExprs: Seq[Column]): DataFrame = {
    require(posExprs.nonEmpty, "need at least one position")
    val nRough = 64
    // the cut array is PINNED: evaluated once, collected (≤63 doubles —
    // a driver-side reduction, not a data collect), and inlined as a
    // literal. percentile_approx is merge-order-sensitive, and the
    // bucketed frame fans out to both the histogram and the per-bucket
    // rank path — relying on Catalyst exchange reuse to deduplicate
    // the subtree would let the two paths see DIFFERENT cut arrays if
    // reuse is disabled or canonicalization misses, silently skewing
    // every downstream rank.
    // accuracy 100 (r16): the cuts shape only bucket BALANCE, never
    // the answer (the invariant documented above), so ~1% rank error
    // in a 1/64-grain cut grid is free and the sketch state stays
    // 10x smaller per task at scale.
    val cutsRow = keys.agg(percentile_approx(col("_k").cast("double"),
      array((1 until nRough).map(i => lit(i.toDouble / nRough)): _*),
      lit(100)).as("_cuts")).head()
    val cutVals: Seq[Double] =
      if (cutsRow.isNullAt(0)) Seq.empty else cutsRow.getSeq[Double](0)
    // bucket id = count of cuts strictly below the key — the codegen'd
    // CutBucket binary search (guide §4: no interpreted HOF lambdas in
    // the hot path; see RankExpressions for the measured history)
    val bucketed = keys
      .withColumn("_b", graft.functions.RankExpressions.cut_bucket(
        col("_k").cast("double"), cutVals))
      .select(col("_k"), col("_b"))
    val hist = bucketed.groupBy(col("_b")).agg(count(lit(1)).as("_n"))
    // ≤ nRough rows: the only ordered-unpartitioned window runs over
    // the bucket histogram, never the data
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist.withColumn("_off",
      coalesce(sum(col("_n")).over(wOff), lit(0L)))
    val targets = hist.agg(sum(col("_n")).as("_N"))
      .select(posexplode(array(posExprs: _*)).as(Seq("_i", "_pos")))
    val owner = targets.join(offs,
        col("_pos") > col("_off") && col("_pos") <= col("_off") + col("_n"))
      .select(col("_i"), col("_b"), (col("_pos") - col("_off")).as("_local"))
    // rank only inside the owner buckets; ties in _k permute equal
    // values, so the picked VALUE at each rank is well-defined
    val wRank = Window.partitionBy(col("_b")).orderBy(col("_k"))
    val picked = bucketed
      .join(broadcast(owner.select(col("_b")).distinct()), Seq("_b"),
        "leftsemi")
      .withColumn("_r", row_number().over(wRank).cast("long"))
      .join(broadcast(owner), Seq("_b"))
      .filter(col("_r") === col("_local"))
    picked
      .agg(array_sort(collect_list(struct(col("_i"), col("_k").as("_v"))))
        .as("_s"))
      .select(transform(col("_s"), s => s.getField("_v")).as("_stats"))
  }

  /** Zone-map pruning audit: the number that says what sort-clustering
    * is worth BEFORE rewriting 100 TB. Rows are assigned to `nFiles`
    * files under two layouts — `clustered` (value-range buckets of the
    * key, i.e. what a sorted write produces) and `scattered` (the key
    * round-robined, i.e. insert-order) — each file keeps its (min, max,
    * n_rows) zone map, and `nPreds` equal-width range predicates over
    * the key span are evaluated against the zone maps alone:
    * files_scanned = zones overlapping [lo, hi], prune_pct = the
    * fraction of files a reader skips. All layout/predicate arithmetic
    * is exact integer math on the key, so every row is
    * engine-recomputable.
    *
    * Scale shape: ONE corpus-scale map-combinable groupBy (2·nFiles
    * cells); the audit join runs at zones × preds grain (≤ 2·nFiles·
    * nPreds rows). The same pass works at 10^12 rows.
    */
  def zoneMapPrune(df: DataFrame, key: Column, nFiles: Int = 64,
      nPreds: Int = 8): DataFrame = {
    require(nFiles > 1 && nPreds >= 1, "need nFiles > 1, nPreds >= 1")
    val base = df.select(key.cast("long").as("k"))
    val mm = base.agg(min(col("k")).as("_kmin"), max(col("k")).as("_kmax"))
      .withColumn("_span", col("_kmax") - col("_kmin") + 1L)
    val zones = base.crossJoin(broadcast(mm))
      .select(col("k"), explode(map(
        lit("clustered"),
        floor((col("k") - col("_kmin")).cast("double") * nFiles /
          col("_span").cast("double")).cast("long"),
        lit("scattered"), pmod(col("k"), lit(nFiles.toLong))))
        .as(Seq("layout", "file")))
      .groupBy(col("layout"), col("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("k")).as("zmin"), max(col("k")).as("zmax"))
    val totals = zones.groupBy(col("layout"))
      .agg(count(lit(1)).as("files_total"))
    val preds = mm
      .select(explode(sequence(lit(0), lit(nPreds - 1))).as("pred"),
        col("_kmin"), col("_span"))
      .select(col("pred").cast("long").as("pred"),
        (col("_kmin") + floor((col("pred") * col("_span")).cast("double") /
          lit(nPreds.toDouble)).cast("long")).as("lo"),
        (col("_kmin") + floor(((col("pred") + 1) * col("_span")).cast("double") /
          lit(nPreds.toDouble)).cast("long") - 1L).as("hi"))
    val hit = col("zmin") <= col("hi") && col("zmax") >= col("lo")
    zones.crossJoin(broadcast(preds))
      .groupBy(col("layout"), col("pred"), col("lo"), col("hi"))
      .agg(sum(when(hit, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_scanned"))
      .join(totals, Seq("layout"))
      .select(col("layout"), col("pred"), col("lo"), col("hi"),
        col("files_total"), col("files_scanned"), col("rows_scanned"),
        round(lit(1.0) - col("files_scanned").cast("double") /
          col("files_total").cast("double"), 6).as("prune_pct"))
  }

  /** Column-encoding advisor: per column, the write-order statistics a
    * parquet/ORC writer needs to pick an encoding — row/null/distinct
    * counts and the EXACT run count under the table's write order —
    * plus the recommendation itself (DICT when ≤ 5% distinct, RLE when
    * the mean run is ≥ 4, both → RLE_DICT, else PLAIN). The thresholds
    * compare exact integers (n_distinct·20 ≤ n, n ≥ n_runs·4), so the
    * decision is engine-exact, not a rounded-double coin flip.
    *
    * Runs are counted WITHOUT a global sort: the unique integer
    * `orderKey` is value-range-bucketed (a bucket prefix preserves
    * global order), run starts are counted per (column, bucket) in
    * parallel windows, and a bucket-frame pass (≤ `buckets` rows per
    * column) subtracts the runs that continue across a bucket
    * boundary — the [[assignStableIds]] trick applied to run-length
    * stats. One exploded corpus-scale shuffle on (column, bucket);
    * nothing corpus-sized is ever in one task.
    */
  /** Partition/broadcast sizing advisor: per table, exact row counts
    * and a deterministic byte estimate (strings cost length+4, every
    * fixed-width column 8 — a schema-driven rule both engines can
    * replay, unlike sampled or file-system statistics), then the two
    * numbers every Spark job config needs: partition count at the
    * target partition size (ceil division, exact) and whether the
    * table fits under the broadcast threshold. ONE map-combinable
    * aggregate per table; the advisor output is |tables| rows.
    */
  def partitionAdvisor(tables: Seq[(String, DataFrame)],
      targetPartitionBytes: Long = 128L * 1024 * 1024,
      broadcastThreshold: Long = 10L * 1024 * 1024): DataFrame = {
    require(tables.nonEmpty, "need at least one table")
    tables.map { case (name, df) =>
      val width = df.schema.fields.map { f =>
        if (f.dataType == org.apache.spark.sql.types.StringType)
          length(col(f.name)).cast("long") + 4L
        else lit(8L)
      }.reduce(_ + _)
      df.agg(count(lit(1)).as("n_rows"), sum(width).as("est_bytes"))
        .select(lit(name).as("table_name"), col("n_rows"), col("est_bytes"),
          expr("est_bytes DIV n_rows").as("est_row_bytes"),
          greatest(lit(1L),
            expr(s"(est_bytes + ${targetPartitionBytes - 1}L) DIV " +
              s"${targetPartitionBytes}L")).as("n_partitions"),
          (col("est_bytes") <= broadcastThreshold).as("broadcastable"))
    }.reduce(_.unionByName(_))
  }

  def encodingPlan(df: DataFrame, orderKey: Column, colNames: Seq[String],
      buckets: Int = 256): DataFrame = {
    require(colNames.nonEmpty, "need at least one column")
    val base = df.select((col("*") +: Seq(orderKey.cast("long").as("_k"))): _*)
    val mm = base.agg(min(col("_k")).as("_kmin"), max(col("_k")).as("_kmax"))
      .withColumn("_span", col("_kmax") - col("_kmin") + 1L)
    val melted = base.crossJoin(broadcast(mm))
      .withColumn("_bucket",
        floor((col("_k") - col("_kmin")).cast("double") * buckets /
          col("_span").cast("double")).cast("long"))
      .select(col("_k"), col("_bucket"), explode(map(
        colNames.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
        .as(Seq("cname", "v")))
    val w = Window.partitionBy(col("cname"), col("_bucket")).orderBy(col("_k"))
    val starts = melted
      .withColumn("_pk", lag(col("_k"), 1).over(w))
      .withColumn("_pv", lag(col("v"), 1).over(w))
      .withColumn("_start",
        when(col("_pk").isNull || !(col("v") <=> col("_pv")), 1L)
          .otherwise(0L))
      .groupBy(col("cname"), col("_bucket"))
      .agg(sum(col("_start")).as("_starts"),
        min_by(col("v"), col("_k")).as("_fv"),
        max_by(col("v"), col("_k")).as("_lv"))
    val w2 = Window.partitionBy(col("cname")).orderBy(col("_bucket"))
    val runs = starts
      .withColumn("_pb", lag(col("_bucket"), 1).over(w2))
      .withColumn("_plv", lag(col("_lv"), 1).over(w2))
      .withColumn("_dup",
        when(col("_pb").isNotNull && (col("_fv") <=> col("_plv")), 1L)
          .otherwise(0L))
      .groupBy(col("cname"))
      .agg((sum(col("_starts")) - sum(col("_dup"))).as("n_runs"))
    val stats = melted.groupBy(col("cname"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").isNull.cast("long")).as("n_null"),
        countDistinct(col("v")).as("n_distinct"))
    val dict = col("n_distinct") * 20L <= col("n_rows")
    val rle = col("n_rows") >= col("n_runs") * 4L
    stats.join(runs, Seq("cname"))
      .select(col("cname").as("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("n_runs"),
        round(col("n_distinct").cast("double") /
          col("n_rows").cast("double"), 6).as("distinct_ratio"),
        round(col("n_rows").cast("double") /
          col("n_runs").cast("double"), 6).as("avg_run_len"),
        when(dict && rle, lit("RLE_DICT")).when(dict, lit("DICT"))
          .when(rle, lit("RLE")).otherwise(lit("PLAIN")).as("encoding"))
  }
}
