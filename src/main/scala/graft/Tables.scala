package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading for the driver-provided testdata layout
  * (`TESTDATA.md`): one parquet file per table under a scale-factor
  * directory. At 100 TB each table would be a partitioned parquet
  * dataset; `spark.read.parquet(dir)` handles both layouts.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else spark.read.parquet(path(dir, name))

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (rounds
    * ≤7), which Spark's vectorized reader rejects without the legacy
    * nanos-as-long conf, and TIMESTAMP(MICROS) (round 8 regeneration).
    * Handle both: set the legacy conf (a no-op for micros files), then
    * branch on the type that actually materialized. Nanos convert with
    * integer division — going through a double would lose precision at
    * ~1.7e18 ns; DuckDB's CAST(ts AS TIMESTAMP) truncates ns→us the
    * same way. Micros (TIMESTAMP_NTZ in Spark 4) cast to session-tz
    * TimestampType, a no-shift rename under the UTC session the
    * engine pins everywhere, keeping every downstream comparison and
    * window identical across both layouts.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** [[load]] plus a CONDITIONAL explicit-count key repartition — the
    * small-file parallelism lever. The driver testdata is ONE parquet
    * file (one row group) per table = one input split, so a CPU-heavy
    * per-row stage (shingle/bigram explodes, regex chains, per-chunk
    * language ID) serializes into a single task no matter how many
    * cores exist; measured 5x on q_url_canonical. The count is explicit
    * because AQE would coalesce the tiny exchange straight back to one
    * partition.
    *
    * The repartition fires ONLY when the scan's own split count is
    * below the core count (r16 verdict item 2): at 100 TB the scan has
    * thousands of natural splits and an unconditional shuffle of the
    * table — multi-MB payloads included, to a partition count that can
    * be far SMALLER than the split count — would be an
    * anti-optimization. `df.rdd.getNumPartitions` is the guard for the
    * same reason documented on [[graft.ops.Dedup.widen]]: it is the
    * only pre-execution partition count that is correct (the scan's
    * split count), at the cost of one driver-side plan→RDD translation.
    */
  def loadSpread(spark: SparkSession, dir: String, name: String,
      key: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val df = load(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(key))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Build-once derived table for incremental-maintenance queries: the
    * "stored state an earlier job wrote" side of an incremental op
    * really is written — to parquet under the system temp dir, keyed
    * by source dir and fixture name, on first use (the bench's untimed
    * warmup pass) — so timed passes price the MAINTENANCE op reading
    * its stored input, not a rebuild of that input (r8 verdict on
    * q_cooccur_update). Staged-write + atomic rename keeps concurrent
    * processes from reading a half-written fixture; correctness is
    * indifferent to which process' (identical, deterministic) build
    * wins.
    */
  /** Cache key component for a source-data directory: absolute path
    * PLUS a fingerprint of every table file's (name, size, mtime) —
    * regenerating the dataset at the same path must invalidate cached
    * fixtures (hashing only the path served stale fixtures with an
    * undiagnosable oracle mismatch).
    */
  def dirFingerprint(dir: String): String = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        d.getAbsolutePath + "|" + files.mkString("|")).toLong & 0xffffffffL)
  }

  def storedFixture(spark: SparkSession, dir: String, name: String)(
      build: => DataFrame): DataFrame =
    storedFixtureWith(spark, dir, name, partitionCols = Nil)(build)

  /** [[storedFixture]] written `partitionBy(partitionCols)` — for
    * fixtures whose 100 TB layout IS the partitioning (an IVF code
    * table partitioned by cell): an equality/IN filter on the
    * partition column then prunes at the DIRECTORY level
    * (PartitionFilters in the scan), not merely per row group. The
    * fixture name must be versioned when a layout changes — the cache
    * keys on (name, source fingerprint) only.
    */
  def storedFixturePartitioned(spark: SparkSession, dir: String,
      name: String, partitionCols: Seq[String])(
      build: => DataFrame): DataFrame =
    storedFixtureWith(spark, dir, name, partitionCols)(build)

  private def storedFixtureWith(spark: SparkSession, dir: String,
      name: String, partitionCols: Seq[String])(
      build: => DataFrame): DataFrame = {
    val key = name + "_" + dirFingerprint(dir)
    val root = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_fixtures"), key)
    if (!new java.io.File(root, "_SUCCESS").exists()) {
      if (root.exists()) // debris from a crashed build
        org.apache.commons.io.FileUtils.deleteDirectory(root)
      val stage = new java.io.File(root.getParentFile,
        key + "_stage_" + java.lang.ProcessHandle.current().pid())
      val w = build.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(stage.toString)
      if (!stage.renameTo(root)) {
        // rename fails either because another process won the race
        // (root now exists — read it) or for a non-race reason (read
        // our own staged copy rather than a nonexistent root)
        if (new java.io.File(root, "_SUCCESS").exists()) {
          org.apache.commons.io.FileUtils.deleteDirectory(stage)
        } else {
          return spark.read.parquet(stage.toString)
        }
      }
    }
    spark.read.parquet(root.toString)
  }
}
