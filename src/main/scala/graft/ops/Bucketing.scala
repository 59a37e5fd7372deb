package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffle a join key into N buckets at write time
  * so repeated joins/aggregations on that key run with ZERO exchange —
  * the 100 TB pattern for fact⋈fact joins too big to broadcast and too
  * frequent to re-shuffle per query.
  *
  * Uses the session catalog's managed-table path (`saveAsTable` — plain
  * parquet + bucket metadata in the in-memory/Hive catalog; on a real
  * cluster this is the warehouse).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwrites; also clears a
    * stale warehouse directory left by a previous process — the
    * in-memory catalog forgets the table but its files persist).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortBy: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val leftover = java.nio.file.Paths.get(warehouse, table)
    if (java.nio.file.Files.exists(leftover)) {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(leftover)
      try s.iterator.asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally s.close()
    }
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    sortBy.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. When both sides are
    * bucketed by the same key into the same bucket count, Catalyst
    * plans a SortMergeJoin with NO Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)

  /** Range-clustered layout: repartitionByRange on the key then sort
    * within partitions, so every output file covers a disjoint key
    * interval. Parquet row-group min/max stats + the pushed range
    * filter then skip everything outside the queried interval — the
    * complement to bucketing (equality joins) for range scans
    * (time-slice reads of an event log, date-bounded fact queries).
    */
  def writeRangeSorted(df: DataFrame, path: String, key: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)
}
