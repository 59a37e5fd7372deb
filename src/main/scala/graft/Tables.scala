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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and convert with
    * integer division — going through a double would lose precision at
    * ~1.7e18 ns. DuckDB's CAST(ts AS TIMESTAMP) truncates ns→us the same
    * way, so oracle parity holds.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
