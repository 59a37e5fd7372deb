package graft

import graft.catalog.Catalog
import graft.ingest.Ingest
import graft.ops.Skew
import graft.streaming.Streams
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path mechanics: hive-partitioned tables with partition
  * pruning, salted joins for skewed keys, streaming dedup with bounded
  * state.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("partitioned table: layout, round-trip, and partition pruning") {
    val cat = new Catalog(spark, Files.createTempDirectory("graftpart").toString)
    cat.create("ev", Seq("id" -> "INT", "kind" -> "TEXT", "v" -> "DECIMAL"), partitionBy = Seq("kind"))
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0), (4L, "c", 4.0))
      .toDF("id", "kind", "v")
    cat.append("ev", df)
    // hive-style directories exist
    assert(Files.exists(cat.tableDir("ev").resolve("kind=a")))
    // full read returns declared column order and all rows
    val loaded = cat.load("ev")
    assert(loaded.columns.toSeq == Seq("id", "kind", "v"))
    assert(loaded.count() == 4)
    // partition filter prunes: only kind=a read
    val q = loaded.filter(col("kind") === "a")
    val scan = q.queryExecution.executedPlan.toString
    assert(q.count() == 2)
    assert(scan.contains("PartitionFilters"), scan)
    // catalog reloaded from disk keeps the partition spec
    val cat2 = new Catalog(spark, cat.dbPath)
    assert(cat2.specOf("ev").partitionBy == Seq("kind"))
    assert(cat2.load("ev").count() == 4)
  }

  test("partitioned parquet import") {
    val cat = new Catalog(spark, Files.createTempDirectory("graftpart2").toString)
    val src = Files.createTempDirectory("graftsrc")
    Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "tag", "v")
      .write.mode("overwrite").parquet(s"$src/t")
    val n = Ingest.importParquet(cat, s"$src/t", "t", partitionBy = Seq("tag"))
    assert(n == 2)
    assert(Files.exists(cat.tableDir("t").resolve("tag=x")))
  }

  test("salted join equals plain join on skewed data") {
    // heavy skew: 10k rows on one key, 10 on others
    val large = (Seq.fill(10000)(1L) ++ (2L to 11L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (99L, "unmatched")).toDF("k", "label")
    val plain = large.join(small, "k").groupBy("k", "label").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(large, small, "k", salts = 8)
      .groupBy("k", "label").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(plain.contains((1L, "hot", 10000L)))
  }

  test("skew profile surfaces the hot key") {
    val df = (Seq.fill(100)("hot") ++ Seq("a", "b")).toDF("k")
    val top = Skew.keySkewProfile(df, "k", 1).collect().head
    assert(top.getString(0) == "hot" && top.getLong(1) == 100L)
  }

  test("streaming dedup within watermark drops duplicate keys") {
    val dir = Files.createTempDirectory("graftdedupstream")
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // plant duplicates: union the first 100 events twice
    val dup = events.limit(100)
    events.limit(500).union(dup).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Streams.dedupWithinWatermark(stream, Seq("event_id"), "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup_out")
    assert(got.count() == 500)
    assert(got.select("event_id").distinct().count() == 500)
  }
}
