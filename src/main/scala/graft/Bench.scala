package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * Methodology (recorded in BASELINE.md): one untimed warmup pass runs
  * every query first so the timed pass measures steady-state plan
  * execution, not Janino/JIT compilation of each query's codegen —
  * the regime a long-running cluster actually operates in. Disable
  * with SPARK_GRAFT_WARMUP=0.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional args = subset of query names, for targeted local profiling;
    // the driver invokes with no args and gets the full suite
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.nonEmpty) names0.filter(args.toSet) else names0
    if (warmup) names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache() // operators persist signature tables
    }
    val errors = Seq.newBuilder[String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        // a failing query must be VISIBLE, not recorded as a fast run
        errors += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> t
    }
    val errorNames = errors.result()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errorNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // errors surface in the JSON + stderr; exit stays 0 so the driver
    // still collects the line
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
