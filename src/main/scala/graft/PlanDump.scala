package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Diagnostic main: print the formatted physical plan of named
  * SparkEntry queries after execution (so AQE's final plan is shown).
  * Usage: runMain graft.PlanDump <sfDir> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
