package graft

import graft.exec.Executor
import org.scalatest.funsuite.AnyFunSuite

/** In-CI half of the dialect fuzz (r8/r9 carried item): every generated
  * case runs through the dialect Executor AND its ANSI translation
  * through Spark SQL, compared as multisets — an independent engine
  * (Catalyst's own ANSI frontend) pinning the dialect lowering on
  * hundreds of random clause combinations. The DuckDB half
  * (tools/fuzz_check.py over graft.DialectFuzz dumps) replays the same
  * translations on a second engine.
  */
class DialectFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("generator is deterministic per seed") {
    assert(DialectFuzz.cases(50, 7L) === DialectFuzz.cases(50, 7L))
    assert(DialectFuzz.cases(50, 7L) !== DialectFuzz.cases(50, 8L))
  }

  test("200 random dialect cases match their ANSI translation under Spark SQL") {
    Tables.registerAll(spark, dir)
    val ex = Executor.forDir(spark, dir)
    val all = DialectFuzz.cases(200, 11L)
    val failures = all.flatMap { c =>
      try {
        val got = ex.sql(c.dialect)
        val want = spark.sql(c.ansi)
        val gc = got.columns.sorted.toSeq
        val wc = want.columns.sorted.toSeq
        if (gc != wc)
          Some(s"${c.name}: cols $gc vs $wc  [${c.dialect}]")
        else {
          def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
            df.select(gc.map(org.apache.spark.sql.functions.col): _*)
              .collect().toSeq
              .map(_.toSeq.map {
                case null => "NULL"
                case d: java.lang.Double => // -0.0 vs 0.0 and long-vs-double
                  if (d.doubleValue == math.rint(d.doubleValue) &&
                    math.abs(d.doubleValue) < 1e15)
                    (d.doubleValue + 0.0).toLong.toString
                  else d.toString
                case x => x.toString
              }).sortBy(_.mkString("\u0001"))
          val g = canon(got)
          val w = canon(want)
          if (g != w) {
            val firstDiff = g.zip(w).find(p => p._1 != p._2)
              .map(p => s"${p._1} vs ${p._2}")
              .getOrElse(s"row counts ${g.size} vs ${w.size}")
            Some(s"${c.name}: $firstDiff  [${c.dialect}] vs [${c.ansi}]")
          } else None
        }
      } catch {
        case e: Throwable =>
          Some(s"${c.name}: ${e.getClass.getSimpleName}: ${e.getMessage}  [${c.dialect}] vs [${c.ansi}]")
      }
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/fuzz_failures.txt"),
      failures.mkString("\n================\n"))
    assert(failures.isEmpty, failures.take(3).mkString("\n"))
  }
}
