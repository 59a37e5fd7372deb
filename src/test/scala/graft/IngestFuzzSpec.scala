package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential CSV-import fuzzing (r11 verdict item 5): every
  * generated CSV runs through the real engine (Ingest.importCsv →
  * catalog parquet → dialect SELECTs through Engine.execute) and must
  * agree with [[IngestFuzz]]'s independent pure-Scala model on the
  * imported row count, the full table multiset (all-TEXT cells,
  * missing/empty cells as NULL), a filter through P5's dual-regime
  * coercion, aggregates over the mixed TEXT columns, and a GROUP BY
  * with a NULL group. `tools/ingest_check.py` replays the same
  * generator's ANSI renderings over DuckDB's read_csv for the third
  * engine.
  */
class IngestFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def normalize(rows: Seq[Vector[Any]]): Seq[String] =
    rows.map(_.map {
      case null => "<null>"
      // numeric results normalize by VALUE, not JVM class: the engine
      // may return Long where the model holds Double (or vice versa)
      // for exactly-integral aggregates
      case n: Long => s"num:${n.toDouble}"
      case n: Int => s"num:${n.toDouble}"
      case n: Double => s"num:$n"
      case v => s"str:$v"
    }.mkString("|")).sorted

  test("100 fuzzed CSV imports: engine == model on row counts, table state, and dialect SELECTs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingfuzz_ci")
    val engine = new Engine(spark,
      java.nio.file.Files.createTempDirectory("graft_ingfuzz_db").toString)
    var selects = 0
    IngestFuzz.cases(n = 100, seed = 12L).foreach { c =>
      val csvPath = tmp.resolve(s"${c.name}.csv")
      java.nio.file.Files.writeString(csvPath, c.csv)
      val imported = graft.ingest.Ingest.importCsv(
        engine.catalog, csvPath.toString, c.table)
      assert(imported === c.rows.size.toLong, s"${c.name} imported rows")
      // every imported column is TEXT — the S7 all-TEXT parity
      val schema = engine.catalog.sparkSchema(c.table)
      assert(schema.fields.forall(
          _.dataType == org.apache.spark.sql.types.StringType),
        s"${c.name}: import must infer all-TEXT, got $schema")
      assert(schema.fields.map(_.name).toSeq === c.header,
        s"${c.name}: header names must become columns verbatim")
      c.selects.foreach { sc =>
        selects += 1
        val got = engine.execute(sc.dialect).toOption.get.collect()
          .map(r => (0 until r.length).map(r.get).toVector).toSeq
        assert(normalize(got) === normalize(sc.expect),
          s"${c.name}/${sc.label}: ${sc.dialect}")
      }
      engine.execute(s"DROP TABLE ${c.table}")
    }
    assert(selects >= 400, s"only $selects fuzzed SELECTs")
  }

  test("numeric-looking strings survive import as text: leading and trailing zeros intact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingzeros")
    val engine = new Engine(spark,
      java.nio.file.Files.createTempDirectory("graft_ingzeros_db").toString)
    java.nio.file.Files.writeString(tmp.resolve("z.csv"),
      "a,b\n007,1.50\n42,x\n")
    graft.ingest.Ingest.importCsv(engine.catalog, tmp.resolve("z.csv").toString, "zt")
    val rows = engine.execute("SELECT * FROM zt").toOption.get.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("007", "1.50"), ("42", "x")))
    // and the dual regime still compares them numerically: 007 = 7
    val hit = engine.execute("SELECT * FROM zt WHERE a = 7").toOption.get.collect()
    assert(hit.length === 1 && hit.head.getString(0) === "007")
    engine.execute("DROP TABLE zt")
  }
}
