package graft

import graft.catalog.Catalog
import graft.dialect.DialectException
import graft.ingest.Ingest
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Catalog + DML + ingestion lifecycle (SURVEY §2.9, §2.1 S7/S8). */
class CatalogDmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshEngine(): Engine =
    new Engine(spark, Files.createTempDirectory("graftdb").toString)

  test("create / show / drop tables") {
    val e = freshEngine()
    assert(e.execute("CREATE TABLE students (id INT, name TEXT, gpa DECIMAL, active BOOL)") ==
      Left("table students created"))
    assert(e.execute("SHOW TABLES") == Left("students"))
    assertThrows[DialectException](
      e.execute("CREATE TABLE students (id INT)")) // duplicate
    assert(e.execute("DROP TABLE students") == Left("table students dropped"))
    assert(e.execute("SHOW TABLES") == Left(""))
  }

  test("table names that would escape the DB root are rejected") {
    val e = freshEngine()
    // quoted identifiers reach the catalog verbatim; a traversal name
    // must never become a filesystem path (create would mkdir outside
    // the root, drop would recursively delete an arbitrary directory)
    assertThrows[DialectException](e.execute("CREATE TABLE '../../pwned' (id INT)"))
    assertThrows[DialectException](e.execute("DROP TABLE '../..'"))
    assertThrows[DialectException](e.catalog.create("a/b", Seq("id" -> "INT")))
    assertThrows[DialectException](e.catalog.create("", Seq("id" -> "INT")))
    assertThrows[DialectException](e.catalog.create("x" * 65, Seq("id" -> "INT")))
    assertThrows[DialectException](e.catalog.tableDir("../../etc"))
    e.catalog.create("ok_Name_9", Seq("id" -> "INT")) // sane names still pass
  }

  test("EXPLAIN returns the formatted physical plan; non-SELECT rejected") {
    val e = freshEngine()
    e.execute("CREATE TABLE ex (id INT, name TEXT)")
    e.execute("INSERT INTO ex (id, name) VALUES (1, 'a')")
    val out = e.execute("EXPLAIN SELECT id FROM ex WHERE id = 1")
    assert(out.isLeft)
    val plan = out.swap.toOption.get
    assert(plan.contains("Physical Plan"), plan)
    assert(plan.contains("Scan") || plan.contains("LocalTableScan"), plan)
    assert(e.execute("EXPLAIN DROP TABLE ex") ==
      Left("EXPLAIN supports only SELECT statements"))
    // the table survived — EXPLAIN never executes DML
    assert(e.execute("SHOW TABLES") == Left("ex"))
  }

  test("compaction merges append-fragmented files, data unchanged") {
    val e = freshEngine()
    e.execute("CREATE TABLE frag (id INT, name TEXT)")
    // each single-row insert writes its own parquet file
    (1 to 12).foreach(i =>
      e.execute(s"INSERT INTO frag (id, name) VALUES ($i, 'n$i')"))
    val before = e.catalog.fileStats("frag")
    assert(before.fileCount == 12, s"expected 12 fragment files, got $before")
    val rowsBefore = e.catalog.load("frag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

    e.catalog.compact("frag")
    val after = e.catalog.fileStats("frag")
    assert(after.fileCount == 1, s"expected one compacted file, got $after")
    val rowsAfter = e.catalog.load("frag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rowsAfter == rowsBefore)

    // tiny target forces a multi-file layout; still the same rows
    e.catalog.compact("frag", targetFileBytes = 1L)
    assert(e.catalog.fileStats("frag").fileCount > 1)
    assert(e.catalog.load("frag").count() == 12)
  }

  test("insert with coercion, select back") {
    val e = freshEngine()
    e.execute("CREATE TABLE t (id INT, name TEXT, score DECIMAL, ok BOOL)")
    assert(e.execute("INSERT INTO t (id, name, score, ok) VALUES (1, 'Ana', 93.5, true)") ==
      Left("1 row inserted"))
    e.execute("INSERT INTO t (id, name, score, ok) VALUES (2, 'Bo', 71.0, false)")
    val rows = e.execute("SELECT id, name, score, ok FROM t ORDER BY id").toOption.get.collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "Ana"
      && rows(0).getDouble(2) == 93.5 && rows(0).getBoolean(3))
  }

  test("insert validates column names and types") {
    val e = freshEngine()
    e.execute("CREATE TABLE t (id INT, name TEXT)")
    assertThrows[DialectException](e.execute("INSERT INTO t (nope) VALUES (1)"))
    assertThrows[DialectException](e.execute("INSERT INTO t (id) VALUES ('abc')"))
  }

  test("omitted columns become NULL (dynamic-row parity)") {
    val e = freshEngine()
    e.execute("CREATE TABLE t (id INT, name TEXT)")
    e.execute("INSERT INTO t (name) VALUES ('solo')")
    val r = e.execute("SELECT id, name FROM t").toOption.get.collect().head
    assert(r.isNullAt(0) && r.getString(1) == "solo")
  }

  test("update with and without WHERE; case-insensitive match") {
    val e = freshEngine()
    e.execute("CREATE TABLE t (id INT, city TEXT)")
    e.execute("INSERT INTO t (id, city) VALUES (1, 'Lyon')")
    e.execute("INSERT INTO t (id, city) VALUES (2, 'Oslo')")
    e.execute("INSERT INTO t (id, city) VALUES (3, 'lyon')")
    // WHERE matches case-insensitively (reference strings.EqualFold)
    assert(e.execute("UPDATE t SET city = 'Paris' WHERE city = 'LYON'") ==
      Left("2 rows updated"))
    val cities = e.execute("SELECT city FROM t ORDER BY id").toOption.get
      .collect().map(_.getString(0)).toSeq
    assert(cities == Seq("Paris", "Oslo", "Paris"))
    // no WHERE → every row
    assert(e.execute("UPDATE t SET city = 'X'") == Left("3 rows updated"))
  }

  test("delete requires WHERE and matches case-insensitively") {
    val e = freshEngine()
    e.execute("CREATE TABLE t (id INT, tag TEXT)")
    e.execute("INSERT INTO t (id, tag) VALUES (1, 'keep')")
    e.execute("INSERT INTO t (id, tag) VALUES (2, 'Drop')")
    e.execute("INSERT INTO t (id, tag) VALUES (3, 'drop')")
    assert(e.execute("DELETE FROM t WHERE tag = 'DROP'") == Left("2 rows deleted"))
    val left = e.execute("SELECT id FROM t").toOption.get.collect().map(_.getLong(0)).toSeq
    assert(left == Seq(1L))
  }

  test("overwrite survives re-read (staged atomic swap)") {
    val e = freshEngine()
    e.execute("CREATE TABLE t (id INT)")
    (1 to 5).foreach(i => e.execute(s"INSERT INTO t (id) VALUES ($i)"))
    e.execute("DELETE FROM t WHERE id = '3'")
    assert(e.execute("SELECT COUNT(*) FROM t").toOption.get.collect().head.getLong(0) == 4L)
    // catalog reload from disk sees the same data
    val c2 = new Catalog(spark, e.catalog.dbPath)
    assert(c2.load("t").count() == 4L)
  }

  test("csv import: all-TEXT reference parity and typed superset") {
    val e = freshEngine()
    val csv = Files.createTempFile("graft", ".csv")
    Files.writeString(csv, "id,name,score\n1,Ana,9.5\n2,Bo,7.25\n")
    val n = Ingest.importCsv(e.catalog, csv.toString, "people")
    assert(n == 2)
    assert(e.catalog.columnsOf("people").map(_._2) == Seq("TEXT", "TEXT", "TEXT"))
    // values readable as text; coercion comparisons still work in dialect
    val r = e.execute("SELECT name FROM people WHERE score > 8 ORDER BY id").toOption.get
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("Ana"))
    // typed variant
    val n2 = Ingest.importCsv(e.catalog, csv.toString, "people_typed", inferTypes = true)
    assert(n2 == 2)
    assert(e.catalog.columnsOf("people_typed").map(_._2) == Seq("INT", "TEXT", "DECIMAL"))
  }

  test("parquet import: native read, schema from footer") {
    val e = freshEngine()
    val dir = Files.createTempDirectory("graftpq")
    Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "label", "v")
      .write.mode("overwrite").parquet(s"$dir/src")
    val n = Ingest.importParquet(e.catalog, s"$dir/src", "imported")
    assert(n == 2)
    assert(e.catalog.columnsOf("imported") ==
      Seq("id" -> "INT", "label" -> "TEXT", "v" -> "DECIMAL"))
    assert(e.execute("SELECT COUNT(*) FROM imported").toOption.get.collect().head.getLong(0) == 2L)
  }

  test("orc import and export round-trip exactly") {
    val e = freshEngine()
    val dir = Files.createTempDirectory("graftorc")
    Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "label", "v")
      .write.mode("overwrite").orc(s"$dir/src")
    val n = Ingest.importOrc(e.catalog, s"$dir/src", "orcd")
    assert(n == 2)
    assert(e.catalog.columnsOf("orcd") ==
      Seq("id" -> "INT", "label" -> "TEXT", "v" -> "DECIMAL"))
    val out = Ingest.exportOrc(e.catalog, "orcd", s"$dir/out")
    assert(out == 2)
    val back = spark.read.orc(s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back == Set((1L, "a", 2.5), (2L, "b", 3.5)))
  }

  test("csv and ndjson export re-import to the same data (all-TEXT parity)") {
    val e = freshEngine()
    val csv = Files.createTempFile("graft", ".csv")
    Files.writeString(csv, "id,name,score\n1,Ana,9.5\n2,Bo,7.25\n")
    Ingest.importCsv(e.catalog, csv.toString, "people")
    val dir = Files.createTempDirectory("graftexp")
    assert(Ingest.exportCsv(e.catalog, "people", s"$dir/csv", singleFile = true) == 2)
    assert(Ingest.exportNdjson(e.catalog, "people", s"$dir/nd") == 2)
    // csv round trip through the importer
    val n = Ingest.importCsv(e.catalog, s"$dir/csv", "people2")
    assert(n == 2)
    val a = e.catalog.load("people").orderBy("id")
      .collect().map(_.toSeq).toSeq
    val b = e.catalog.load("people2").orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    // ndjson export is plain JSON-lines, readable back directly
    val nd = spark.read.json(s"$dir/nd")
    assert(nd.count() == 2 && nd.columns.sorted.toSeq == Seq("id", "name", "score"))
  }

  test("ndjson .dat import: reference storage quirks normalized") {
    val e = freshEngine()
    val dat = Files.createTempFile("graft", ".dat")
    // mirrors the reference's on-disk quirks: "NULL" strings for nil,
    // missing keys, a malformed line that must be skipped, mixed types
    Files.writeString(dat,
      """{"id":"1","name":"Ana","course":"math"}
        |{"id":"2","name":"NULL","course":"art"}
        |{"course":"data science","name":"sam"}
        |this line is not json
        |{"id":"4","name":"Bo","course":"math"}
        |""".stripMargin)
    val n = Ingest.importNdjson(e.catalog, dat.toString, "students")
    assert(n == 4)
    val rows = e.execute("SELECT id, name, course FROM students ORDER BY course").toOption.get.collect()
    assert(rows.length == 4)
    val sam = rows.find(r => !r.isNullAt(1) && r.getString(1) == "sam").get
    assert(sam.isNullAt(0)) // missing key → NULL
    val two = rows.find(r => !r.isNullAt(0) && r.getString(0) == "2").get
    assert(two.isNullAt(1)) // "NULL" string → real null
    // coercion-compare still works on the all-TEXT table
    val m = e.execute("SELECT COUNT(*) FROM students WHERE id > 1").toOption.get.collect().head
    assert(m.getLong(0) == 2)
  }

  test("image dir: set, resolve exact and substring, fail on missing") {
    val e = freshEngine()
    val imgs = Files.createTempDirectory("graftimg")
    Files.writeString(imgs.resolve("cat.png"), "px")
    Files.writeString(imgs.resolve("holiday_beach_2024.jpg"), "px")
    assert(e.execute(s"SET IMAGE DIR ${imgs.toString}").isLeft)
    e.execute("CREATE TABLE photos (id INT, img IMAGE)")
    e.execute("INSERT INTO photos (id, img) VALUES (1, cat)")
    e.execute("INSERT INTO photos (id, img) VALUES (2, beach)")
    val paths = e.execute("SELECT img FROM photos ORDER BY id").toOption.get
      .collect().map(_.getString(0))
    assert(paths(0).endsWith("cat.png"))
    assert(paths(1).endsWith("holiday_beach_2024.jpg"))
    assertThrows[DialectException](
      e.execute("INSERT INTO photos (id, img) VALUES (3, nosuch)"))
  }

  test("schema.json round-trips, including partition columns") {
    val tables = Map(
      "t1" -> Catalog.TableSpec(Seq("a" -> "INT", "b" -> "TEXT"), Seq("b")),
      "t2" -> Catalog.TableSpec(Seq("x" -> "IMAGE")))
    assert(Catalog.parseSchemaJson(Catalog.renderSchemaJson(tables)) == tables)
  }
}
