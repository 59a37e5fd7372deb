package graft

import graft.dialect._
import graft.exec.Executor
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Dialect semantics ported from the reference's own tests
  * (`pkg/parser/parser_test.go`, `pkg/expr/expr_test.go`,
  * `pkg/handlers/select_*_test.go`) — they define the dialect.
  */
class DialectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val students: DataFrame = Seq(
    (1L, "Alice", "math", 95.0),
    (2L, "Bob", "math", 72.0),
    (3L, "Amy", "physics", 88.0),
    (4L, "Carol", "physics", 61.0),
    (5L, "Andy", "data science", 77.0)
  ).toDF("id", "name", "course", "score")

  private def exec(tables: Map[String, DataFrame]): Executor =
    new Executor(n => tables.getOrElse(n,
      throw DialectException(s"table not found: $n")))

  private lazy val ex = exec(Map("students" -> students))

  // ---- lexer (parser_test.go golden tokens) ----
  test("tokenizer splits a SELECT with LIKE into the expected stream") {
    val toks = Lexer.tokenize("SELECT * FROM users WHERE name LIKE 'A%'")
    assert(toks.map(_.text) == Vector("SELECT", "*", "FROM", "users", "WHERE", "name", "LIKE", "A%"))
    assert(toks.last.quoted)
  }

  test("tokenizer handles odd spacing and punctuation") {
    val toks = Lexer.tokenize("select  id,name FROM t WHERE a!=1 AND b<=2;")
    assert(toks.map(_.text) == Vector("select", "id", ",", "name", "FROM", "t",
      "WHERE", "a", "!=", "1", "AND", "b", "<=", "2", ";"))
  }

  test("empty input errors") {
    assertThrows[DialectException](Parser.parse(""))
    assertThrows[DialectException](Parser.parse("   ;  "))
  }

  // ---- expression eval truth (expr_test.go) ----
  private def filterIds(whereClause: String): Set[Long] = {
    val df = ex.sql(s"SELECT id FROM students WHERE $whereClause")
    df.collect().map(_.getLong(0)).toSet
  }

  test("expr: id = 1") {
    assert(filterIds("id = 1") == Set(1L))
  }

  test("expr: LIKE 'A%' AND comparison") {
    assert(filterIds("name LIKE 'A%' AND score > 80") == Set(1L, 3L))
  }

  test("expr: BETWEEN 50 AND 100") {
    assert(filterIds("score BETWEEN 50 AND 100") == Set(1L, 2L, 3L, 4L, 5L))
    assert(filterIds("score BETWEEN 70 AND 90") == Set(2L, 3L, 5L))
  }

  test("expr: NOT (a = 0 OR b = 3) AND (a < 5)") {
    assert(filterIds("NOT (id = 2 OR id = 3) AND (id < 5)") == Set(1L, 4L))
  }

  test("expr: IN list") {
    assert(filterIds("course IN ('math', 'physics')") == Set(1L, 2L, 3L, 4L))
  }

  test("expr: all four LIKE shapes") {
    assert(filterIds("name LIKE '%o%'") == Set(2L, 4L))   // contains
    assert(filterIds("name LIKE 'A%'") == Set(1L, 3L, 5L)) // startsWith
    assert(filterIds("name LIKE '%y'") == Set(3L, 5L))    // endsWith
    assert(filterIds("name LIKE 'Bob'") == Set(2L))       // exact
  }

  test("expr: IN on a numeric column matches Go %v rendering exactly") {
    // Reference inOp.Eval (expr.go:164-193) compares %v-stringified row
    // values against RAW literal text: stored 95.0 renders "95", so the
    // literal must be in canonical form to match — '95' and 95 do,
    // '72.0' does NOT (stored 72.0 renders "72", "72" != "72.0").
    assert(filterIds("score IN (95, '72.0')") == Set(1L))
    assert(filterIds("score IN ('95', 72)") == Set(1L, 2L))
    assert(filterIds("score IN (95.0)") == Set.empty) // "95" != "95.0"
    assert(filterIds("score IN ('010', 61.5)") == Set.empty)
  }

  test("expr: string-regime comparisons render numeric columns Go-%v style") {
    // score 72.0 renders "72" (not "72.0"): "72" < "72.!" is true while
    // "72.0" < "72.!" is false ('0' > '!'), so the rendering decides
    assert(filterIds("score < '72.!'") == Set(2L, 4L))
    assert(filterIds("score BETWEEN '6!' AND '72.!'") == Set(2L, 4L))
  }

  test("expr: IN keeps the numeric fast path for canonical decimals") {
    val halves = Seq((1L, 61.5), (2L, 72.25)).toDF("id", "score")
    val e = exec(Map("students" -> halves))
    def ids(w: String): Set[Long] =
      e.sql(s"SELECT id FROM students WHERE $w").collect().map(_.getLong(0)).toSet
    assert(ids("score IN (61.5)") == Set(1L))      // canonical non-integral
    assert(ids("score IN ('72.25', 5)") == Set(2L))
    assert(ids("score IN (61.50)") == Set.empty)   // "61.5" != "61.50"
  }

  test("goVFormat matches Go strconv %v across notations") {
    import graft.dialect.Semantics.goVFormat
    // expected strings are Go fmt.Sprintf("%v", x) outputs: shortest
    // digits, e-notation iff exponent < -4 or >= 6
    val cases = Seq(
      0.0 -> "0", -0.0 -> "-0", 10.0 -> "10", -42.0 -> "-42",
      10.5 -> "10.5", 61.5 -> "61.5", 0.1 -> "0.1",
      1.0 / 3.0 -> "0.3333333333333333",
      0.0005 -> "0.0005", 0.00005 -> "5e-05", 1.5e-8 -> "1.5e-08",
      123456.0 -> "123456", 999999.5 -> "999999.5",
      1000000.0 -> "1e+06", 1234567.0 -> "1.234567e+06",
      12345678.5 -> "1.23456785e+07", 1e15 -> "1e+15",
      9007199254740992.0 -> "9.007199254740992e+15", 1e21 -> "1e+21",
      1e100 -> "1e+100", -2.5e-7 -> "-2.5e-07",
      Double.NaN -> "NaN",
      Double.PositiveInfinity -> "+Inf", Double.NegativeInfinity -> "-Inf")
    cases.foreach { case (d, want) =>
      assert(goVFormat(d) == want, s"goVFormat($d)")
    }
  }

  test("expr: string-regime rendering is Go-%v even for scientific/tiny values") {
    // a parsing literal would take the NUMERIC regime, so every
    // assertion here forces the string regime: IN lists holding a
    // non-numeric member, or comparisons against non-parsing text
    val exotic = Seq((1L, 1234567.5), (2L, 0.0005), (3L, 0.00005),
      (4L, -0.0), (5L, 1000000.0)).toDF("id", "score")
    val e = exec(Map("students" -> exotic))
    def ids(w: String): Set[Long] =
      e.sql(s"SELECT id FROM students WHERE $w").collect().map(_.getLong(0)).toSet
    assert(ids("score IN ('1.2345675e+06', 'x')") == Set(1L))
    assert(ids("score IN ('0.0005', 'x')") == Set(2L))
    assert(ids("score IN ('5e-05', 'x')") == Set(3L))
    assert(ids("score IN ('-0', 'x')") == Set(4L))
    // integral 1e6 must render "1e+06", NOT "1000000"
    assert(ids("score IN ('1e+06', 'x')") == Set(5L))
    // lexicographic >= '1e': "1e+06" (prefix match, longer) and
    // "5e-05" ('5' > '1') qualify; "1.2345675e+06" has '.' < 'e' at
    // position 1, "1000000" would have '0' < 'e' — so a wrong plain
    // rendering of id 5 makes this fail
    assert(ids("score >= '1e'") == Set(3L, 5L))
  }

  test("expr: IN with a literal left operand is raw-text membership") {
    val df = Seq(Tuple1(1L)).toDF("id")
    val e = exec(Map("students" -> df))
    def hit(w: String): Boolean =
      e.sql(s"SELECT id FROM students WHERE $w").collect().nonEmpty
    // reference evaluates a literal operand to its raw text: "10.0" is
    // not in {"10"} even though both parse numerically
    assert(!hit("'10.0' IN ('10')"))
    assert(hit("'10' IN ('10', '20')"))
    assert(hit("10.0 IN ('10.0')")) // raw text matches itself
  }

  test("expr: coercion — numeric when both sides parse, else lexicographic") {
    val mixed = Seq(Tuple1("10"), Tuple1("9"), Tuple1("abc")).toDF("v")
    val e = exec(Map("t" -> mixed))
    val got = e.sql("SELECT v FROM t WHERE v > 9").collect().map(_.getString(0)).toSet
    // '10' > 9 numerically; 'abc' > '9' lexicographically (Go ParseFloat fails → string cmp)
    assert(got == Set("10", "abc"))
  }

  test("ORDER BY on mixed-type strings: numeric-parsing values sort numerically first") {
    val mixed = Seq(Tuple1("10"), Tuple1("9"), Tuple1("abc"), Tuple1("2")).toDF("v")
    val e = exec(Map("t" -> mixed))
    val got = e.sql("SELECT v FROM t ORDER BY v").collect().map(_.getString(0)).toSeq
    // documented two-level key: numerics ascending (2 < 9 < 10, not
    // lexicographic), non-numerics after
    assert(got == Seq("2", "9", "10", "abc"))
  }

  test("HAVING on agg output combined with ORDER BY the agg name") {
    val rows = ex.sql(
      "SELECT course, AVG(score) FROM students GROUP BY course HAVING AVG(score) > 70 ORDER BY avg_score DESC")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("math", "data science", "physics"))
  }

  // ---- SELECT pipeline (select_*_test.go) ----
  test("integration: GROUP BY course with COUNT(*) AS cnt") {
    val rows = ex.sql("SELECT course, COUNT(*) AS cnt FROM students GROUP BY course")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("math" -> 2L, "physics" -> 2L, "data science" -> 1L))
  }

  test("integration: DISTINCT with LIKE") {
    val rows = ex.sql("SELECT DISTINCT course FROM students WHERE name LIKE 'A%'")
      .collect().map(_.getString(0)).toSet
    assert(rows == Set("math", "physics", "data science"))
  }

  test("edge: projection happy path returns all rows") {
    val rows = ex.sql("SELECT id, name FROM students").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(1)).toSet == Set("Alice", "Bob", "Amy", "Carol", "Andy"))
  }

  test("edge: empty table yields header only (0 rows)") {
    val empty = students.limit(0)
    val e = exec(Map("students" -> empty))
    assert(e.sql("SELECT * FROM students").collect().isEmpty)
  }

  test("edge: projecting a missing column yields NULL, not an error") {
    val rows = ex.sql("SELECT name, nickname FROM students").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.isNullAt(1)))
  }

  test("edge: WHERE on unknown column is an error") {
    assertThrows[DialectException](
      ex.sql("SELECT * FROM students WHERE nope = 1").collect())
  }

  test("negative: missing FROM is an error") {
    assertThrows[DialectException](Parser.parse("SELECT id students"))
  }

  test("negative: lenient GROUP BY without aggregates returns a count column") {
    val df = ex.sql("SELECT course FROM students GROUP BY course")
    assert(df.columns.contains("count"))
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("math") == 2L)
  }

  test("grouping guard: non-aggregated column errors") {
    assertThrows[DialectException](
      ex.sql("SELECT name, COUNT(*) FROM students GROUP BY course"))
  }

  // ---- aggregate naming + HAVING ----
  test("aggregate default output names: count, sum_<col>, avg_<col>") {
    val df = ex.sql("SELECT course, COUNT(*), SUM(score), AVG(score), MIN(score), MAX(score) FROM students GROUP BY course")
    assert(df.columns.toSeq == Seq("course", "count", "sum_score", "avg_score", "min_score", "max_score"))
  }

  test("HAVING on aggregate call syntax") {
    val rows = ex.sql("SELECT course, COUNT(*) FROM students GROUP BY course HAVING COUNT(*) >= 2")
      .collect().map(_.getString(0)).toSet
    assert(rows == Set("math", "physics"))
  }

  test("HAVING remaps to user alias") {
    val rows = ex.sql("SELECT course, COUNT(*) AS cnt FROM students GROUP BY course HAVING COUNT(*) = 1")
      .collect().map(_.getString(0)).toSet
    assert(rows == Set("data science"))
  }

  test("global aggregation without GROUP BY") {
    val r = ex.sql("SELECT COUNT(*), AVG(score) FROM students").collect().head
    assert(r.getLong(0) == 5L)
    assert(math.abs(r.getDouble(1) - 78.6) < 1e-9)
  }

  test("AVG over empty group is 0, not NULL (A7)") {
    val r = ex.sql("SELECT AVG(score) FROM students WHERE id > 99").collect().head
    assert(!r.isNullAt(0) && r.getDouble(0) == 0.0)
  }

  // ---- order / limit / offset / distinct ----
  test("ORDER BY DESC with LIMIT and OFFSET on the plain path (fixes O4)") {
    val names = ex.sql("SELECT name FROM students ORDER BY score DESC LIMIT 2 OFFSET 1")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("Amy", "Andy"))
  }

  test("ORDER BY column not in projection still orders output") {
    val names = ex.sql("SELECT name FROM students ORDER BY score")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("Carol", "Bob", "Andy", "Amy", "Alice"))
  }

  test("LIMIT on aggregated path") {
    val rows = ex.sql("SELECT course, COUNT(*) FROM students GROUP BY course ORDER BY course LIMIT 2")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("data science", "math"))
  }

  // ---- DML/DDL statement parsing ----
  test("INSERT parses columns and values") {
    val i = Parser.parse("INSERT INTO t (a, b) VALUES (1, 'x')").asInstanceOf[Insert]
    assert(i.table == "t" && i.columns == Seq("a", "b") && i.values == Seq("1", "x"))
  }

  test("INSERT count mismatch errors") {
    assertThrows[DialectException](Parser.parse("INSERT INTO t (a, b) VALUES (1)"))
  }

  test("UPDATE parses SET and WHERE equality") {
    val u = Parser.parse("UPDATE t SET a = 'v' WHERE b = 'w'").asInstanceOf[Update]
    assert(u.setCol == "a" && u.setVal == "v" && u.where.contains(("b", "w")))
  }

  test("DELETE requires WHERE") {
    assertThrows[DialectException](Parser.parse("DELETE FROM t"))
    val d = Parser.parse("DELETE FROM t WHERE a = 'v'").asInstanceOf[Delete]
    assert(d.whereCol == "a" && d.whereVal == "v")
  }

  test("CREATE TABLE validates types") {
    val c = Parser.parse("CREATE TABLE t (a INT, b TEXT, c DECIMAL, d BOOL, e IMAGE)").asInstanceOf[CreateTable]
    assert(c.columns.map(_._2) == Seq("INT", "TEXT", "DECIMAL", "BOOL", "IMAGE"))
    assertThrows[DialectException](Parser.parse("CREATE TABLE t (a BLOB)"))
  }

  test("DISTINCT with ORDER BY on a non-projected column keeps sort semantics") {
    // reference sorts full rows then dedupes; the order must not vanish
    val names = ex.sql("SELECT DISTINCT course FROM students ORDER BY score DESC LIMIT 2")
      .collect().map(_.getString(0)).toSeq
    // highest scores: Alice(math,95), Amy(physics,88) → math, physics
    assert(names == Seq("math", "physics"))
  }
}
