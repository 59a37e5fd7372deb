package graft

import graft.nl.{Ollama, Patterns}
import graft.nl.Patterns.TableInfo
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The deterministic NL→SQL layer (reference N1/N3/N4/N5) — pure
  * functions, plus end-to-end through Engine.executeAny.
  */
class NlSpec extends AnyFunSuite {

  private val tables = Seq(
    TableInfo("students", Seq("id", "name", "course", "score")),
    TableInfo("orders", Seq("o_orderkey", "o_totalprice", "o_orderpriority")))

  // ---- N1 detection ----
  test("SQL statements are not natural language") {
    assert(!Patterns.isNaturalLanguage("SELECT * FROM t"))
    assert(!Patterns.isNaturalLanguage("insert into t (a) values (1)"))
    assert(!Patterns.isNaturalLanguage("DROP TABLE t"))
  }

  test("questions and conversational phrasings are natural language") {
    assert(Patterns.isNaturalLanguage("how many students are there?"))
    assert(Patterns.isNaturalLanguage("show me all the orders"))
    assert(Patterns.isNaturalLanguage("what is the average score"))
    assert(Patterns.isNaturalLanguage("remove students with score 0"))
  }

  // ---- N4 table matching ----
  test("table matching: direct mention, plural tolerant") {
    assert(Patterns.matchTable("how many students", tables, None).contains("students"))
    assert(Patterns.matchTable("count the order rows", tables, None).contains("orders"))
  }

  test("table matching: column-keyword overlap and previous-table fallback") {
    assert(Patterns.matchTable("average score per course", tables, None).contains("students"))
    assert(Patterns.matchTable("and among these, the best?", tables, Some("orders")).contains("orders"))
    assert(Patterns.matchTable("anything else", tables, Some("students")).contains("students"))
  }

  // ---- N3 statement patterns ----
  test("how many → COUNT(*)") {
    assert(Patterns.toSql("how many students?", tables)
      .contains("SELECT COUNT(*) FROM students"))
  }

  test("show all → SELECT *") {
    assert(Patterns.toSql("show me all students", tables)
      .contains("SELECT * FROM students"))
  }

  test("numeric where: op phrases bind column and number") {
    assert(Patterns.toSql("how many students with score more than 80", tables)
      .contains("SELECT COUNT(*) FROM students WHERE score > 80"))
    assert(Patterns.toSql("show students with score at least 90.5", tables)
      .contains("SELECT * FROM students WHERE score >= 90.5"))
  }

  test("string where via value sampling, with negation") {
    val sample = (t: String, c: String) =>
      if (t == "students" && c == "course") Seq("math", "physics") else Nil
    assert(Patterns.toSql("show students in math", tables, None, sample)
      .contains("SELECT * FROM students WHERE course = 'math'"))
    assert(Patterns.toSql("show students whose course is not physics", tables, None, sample)
      .contains("SELECT * FROM students WHERE course != 'physics'"))
  }

  test("update patterns: change/for and possessive") {
    assert(Patterns.toSql("change course to art for name is Bob", tables)
      .contains("UPDATE students SET course = 'art' WHERE name = 'Bob'"))
    assert(Patterns.toSql("update Ana's score to 99 in students", tables)
      .contains("UPDATE students SET score = '99' WHERE name = 'Ana'"))
  }

  test("delete and drop patterns") {
    assert(Patterns.toSql("remove students with course art", tables)
      .contains("DELETE FROM students WHERE course = 'art'"))
    assert(Patterns.toSql("drop the students table", tables)
      .contains("DROP TABLE students"))
  }

  test("no pattern → None") {
    assert(Patterns.toSql("tell me a joke", tables).isEmpty)
  }

  // ---- N2 response cleaning (no server needed) ----
  test("ollama response cleaning strips fences and picks the SQL line") {
    val raw = "Here you go:\n```sql\nSELECT * FROM t;\n```\nHope that helps!"
    assert(Ollama.cleanResponse(raw).contains("SELECT * FROM t"))
    assert(Ollama.cleanResponse("no sql here").isEmpty)
  }

  test("ollama disabled without env var") {
    assert(!Ollama.enabled)
    assert(Ollama.translate("how many students", tables).isEmpty)
  }

  // ---- end-to-end through the Engine ----
  test("executeAny: NL count against a real table") {
    val spark = SparkTestSession.spark
    val e = new Engine(spark, Files.createTempDirectory("graftnl").toString)
    e.execute("CREATE TABLE students (id INT, name TEXT, course TEXT, score DECIMAL)")
    e.execute("INSERT INTO students (id, name, course, score) VALUES (1, 'Ana', 'math', 90)")
    e.execute("INSERT INTO students (id, name, course, score) VALUES (2, 'Bo', 'art', 70)")
    val (sql, result) = e.executeAny("how many students with score more than 80?")
    assert(sql.contains("SELECT COUNT(*) FROM students WHERE score > 80"))
    assert(result.toOption.get.collect().head.getLong(0) == 1L)
    // string-value sampling end-to-end
    val (sql2, result2) = e.executeAny("show me all students in math")
    assert(sql2.contains("SELECT * FROM students WHERE course = 'math'"))
    assert(result2.toOption.get.collect().map(_.getString(1)).toSeq == Seq("Ana"))
  }
}
