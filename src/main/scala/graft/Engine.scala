package graft

import graft.catalog.Catalog
import graft.dialect.{Delete, DropTable, Parser, Select, Statement, Update}
import graft.exec.{Dml, Executor}
import graft.functions.ImageResolver
import graft.nl.{Ollama, Patterns}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The REPL-equivalent surface (reference `main.go:29-121`): one entry
  * point that routes a statement string to query execution (SELECT → a
  * DataFrame) or DML/DDL (→ a status message), plus the `SET IMAGE DIR`
  * session command (reference `main.go:88-101`).
  */
final class Engine(val spark: SparkSession, dbPath: String,
    ollama: graft.nl.Ollama.Config = graft.nl.Ollama.Config()) {
  val catalog = new Catalog(spark, dbPath)
  private val dml = new Dml(catalog)
  val executor = new Executor(name => catalog.load(name))

  private val setImageDir = """(?i)^\s*SET\s+IMAGE\s+DIR\s+(.+?)\s*;?\s*$""".r
  private val showImageDir = """(?i)^\s*SHOW\s+IMAGE\s+DIR\s*;?\s*$""".r
  private val explainStmt = """(?i)^\s*EXPLAIN\s+(.+)$""".r

  /** Execute one statement: Right = query result, Left = status text. */
  def execute(input: String): Either[String, DataFrame] = input match {
    case setImageDir(dir) =>
      ImageResolver.setImageDir(dir.trim.stripPrefix("'").stripSuffix("'"))
      Left(s"image directory set")
    case showImageDir() =>
      Left(ImageResolver.getImageDir.getOrElse("image directory not set"))
    case explainStmt(inner) =>
      // beyond-reference: surface the Catalyst physical plan for any
      // dialect SELECT — the tool for checking that a predicate pushed
      // down or a join broadcast, same as PlanSpec asserts in CI
      Parser.parse(inner) match {
        case s: Select => Left(executor.select(s).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        case _ => Left("EXPLAIN supports only SELECT statements")
      }
    case _ =>
      Parser.parse(input) match {
        case s: Select => Right(executor.select(s))
        case other: Statement => Left(dml.run(other))
      }
  }

  /** Drop every cached plan. The dedup/similarity operators persist
    * their signature tables (CacheManager holds them until unpersist,
    * GC never reclaims Dataset caches) — a long-running service should
    * call this periodically or after heavy pipeline queries.
    */
  def clearCaches(): Unit = spark.catalog.clearCache()

  /** True when a statement is destructive (mutates or drops data) —
    * NL-generated SQL of these kinds is confirmation-gated, mirroring
    * the reference's gate on LLM output (reference `main.go:292-303`).
    */
  def isDestructive(sql: String): Boolean =
    try Parser.parse(sql) match {
      case _: Update | _: Delete | _: DropTable => true
      case _ => false
    } catch { case _: Exception => false }

  /** Full Spark SQL over the catalog tables (beyond-reference escape
    * hatch: the dialect preserves reference quirks, this gives users
    * the whole ANSI/Spark surface — joins, windows, CTEs — on the same
    * data).
    */
  def sparkSql(query: String): DataFrame = {
    catalog.registerAll()
    spark.sql(query)
  }

  // ---- natural-language front-end (SURVEY §2.12) ----

  def tableInfos: Seq[Patterns.TableInfo] =
    catalog.listTables.map(t => Patterns.TableInfo(t, catalog.columnsOf(t).map(_._1)))

  /** ≤40 distinct stringified values of a column, for the N5 heuristics
    * (the reference samples 40 rows).
    */
  private def sampleValues(table: String, column: String): Seq[String] =
    catalog.load(table).select(col(column).cast("string")).na.drop()
      .distinct().limit(40).collect().map(_.getString(0)).toSeq

  /** NL → dialect SQL: deterministic patterns first, then the optional
    * Ollama path (disabled unless GRAFT_OLLAMA_URL is set). None = no
    * translation found.
    */
  def naturalToSql(input: String, prevTable: Option[String] = None): Option[String] =
    Patterns.toSql(input, tableInfos, prevTable, sampleValues)
      .orElse(Ollama.translate(input, tableInfos, ollama))

  /** Route anything: natural language is translated then executed; SQL
    * executes directly. Returns the generated SQL alongside the result
    * so callers can surface it (the reference confirmation-gates it).
    */
  def executeAny(input: String): (Option[String], Either[String, DataFrame]) =
    if (Patterns.isNaturalLanguage(input)) {
      naturalToSql(input) match {
        case Some(sql) => (Some(sql), execute(sql))
        case None => (None, Left("could not translate to SQL"))
      }
    } else (None, execute(input))
}
