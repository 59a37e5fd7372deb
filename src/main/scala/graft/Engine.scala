package graft

import graft.catalog.Catalog
import graft.dialect.{Parser, Select, Statement}
import graft.exec.{Dml, Executor}
import graft.functions.ImageResolver
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The REPL-equivalent surface (reference `main.go:29-121`): one entry
  * point that routes a statement string to query execution (SELECT → a
  * DataFrame) or DML/DDL (→ a status message), plus the `SET IMAGE DIR`
  * session command (reference `main.go:88-101`).
  */
final class Engine(val spark: SparkSession, dbPath: String) {
  val catalog = new Catalog(spark, dbPath)
  private val dml = new Dml(catalog)
  val executor = new Executor(name => catalog.load(name))

  private val setImageDir = """(?i)^\s*SET\s+IMAGE\s+DIR\s+(.+?)\s*;?\s*$""".r
  private val showImageDir = """(?i)^\s*SHOW\s+IMAGE\s+DIR\s*;?\s*$""".r

  /** Execute one statement: Right = query result, Left = status text. */
  def execute(input: String): Either[String, DataFrame] = input match {
    case setImageDir(dir) =>
      ImageResolver.setImageDir(dir.trim.stripPrefix("'").stripSuffix("'"))
      Left(s"image directory set")
    case showImageDir() =>
      Left(ImageResolver.getImageDir.getOrElse("image directory not set"))
    case _ =>
      Parser.parse(input) match {
        case s: Select => Right(executor.select(s))
        case other: Statement => Left(dml.run(other))
      }
  }
}
