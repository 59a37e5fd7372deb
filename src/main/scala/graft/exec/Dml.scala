package graft.exec

import graft.catalog.Catalog
import graft.dialect._
import graft.functions.ImageResolver
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** DML/DDL execution against a Catalog (SURVEY.md §2.9 D1–D7).
  *
  * Update/Delete are read → transform → staged-overwrite: Spark cannot
  * mutate parquet in place, so this mirrors the reference's temp-file +
  * atomic-rename write path at dataset granularity.
  */
final class Dml(catalog: Catalog) {

  /** Execute a DML/DDL statement; returns a human-readable summary like
    * the reference REPL does.
    */
  def run(stmt: Statement): String = stmt match {
    case i: Insert => insert(i)
    case u: Update => update(u)
    case d: Delete => delete(d)
    case c: CreateTable =>
      catalog.create(c.table, c.columns)
      s"table ${c.table} created"
    case d: DropTable =>
      catalog.drop(d.table)
      s"table ${d.table} dropped"
    case ShowTables =>
      catalog.listTables.mkString("\n")
    case s: Select =>
      throw DialectException("SELECT is a query; use Executor")
  }

  /** D1/D2: single-row INSERT with per-declared-type coercion
    * (reference `pkg/handlers/insert.go:152-180`) and IMAGE path
    * resolution (insert.go:183-226).
    */
  def insert(i: Insert): String = {
    val declared = catalog.columnsOf(i.table)
    val declaredNames = declared.map(_._1)
    // validate column names case-insensitively (insert.go:142-149)
    val resolved = i.columns.map { c =>
      declaredNames.find(_.equalsIgnoreCase(c)).getOrElse(
        throw DialectException(s"unknown column: $c"))
    }
    if (resolved.distinct.length != resolved.length)
      throw DialectException("duplicate column in INSERT")
    val byName = resolved.zip(i.values).toMap
    val values: Seq[Any] = declared.map { case (name, tpe) =>
      byName.get(name) match {
        case None => null // omitted column → NULL cell (SURVEY §1)
        case Some(raw) => coerce(raw, tpe, name)
      }
    }
    val row = Row.fromSeq(values)
    val df = catalog.spark.createDataFrame(
      java.util.List.of(row), catalog.sparkSchema(i.table))
    catalog.append(i.table, df)
    "1 row inserted"
  }

  private def coerce(raw: String, tpe: String, colName: String): Any = tpe match {
    case "INT" =>
      try raw.toLong
      catch { case _: NumberFormatException =>
        throw DialectException(s"invalid INT value for $colName: $raw") }
    case "DECIMAL" =>
      try raw.toDouble
      catch { case _: NumberFormatException =>
        throw DialectException(s"invalid DECIMAL value for $colName: $raw") }
    case "BOOL" => raw.toLowerCase match {
      case "true" | "1" => true
      case "false" | "0" => false
      case _ => throw DialectException(s"invalid BOOL value for $colName: $raw")
    }
    case "IMAGE" => ImageResolver.resolve(raw)
    case _ => raw
  }

  /** D3: one SET column; WHERE is a single case-insensitive equality on
    * stringified values; no WHERE updates every row (reference
    * `pkg/handlers/update.go`). Divergence from the reference: the new
    * value is coerced to the declared column type — typed parquet
    * storage cannot hold the reference's always-a-string writes.
    */
  def update(u: Update): String = {
    val declared = catalog.columnsOf(u.table)
    val setCol = declared.find(_._1.equalsIgnoreCase(u.setCol)).getOrElse(
      throw DialectException(s"unknown column: ${u.setCol}"))
    val df = catalog.load(u.table)
    val newVal = lit(coerce(u.setVal, setCol._2, setCol._1))
    val cond = u.where match {
      case Some((wc, wv)) =>
        val wcol = declared.find(_._1.equalsIgnoreCase(wc)).getOrElse(
          throw DialectException(s"unknown column: $wc"))
        lower(col(wcol._1).cast("string")) === lit(wv.toLowerCase)
      case None => lit(true)
    }
    val n = df.filter(cond).count()
    val updated = df.withColumn(setCol._1,
      when(cond, newVal).otherwise(col(setCol._1)))
    catalog.overwrite(u.table, updated)
    s"$n rows updated"
  }

  /** D4: DELETE with mandatory single-equality WHERE, case-insensitive
    * value match (reference `pkg/handlers/delete.go`). A NULL cell in
    * the WHERE column never matches (the SURVEY §7 NULL-equivalence
    * decision: the reference persists nil as the string "NULL",
    * storage.go:56-61; this engine stores real NULLs and a NULL
    * matches nothing, same as UPDATE's WHERE) — the kept-set filter
    * must coalesce the three-valued comparison to "keep", or a NULL
    * row silently vanishes from a delete that did not match it (found
    * by the r11 DML fuzzer: `n rows deleted` said 0 while the row
    * count dropped).
    */
  def delete(d: Delete): String = {
    val declared = catalog.columnsOf(d.table)
    val wcol = declared.find(_._1.equalsIgnoreCase(d.whereCol)).getOrElse(
      throw DialectException(s"unknown column: ${d.whereCol}"))
    val df = catalog.load(d.table)
    val cond = lower(col(wcol._1).cast("string")) === lit(d.whereVal.toLowerCase)
    val n = df.filter(cond).count()
    catalog.overwrite(d.table, df.filter(!coalesce(cond, lit(false))))
    s"$n rows deleted"
  }
}
