package graft.exec

import graft.Tables
import graft.dialect._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lowers dialect `Select` statements to declarative DataFrame plans.
  *
  * The reference interprets every row through a fixed pipeline
  * (reference `pkg/handlers/select.go:17-598`); here each clause becomes
  * a Catalyst operator, so predicate pushdown / column pruning / partial
  * aggregation come from the optimizer (SURVEY.md §4) instead of being
  * absent. Dialect quirks preserved deliberately:
  *  - lenient GROUP BY injects COUNT(*) named `count` (A3)
  *  - AVG over an empty/non-numeric group is 0, not NULL (A7)
  *  - aggregate output naming: count, sum_<col>, … (P3)
  *  - projecting a missing column yields NULL, not an error (P1)
  *  - WHERE referencing an unknown column is an error (P4)
  *  - LIMIT/OFFSET applied on BOTH paths (fixes reference bug O4)
  */
final class Executor(resolveTable: String => DataFrame) {

  def sql(text: String): DataFrame = run(Parser.parse(text))

  def run(stmt: Statement): DataFrame = stmt match {
    case s: Select => select(s)
    case other =>
      throw DialectException(s"statement not executable as a query: ${other.getClass.getSimpleName}")
  }

  def select(s: Select): DataFrame = {
    val base = resolveTable(s.table)

    val filtered = s.where match {
      case Some(e) =>
        Semantics.validateColumns(e, base)
        base.filter(Semantics.toColumn(e, base))
      case None => base
    }

    val hasAgg = s.projections.exists(_.isInstanceOf[AggProj])
    val df =
      if (hasAgg || s.groupBy.isDefined) aggregatePath(s, filtered)
      else plainPath(s, filtered)

    val offsetted = s.offset.fold(df)(df.offset)
    s.limit.fold(offsetted)(offsetted.limit)
  }

  // ---- grouped / global aggregation (SURVEY §2.4) ----
  private def aggregatePath(s: Select, filtered: DataFrame): DataFrame = {
    val groupCol = s.groupBy.map(g => Semantics.resolve(filtered, g))

    // A11: a plain column under grouping must be the group column.
    s.projections.foreach {
      case ColumnProj(n, _) if !s.groupBy.exists(_.equalsIgnoreCase(n)) =>
        throw DialectException(s"cannot select non-aggregated column: $n")
      case Star if s.groupBy.isDefined =>
        throw DialectException("cannot select * with GROUP BY")
      case _ => ()
    }

    // A3: lenient GROUP BY — no aggregates in the projection injects
    // COUNT(*) named `count`.
    val aggProjs = {
      val declared = s.projections.collect { case a: AggProj => a }
      if (declared.isEmpty) Seq(AggProj("COUNT", None, None)) else declared
    }
    val aggCols = aggProjs.map(Semantics.aggColumn(_, filtered))

    val aggregated = groupCol match {
      case Some(g) =>
        val groupOut = s.projections.collectFirst {
          case ColumnProj(n, alias) if s.groupBy.exists(_.equalsIgnoreCase(n)) =>
            alias.getOrElse(n)
        }.getOrElse(s.groupBy.get)
        filtered.groupBy(g.as(groupOut)).agg(aggCols.head, aggCols.tail: _*)
      case None =>
        filtered.agg(aggCols.head, aggCols.tail: _*)
    }

    // A10: HAVING filters on the aggregated output; FUNC(col) references
    // were parsed to their default output names — remap to aliases.
    val havinged = s.having match {
      case Some(e) =>
        val renamed = renameAggRefs(e, aggProjs)
        Semantics.validateColumns(renamed, aggregated)
        aggregated.filter(Semantics.toColumn(renamed, aggregated))
      case None => aggregated
    }

    s.orderBy.fold(havinged) { ob =>
      havinged.orderBy(Semantics.sortKeysFor(havinged, ob.column, ob.descending): _*)
    }
  }

  /** Map default aggregate output names (count, sum_<col>, …) to the
    * user's aliases when present, mirroring the reference's textual
    * HAVING rewrite (reference `select.go:619-639`).
    */
  private def renameAggRefs(e: Expr, aggProjs: Seq[AggProj]): Expr = {
    val renames: Map[String, String] = aggProjs.flatMap { a =>
      val default = AggProj(a.func, a.arg, None).outputName
      a.alias.map(al => default.toLowerCase -> al)
    }.toMap
    def mapOperand(o: Operand): Operand = o match {
      case ColRef(n) => ColRef(renames.getOrElse(n.toLowerCase, n))
      case other => other
    }
    def walk(x: Expr): Expr = x match {
      case And(l, r) => And(walk(l), walk(r))
      case Or(l, r) => Or(walk(l), walk(r))
      case Not(c) => Not(walk(c))
      case Cmp(l, op, r) => Cmp(mapOperand(l), op, mapOperand(r))
      case In(o, vs) => In(mapOperand(o), vs)
      case Between(o, lo, hi) => Between(mapOperand(o), lo, hi)
      case Like(o, p) => Like(mapOperand(o), p)
      case Truthy(o) => Truthy(mapOperand(o))
    }
    walk(e)
  }

  // ---- plain SELECT (SURVEY §2.2/§2.6) ----
  private def plainPath(s: Select, filtered: DataFrame): DataFrame = {
    // (bare expression, aliased projection) pairs — window partition
    // specs need the bare form
    val proj: Seq[(Column, Column)] = s.projections.flatMap {
      case Star => filtered.columns.toSeq.map(c => (col(c), col(c)))
      case ColumnProj(n, alias) =>
        // P1: projecting a missing column yields NULL, not an error.
        val c = filtered.columns.find(_.equalsIgnoreCase(n))
          .map(col).getOrElse(lit(null).cast("string"))
        Seq((c, c.as(alias.getOrElse(n))))
      case a: AggProj =>
        throw DialectException(s"aggregate ${a.func} on non-aggregated path")
    }
    val projCols: Seq[Column] = proj.map(_._2)

    if (s.distinct) {
      // O5: DISTINCT dedupes the projected tuple. The reference sorts
      // then keeps first occurrences; identical projected rows are
      // interchangeable so distinct-then-sort is the same multiset.
      val d = filtered.select(projCols: _*).distinct()
      s.orderBy match {
        case Some(ob) if d.columns.exists(_.equalsIgnoreCase(ob.column)) =>
          d.orderBy(Semantics.sortKeysFor(d, ob.column, ob.descending): _*)
        case Some(ob) if filtered.columns.exists(_.equalsIgnoreCase(ob.column)) =>
          // Order column not in the projection: reproduce the
          // reference's sort-then-keep-first semantics (otherwise the
          // clause would silently vanish and LIMIT would pick an
          // arbitrary subset). row_number over the projected tuple
          // ordered by the sort key keeps each tuple's first
          // occurrence; that row still carries the sort column, so the
          // final order is its sort position.
          val keys = Semantics.sortKeysFor(filtered, ob.column, ob.descending)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(proj.map(_._1): _*).orderBy(keys: _*)
          filtered
            .withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1)
            .orderBy(keys: _*)
            .select(projCols: _*)
        case _ => d
      }
    } else {
      // ORDER BY runs on full rows (order column need not be projected),
      // then projection preserves the row order.
      val ordered = s.orderBy.fold(filtered) { ob =>
        filtered.orderBy(Semantics.sortKeysFor(filtered, ob.column, ob.descending): _*)
      }
      ordered.select(projCols: _*)
    }
  }
}

object Executor {
  /** Executor over the driver testdata layout. */
  def forDir(spark: SparkSession, dir: String): Executor =
    new Executor(name => Tables.load(spark, dir, name))

  def sql(spark: SparkSession, dir: String, text: String): DataFrame =
    forDir(spark, dir).sql(text)
}
