package graft.dialect

/** Typed statement AST for the reference dialect.
  *
  * The reference has no statement AST — each handler re-parses a flat
  * token stream (reference `pkg/parser/parser.go:10-14`). We parse once
  * into these nodes and lower them to DataFrame plans, which is what
  * lets Catalyst optimize (SURVEY.md §3 "Spark lifecycle mapping").
  */
sealed trait Statement

final case class Select(
    distinct: Boolean,
    projections: Seq[Projection],
    table: String,
    where: Option[Expr],
    groupBy: Option[String],
    having: Option[Expr],
    orderBy: Option[OrderBy],
    limit: Option[Int],
    offset: Option[Int]) extends Statement

sealed trait Projection { def alias: Option[String] }
/** `*` — expands to the table's schema columns. */
case object Star extends Projection { def alias: Option[String] = None }
final case class ColumnProj(name: String, alias: Option[String]) extends Projection
/** COUNT/SUM/AVG/MIN/MAX; arg=None means COUNT(*). Default output names
  * follow the reference: count, count_<col>, sum_<col>, avg_<col>,
  * min_<col>, max_<col> (reference `pkg/handlers/select.go:96-129`).
  */
final case class AggProj(func: String, arg: Option[String], alias: Option[String]) extends Projection {
  def outputName: String = alias.getOrElse(arg match {
    case None => "count"
    case Some(a) => s"${func.toLowerCase}_$a"
  })
}

final case class OrderBy(column: String, descending: Boolean)

/** Single-row INSERT (reference `pkg/handlers/insert.go:16-76`). */
final case class Insert(table: String, columns: Seq[String], values: Seq[String]) extends Statement
/** One SET column; WHERE is a single case-insensitive equality; absent
  * WHERE updates every row (reference `pkg/handlers/update.go:14-106`).
  */
final case class Update(table: String, setCol: String, setVal: String,
    where: Option[(String, String)]) extends Statement
/** WHERE is mandatory (reference `pkg/handlers/delete.go:30-34`). */
final case class Delete(table: String, whereCol: String, whereVal: String) extends Statement
final case class CreateTable(table: String, columns: Seq[(String, String)]) extends Statement
final case class DropTable(table: String) extends Statement
case object ShowTables extends Statement

// ---- boolean expression AST (reference pkg/expr/expr.go) ----

sealed trait Expr
final case class And(left: Expr, right: Expr) extends Expr
final case class Or(left: Expr, right: Expr) extends Expr
final case class Not(child: Expr) extends Expr
/** op ∈ {=, !=, <, <=, >, >=}. */
final case class Cmp(left: Operand, op: String, right: Operand) extends Expr
final case class In(operand: Operand, values: Seq[Operand]) extends Expr
final case class Between(operand: Operand, lo: Operand, hi: Operand) extends Expr
/** Only 4 shapes: %x% / x% / %x / exact (reference `expr.go:250-277`). */
final case class Like(operand: Operand, pattern: String) extends Expr
/** Bare identifier fallback: parses as `operand != false`
  * (reference `expr.go:514-517`).
  */
final case class Truthy(operand: Operand) extends Expr

sealed trait Operand
final case class ColRef(name: String) extends Operand
/** Literals stay strings; type coercion happens at comparison time,
  * mirroring the reference's normalize-then-compare semantics.
  */
final case class Lit(value: String, quoted: Boolean) extends Operand

object Expr {
  /** All column references in an expression — used to validate WHERE
    * against the schema before filtering (reference `expr.go:292-348`).
    */
  def collectColumns(e: Expr): Seq[String] = e match {
    case And(l, r) => collectColumns(l) ++ collectColumns(r)
    case Or(l, r) => collectColumns(l) ++ collectColumns(r)
    case Not(c) => collectColumns(c)
    case Cmp(l, _, r) => operandCols(l) ++ operandCols(r)
    case In(o, vs) => operandCols(o) ++ vs.flatMap(operandCols)
    case Between(o, lo, hi) => operandCols(o) ++ operandCols(lo) ++ operandCols(hi)
    case Like(o, _) => operandCols(o)
    case Truthy(o) => operandCols(o)
  }
  private def operandCols(o: Operand): Seq[String] = o match {
    case ColRef(n) => Seq(n)
    case _ => Nil
  }
}

final case class DialectException(message: String) extends RuntimeException(message)
