package graft.dialect

import graft.dialect.Lexer.Token

/** Recursive-descent parser for the reference dialect.
  *
  * Statement grammar per SURVEY.md §2.9/§2.2; the boolean-expression
  * grammar is Or → And → Not → Comparison → Primary, matching reference
  * `pkg/expr/expr.go:403-549`.
  */
object Parser {

  def parse(sql: String): Statement = {
    val toks = Lexer.tokenize(sql).filterNot(t => !t.quoted && t.text == ";")
    if (toks.isEmpty) throw DialectException("empty statement")
    new Parser(toks).statement()
  }

  /** Parse just a boolean expression (WHERE/HAVING body). */
  def parseExpression(text: String): Expr = {
    val toks = Lexer.tokenize(text)
    if (toks.isEmpty) throw DialectException("empty expression")
    val p = new Parser(toks)
    val e = p.expression()
    p.expectEnd()
    e
  }
}

private final class Parser(toks: Vector[Token]) {
  private var pos = 0

  private def peek: Option[Token] = if (pos < toks.length) Some(toks(pos)) else None
  private def next(): Token = {
    if (pos >= toks.length) throw DialectException("unexpected end of statement")
    val t = toks(pos); pos += 1; t
  }
  private def isKw(kw: String): Boolean = peek.exists(t => !t.quoted && t.upper == kw)
  private def takeKw(kw: String): Boolean = { val m = isKw(kw); if (m) pos += 1; m }
  private def expectKw(kw: String): Unit =
    if (!takeKw(kw)) throw DialectException(s"expected $kw" + peek.map(t => s", found '${t.text}'").getOrElse(""))
  private def ident(): String = {
    val t = next()
    if (!t.quoted && "(),".contains(t.text)) throw DialectException(s"expected identifier, found '${t.text}'")
    stripQuotes(t.text)
  }
  private def stripQuotes(s: String): String = s.stripPrefix("`").stripSuffix("`").stripPrefix("\"").stripSuffix("\"")
  def expectEnd(): Unit =
    if (pos < toks.length) throw DialectException(s"unexpected token '${toks(pos).text}'")

  def statement(): Statement = {
    val t = peek.getOrElse(throw DialectException("empty statement"))
    t.upper match {
      case "SELECT" => selectStmt()
      case "INSERT" => insertStmt()
      case "UPDATE" => updateStmt()
      case "DELETE" => deleteStmt()
      case "CREATE" => createStmt()
      case "DROP" => dropStmt()
      case "SHOW" => { next(); expectKw("TABLES"); ShowTables }
      case other => throw DialectException(s"unknown command: $other")
    }
  }

  // ---- SELECT ----
  private val clauseKw = Set("FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET")

  private def selectStmt(): Select = {
    expectKw("SELECT")
    val distinct = takeKw("DISTINCT")
    val projections = projectionList()
    expectKw("FROM")
    val table = ident()
    val where = if (takeKw("WHERE")) Some(expression()) else None
    val groupBy = if (takeKw("GROUP")) { expectKw("BY"); Some(ident()) } else None
    val having = if (takeKw("HAVING")) Some(expression()) else None
    val orderBy = if (takeKw("ORDER")) {
      expectKw("BY")
      val c = ident()
      val desc = takeKw("DESC") || { takeKw("ASC"); false }
      Some(OrderBy(c, desc))
    } else None
    val limit = if (takeKw("LIMIT")) Some(intTok("LIMIT")) else None
    val offset = if (takeKw("OFFSET")) Some(intTok("OFFSET")) else None
    expectEnd()
    Select(distinct, projections, table, where, groupBy, having, orderBy, limit, offset)
  }

  private def intTok(clause: String): Int = {
    val t = next()
    try t.text.toInt
    catch { case _: NumberFormatException => throw DialectException(s"$clause expects an integer, found '${t.text}'") }
  }

  private def projectionList(): Seq[Projection] = {
    val out = Seq.newBuilder[Projection]
    var done = false
    while (!done) {
      out += projection()
      if (!takeKw(",")) done = true
    }
    out.result()
  }

  private val aggFuncs = Set("COUNT", "SUM", "AVG", "MIN", "MAX")

  private def projection(): Projection = {
    val t = next()
    if (!t.quoted && t.text == "*") return Star
    val name = t.text
    if (!t.quoted && aggFuncs.contains(t.upper) && isKw("(")) {
      next() // (
      val arg = {
        val a = next()
        if (!a.quoted && a.text == "*") None else Some(stripQuotes(a.text))
      }
      expectKw(")")
      if (arg.isEmpty && t.upper != "COUNT")
        throw DialectException(s"${t.upper}(*) is not supported")
      AggProj(t.upper, arg, aliasOpt())
    } else ColumnProj(stripQuotes(name), aliasOpt())
  }

  private def aliasOpt(): Option[String] =
    if (takeKw("AS")) Some(ident()) else None

  // ---- INSERT INTO t (c1,…) VALUES (v1,…) ----
  private def insertStmt(): Insert = {
    expectKw("INSERT"); expectKw("INTO")
    val table = ident()
    expectKw("(")
    val cols = commaList(() => ident())
    expectKw(")")
    expectKw("VALUES")
    expectKw("(")
    val vals = commaList(() => next().text)
    expectKw(")")
    expectEnd()
    if (cols.length != vals.length)
      throw DialectException(s"column count ${cols.length} does not match value count ${vals.length}")
    Insert(table, cols, vals)
  }

  private def commaList[T](one: () => T): Seq[T] = {
    val out = Seq.newBuilder[T]
    out += one()
    while (takeKw(",")) out += one()
    out.result()
  }

  // ---- UPDATE t SET c = v [WHERE c2 = v2] ----
  private def updateStmt(): Update = {
    expectKw("UPDATE")
    val table = ident()
    expectKw("SET")
    val setCol = ident()
    expectKw("=")
    val setVal = next().text
    val where = if (takeKw("WHERE")) {
      val c = ident(); expectKw("="); Some((c, next().text))
    } else None
    expectEnd()
    Update(table, setCol, setVal, where)
  }

  // ---- DELETE FROM t WHERE c = v (WHERE mandatory) ----
  private def deleteStmt(): Delete = {
    expectKw("DELETE"); expectKw("FROM")
    val table = ident()
    if (!takeKw("WHERE"))
      throw DialectException("DELETE requires a WHERE clause")
    val c = ident(); expectKw("=")
    val d = Delete(table, c, next().text)
    expectEnd()
    d
  }

  // ---- CREATE TABLE t (c TYPE, …) ----
  private def createStmt(): CreateTable = {
    expectKw("CREATE"); expectKw("TABLE")
    val table = ident()
    expectKw("(")
    val cols = commaList { () =>
      val n = ident(); val ty = ident().toUpperCase
      if (!Set("INT", "TEXT", "DECIMAL", "BOOL", "IMAGE").contains(ty))
        throw DialectException(s"invalid column type: $ty")
      (n, ty)
    }
    expectKw(")")
    expectEnd()
    CreateTable(table, cols)
  }

  private def dropStmt(): DropTable = {
    expectKw("DROP"); expectKw("TABLE")
    val d = DropTable(ident())
    expectEnd()
    d
  }

  // ---- boolean expressions: Or → And → Not → Comparison → Primary ----
  def expression(): Expr = orExpr()

  private def orExpr(): Expr = {
    var left = andExpr()
    while (isKw("OR")) { next(); left = Or(left, andExpr()) }
    left
  }

  private def andExpr(): Expr = {
    var left = notExpr()
    while (isKw("AND")) { next(); left = And(left, notExpr()) }
    left
  }

  private def notExpr(): Expr =
    if (takeKw("NOT")) Not(notExpr()) else comparison()

  private def comparison(): Expr = {
    if (isKw("(")) {
      next()
      val e = orExpr()
      expectKw(")")
      return e
    }
    val left = operand()
    peek match {
      case Some(t) if !t.quoted && Set("=", "!=", "<", "<=", ">", ">=").contains(t.text) =>
        next(); Cmp(left, t.text, operand())
      case Some(t) if !t.quoted && t.upper == "IN" =>
        next(); expectKw("(")
        val vs = commaList(() => operand())
        expectKw(")")
        In(left, vs)
      case Some(t) if !t.quoted && t.upper == "BETWEEN" =>
        next()
        val lo = operand()
        expectKw("AND")
        Between(left, lo, operand())
      case Some(t) if !t.quoted && t.upper == "LIKE" =>
        next()
        val p = next()
        Like(left, p.text)
      case _ => Truthy(left)
    }
  }

  private def operand(): Operand = {
    val t = next()
    // HAVING references aggregates by call syntax; resolve to the
    // default output name (count, sum_<col>, …) like the reference's
    // textual rewrite (reference `select.go:619-639`). The executor
    // remaps to user aliases afterwards.
    if (!t.quoted && aggFuncs.contains(t.upper) && isKw("(")) {
      next() // (
      val a = next()
      expectKw(")")
      val argOpt = if (!a.quoted && a.text == "*") None else Some(stripQuotes(a.text))
      return ColRef(AggProj(t.upper, argOpt, None).outputName)
    }
    if (t.quoted) Lit(t.text, quoted = true)
    else if (t.text.nonEmpty && (t.text.head.isDigit || (t.text.length > 1 && (t.text.head == '-' || t.text.head == '+') && t.text(1).isDigit)))
      Lit(t.text, quoted = false)
    else if (!t.quoted && Set("TRUE", "FALSE", "NULL").contains(t.upper))
      Lit(t.text.toLowerCase, quoted = false)
    else ColRef(stripQuotes(t.text))
  }
}
