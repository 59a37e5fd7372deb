package graft.dialect

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lowers the dialect's boolean-expression AST to Catalyst `Column`
  * trees, preserving the reference's coercion-first comparison
  * semantics (reference `pkg/expr/expr.go:121-154`, SURVEY.md P5):
  * compare numerically when BOTH sides parse as doubles, else compare
  * the stringified values lexicographically.
  *
  * Everything stays a composed built-in expression (`try_cast` + `when`)
  * so whole-stage codegen applies and the predicates remain visible to
  * Catalyst (SURVEY.md §7 "Built-in vs custom") — with ONE exception:
  * the exact Go-%v float renderer ([[goVFormat]]) runs as a scalar UDF
  * on the residual non-integral branch of the string regime, which is
  * already non-pushable by nature. `try_cast` keeps the semantics
  * independent of Spark 4's ANSI mode (a plain cast would throw on
  * 'abc').
  */
object Semantics {

  /** Stringified form of an operand — the `fmt.Sprintf("%v")` analogue. */
  private def str(o: Operand, df: DataFrame): Column = o match {
    case ColRef(n) => resolve(df, n).cast("string")
    case Lit(v, _) => lit(v)
  }

  /** Numeric view: null when the value doesn't parse as a double. */
  private def num(o: Operand, df: DataFrame): Column =
    str(o, df).try_cast("double")

  /** Exact Go `strconv.FormatFloat(v, 'g', -1, 64)` — what `fmt.Sprintf
    * ("%v", float64)` prints, and therefore what every reference
    * string-regime comparison sees (rows are JSON-decoded float64s):
    * shortest round-trip digits; e-notation iff the decimal exponent is
    * < -4 or >= 6 (strconv's shortest-mode eprec); two-digit signed
    * exponent; "-0", "NaN", "+Inf"/"-Inf". Spark's own rendering
    * diverges on all of: integral values ("10.0"), |v| in [1e6, 1e7)
    * non-integral, |v| >= 1e7, |v| < 1e-3, and -0.0.
    */
  private[graft] def goVFormat(v: Double): String = {
    if (v.isNaN) return "NaN"
    if (v == Double.PositiveInfinity) return "+Inf"
    if (v == Double.NegativeInfinity) return "-Inf"
    val neg = v < 0.0 || (v == 0.0 && 1.0 / v < 0.0)
    val a = math.abs(v)
    var digits = "0"; var decExp = 0
    if (a != 0.0) {
      // shortest digit string: smallest precision that parses back exactly
      var p = 1
      var done = false
      while (!done) {
        val s = String.format(java.util.Locale.ROOT, "%." + (p - 1) + "e",
          java.lang.Double.valueOf(a))
        if (p >= 17 || java.lang.Double.parseDouble(s) == a) {
          val i = s.indexOf('e')
          digits = s.substring(0, i).replace(".", "")
          decExp = s.substring(i + 1).toInt
          while (digits.length > 1 && digits.last == '0') digits = digits.init
          done = true
        }
        p += 1
      }
    }
    val sb = new StringBuilder
    if (neg) sb += '-'
    if (decExp < -4 || decExp >= 6) {
      sb ++= digits.substring(0, 1)
      if (digits.length > 1) { sb += '.'; sb ++= digits.substring(1) }
      sb += 'e'
      sb += (if (decExp < 0) '-' else '+')
      val ae = math.abs(decExp)
      if (ae < 10) sb += '0'
      sb ++= ae.toString
    } else if (decExp >= digits.length - 1) {
      sb ++= digits
      sb ++= "0" * (decExp - digits.length + 1)
    } else if (decExp >= 0) {
      sb ++= digits.substring(0, decExp + 1); sb += '.'; sb ++= digits.substring(decExp + 1)
    } else {
      sb ++= "0."; sb ++= "0" * (-decExp - 1); sb ++= digits
    }
    sb.toString
  }

  private lazy val goVUdf = udf((d: java.lang.Double) =>
    if (d == null) null else goVFormat(d.doubleValue))

  /** Go `%v` rendering of an operand as a Column. The integral fast
    * path stays a codegen'd when(); the residual non-integral branch is
    * the engine's ONLY UDF — confined to the string-comparison regime,
    * which is already non-pushable dual-regime dialect semantics. All
    * arithmetic runs on doubles so Spark 4 ANSI mode cannot overflow
    * (notably abs(Long.MinValue)).
    */
  private def goVStr(o: Operand, df: DataFrame): Column = o match {
    case ColRef(n) if isNumericCol(df, n) =>
      val d = resolve(df, n).cast("double")
      // bound 1e6, NOT 1e15: Go's %g shortest form switches to
      // e-notation at decimal exponent >= 6, so integral 1000000
      // renders "1e+06" — only integrals below that print as plain
      // digits. The last conjunct keeps -0.0 out of the fast path (Go
      // renders "-0"; Spark casts it to "-0.0", so the sign survives
      // the string rendering while === treats ±0 as equal)
      when(d === floor(d) && d > lit(-1e6) && d < lit(1e6)
          && (d =!= lit(0.0) || !d.cast("string").startsWith("-")),
        d.cast("long").cast("string"))
        .otherwise(goVUdf(d))
    case other => str(other, df)
  }

  /** Case-insensitive column resolution; unknown columns raise, matching
    * the reference's WHERE validation (reference `select.go:146-162`).
    */
  def resolve(df: DataFrame, name: String): Column = {
    val actual = df.columns.find(_.equalsIgnoreCase(name)).getOrElse(
      throw DialectException(s"unknown column: $name"))
    col(actual)
  }

  def validateColumns(e: Expr, df: DataFrame): Unit =
    Expr.collectColumns(e).foreach(resolve(df, _))

  /** WHERE/HAVING expression → boolean Column. */
  def toColumn(e: Expr, df: DataFrame): Column = e match {
    case And(l, r) => toColumn(l, df) && toColumn(r, df)
    case Or(l, r) => toColumn(l, df) || toColumn(r, df)
    case Not(c) => !toColumn(c, df)
    case Cmp(l, op, r) => cmp(l, op, r, df)
    case In(o, vs) =>
      // Reference semantics: membership by equality of `%v`-stringified
      // values (`expr.go:159-193`). Go's %v renders float64 10.0 as
      // "10", so for a NUMERIC column the reference behaves like
      // numeric equality — which is exactly `col.isin(doubles)`, and it
      // pushes to the scan. Our cast-to-string would render "10.0" and
      // miss; so the numeric specialization is both faster AND closer
      // to the reference. Non-numeric columns keep string membership.
      val listVals = vs.map {
        case Lit(v, _) => v
        case c: ColRef => throw DialectException(s"IN list must be literals, found column ${c.name}")
      }
      val colIsNum = o match {
        case ColRef(n) => isNumericCol(df, n)
        // the reference evaluates a literal left operand to its raw
        // text (only column refs hit the row), and IN compares raw
        // strings — so a literal left side NEVER goes numeric:
        // '10.0' IN ('10') is false there even though both parse
        case _: Lit => false
      }
      if (colIsNum && listVals.forall(isCanonicalNumericLiteral)) {
        // numeric equality == %v-string equality for canonical literals,
        // and this form pushes to the parquet scan. One stored-value
        // exception: -0.0 renders "-0" (never canonical), yet isin
        // treats it as equal to a literal 0 — exclude it when the list
        // contains zero (the extra conjunct ANDs beside the pushable
        // isin, so pushdown survives).
        val c = o match { case ColRef(n) => resolve(df, n); case Lit(v, _) => lit(v.toDouble) }
        val base = c.isin(listVals.map(_.toDouble): _*)
        if (listVals.exists(_.toDouble == 0.0)) {
          val d = c.cast("double")
          base && (d =!= lit(0.0) || !d.cast("string").startsWith("-"))
        } else base
      } else
        // reference semantics verbatim: %v-stringified membership
        goVStr(o, df).isin(listVals: _*)
    case Between(o, lo, hi) =>
      // inclusive; numeric iff all three parse (reference `expr.go:196-247`).
      // Same pushability specialization as cmp(): numeric col + numeric
      // bounds → plain between; any non-numeric bound → pure string range.
      val boundsNumeric = Seq(lo, hi).forall {
        case Lit(v, _) => v.toDoubleOption.isDefined
        case _ => false
      }
      val colIsNumeric = o match {
        case ColRef(n) => isNumericCol(df, n)
        case Lit(v, _) => v.toDoubleOption.isDefined
      }
      val someBoundNonNumeric = Seq(lo, hi).exists {
        case Lit(v, _) => v.toDoubleOption.isEmpty
        case _ => false
      }
      if (someBoundNonNumeric)
        goVStr(o, df) >= goVStr(lo, df) && goVStr(o, df) <= goVStr(hi, df)
      else if (colIsNumeric && boundsNumeric) {
        def b(x: Operand) = x match { case Lit(v, _) => lit(v.toDouble); case c: ColRef => resolve(df, c.name) }
        val v = o match { case ColRef(n) => resolve(df, n); case Lit(x, _) => lit(x.toDouble) }
        v >= b(lo) && v <= b(hi)
      } else {
        val (vn, ln, hn) = (num(o, df), num(lo, df), num(hi, df))
        val (vs, ls, hs) = (goVStr(o, df), goVStr(lo, df), goVStr(hi, df))
        when(vn.isNotNull && ln.isNotNull && hn.isNotNull, vn >= ln && vn <= hn)
          .otherwise(vs >= ls && vs <= hs)
      }
    case Like(o, pattern) => like(str(o, df), pattern)
    case Truthy(o) =>
      // bare identifier = `operand != false` (reference `expr.go:514-517`)
      cmp(o, "!=", Lit("false", quoted = false), df)
  }

  private def applyOp(op: String)(a: Column, b: Column): Column = op match {
    case "=" => a === b
    case "!=" => a =!= b
    case "<" => a < b
    case "<=" => a <= b
    case ">" => a > b
    case ">=" => a >= b
    case other => throw DialectException(s"unknown operator: $other")
  }

  private def isNumericCol(df: DataFrame, name: String): Boolean =
    df.schema.fields.find(_.name.equalsIgnoreCase(name))
      .exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])

  /** True when a literal's text IS the reference's `%v` rendering of
    * its float64 value, so numeric IN equality and the reference's
    * stringified-membership agree. `intcol IN (10.0)` must NOT match a
    * stored 10 — the reference compares "10" against "10.0" — so only
    * canonically-formatted literals ("10", "10.5") take the numeric
    * fast path; anything else ("10.0", "1e1", "010", "10.50", NaN/Inf,
    * "-0") falls back to string membership, which is the reference
    * semantics verbatim.
    */
  private def isCanonicalNumericLiteral(s: String): Boolean =
    s.toDoubleOption.exists { d =>
      // NaN/Inf: %v text matches itself but numeric equality differs
      // (NaN != NaN); "-0": renders "-0" yet equals +0 numerically —
      // both must stay on the string path
      java.lang.Double.isFinite(d) && !(d == 0.0 && 1.0 / d < 0) &&
        goVFormat(d) == s
    }

  /** Coercion comparison, specialized to a PUSHABLE plain predicate when
    * the dynamic dual-regime when() chain is provably equivalent:
    *  - numeric column vs numeric literal → both sides always parse, so
    *    the numeric branch always runs → plain `col op lit` (reaches the
    *    parquet scan as a pushed filter);
    *  - any operand vs a non-numeric literal → the numeric branch can
    *    never run (the literal never parses) → plain string comparison
    *    (pushable when the column is already a string).
    * Everything else (string/mixed columns vs numeric literals) keeps
    * the per-row dual regime — that dynamism is the reference semantics
    * and is inherently not pushable.
    */
  private def cmp(l: Operand, op: String, r: Operand, df: DataFrame): Column = {
    def litNumeric(o: Operand): Option[Boolean] = o match {
      case Lit(v, _) => Some(v.toDoubleOption.isDefined)
      case _ => None
    }
    def colNumeric(o: Operand): Boolean = o match {
      case ColRef(n) => isNumericCol(df, n)
      case Lit(v, _) => v.toDoubleOption.isDefined
    }
    val someLitNonNumeric =
      litNumeric(l).contains(false) || litNumeric(r).contains(false)
    if (someLitNonNumeric)
      // the numeric regime can never run (one side never parses), so
      // this is the reference's %v string compare — which renders a
      // numeric column Go-style ("72", not "72.0")
      applyOp(op)(goVStr(l, df), goVStr(r, df))
    else if (colNumeric(l) && colNumeric(r)) {
      def numExact(o: Operand): Column = o match {
        case ColRef(n) => resolve(df, n)
        case Lit(v, _) => lit(v.toDouble)
      }
      applyOp(op)(numExact(l), numExact(r))
    } else {
      val (ln, rn) = (num(l, df), num(r, df))
      when(ln.isNotNull && rn.isNotNull, applyOp(op)(ln, rn))
        .otherwise(applyOp(op)(goVStr(l, df), goVStr(r, df)))
    }
  }

  /** The reference's 4 LIKE shapes (`expr.go:250-277`): %x% → contains,
    * x% → startsWith, %x → endsWith, bare → exact equality. No `_`
    * wildcard, no interior `%` — we intentionally do NOT use
    * `Column.like`, which would be a superset.
    */
  def like(c: Column, pattern: String): Column = {
    val starts = pattern.startsWith("%")
    val ends = pattern.endsWith("%")
    val core = pattern.stripPrefix("%").stripSuffix("%")
    (starts, ends) match {
      case (true, true) => c.contains(core)
      case (false, true) => c.startsWith(core)
      case (true, false) => c.endsWith(core)
      case (false, false) => c === lit(core)
    }
  }

  // ---- aggregates with reference dialect rules (SURVEY §2.4) ----

  /** SUM over values that coerce to numbers; non-numeric silently
    * skipped; empty → 0 (Go float64 accumulator starts at 0,
    * reference `select.go:285-297`).
    */
  def aggColumn(p: AggProj, df: DataFrame): Column = {
    def numArg(a: String) = resolve(df, a).cast("string").try_cast("double")
    val c = (p.func, p.arg) match {
      case ("COUNT", None) => count(lit(1))
      case ("COUNT", Some(a)) => count(resolve(df, a))
      case ("SUM", Some(a)) => coalesce(sum(numArg(a)), lit(0.0))
      case ("AVG", Some(a)) => coalesce(avg(numArg(a)), lit(0.0)) // A7: empty → 0, not NULL
      case ("MIN", Some(a)) => min(numArg(a))
      case ("MAX", Some(a)) => max(numArg(a))
      case (f, a) => throw DialectException(s"unsupported aggregate $f($a)")
    }
    c.as(p.outputName)
  }

  /** Mixed-type sort key (reference `select.go:516-533`): numeric pairs
    * compare numerically, everything else lexicographically. The
    * reference's per-pair comparator is non-transitive; we use the
    * two-level key (numeric value, string value) with non-numerics
    * after numerics — identical on cleanly-typed columns.
    */
  def sortKeys(c: Column, descending: Boolean): Seq[Column] = {
    val n = c.cast("string").try_cast("double")
    val s = c.cast("string")
    if (descending) Seq(n.desc_nulls_last, s.desc) else Seq(n.asc_nulls_last, s.asc)
  }

  /** Schema-aware sort: a numeric column always takes the numeric
    * branch of the reference comparator, so a plain single-key sort is
    * equivalent (and avoids the double-cast sort key).
    */
  def sortKeysFor(df: DataFrame, name: String, descending: Boolean): Seq[Column] = {
    val c = resolve(df, name)
    if (isNumericCol(df, name)) Seq(if (descending) c.desc else c.asc)
    else sortKeys(c, descending)
  }
}
