package graft

import graft.dialect.{Cmp, ColRef, Lit, Semantics}
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5 test plan item 3): the Column-tree
  * coercion comparator must agree with a direct Scala model of the
  * reference's normalize-then-compare semantics (numeric iff both sides
  * parse as doubles, else lexicographic on the string forms), and the
  * LIKE shape translation must agree with contains/starts/ends/exact.
  * Generation is ScalaCheck; evaluation batches all generated rows into
  * one DataFrame per predicate so the property run costs a handful of
  * Spark jobs, not hundreds.
  */
class CoercionPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val seed = rng.Seed(42L)

  private def sample[T](g: Gen[List[T]]): List[T] =
    g.apply(Gen.Parameters.default, seed).get

  // value pool: numeric strings, plain words, mixed, empty-ish
  private val valueGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1000, 1000).map(_.toString),
    Gen.choose(-100.0, 100.0).map(d => f"$d%.2f"),
    Gen.oneOf("abc", "zzz", "Ana", "10x", "x10", "true", "false", "NULL", "0", "00", "1e2"),
    Gen.alphaNumStr.map(_.take(6)))

  /** The reference model: ParseFloat both → numeric compare, else
    * lexicographic string compare (expr.go:121-154).
    */
  private def goCompare(l: String, op: String, r: String): Boolean = {
    val (ln, rn) = (l.toDoubleOption, r.toDoubleOption)
    def cmp[T](c: Int) = op match {
      case "=" => c == 0; case "!=" => c != 0
      case "<" => c < 0; case "<=" => c <= 0
      case ">" => c > 0; case ">=" => c >= 0
    }
    (ln, rn) match {
      case (Some(a), Some(b)) => cmp(a.compareTo(b))
      case _ => cmp(l.compareTo(r))
    }
  }

  test("coercion comparator agrees with the reference model on generated data") {
    val values = sample(Gen.listOfN(120, valueGen)).distinct
    val df = values.map(Tuple1(_)).toDF("v")
    val literals = Seq("50", "-3.25", "abc", "0", "zz", "10x")
    for (op <- Seq("=", "!=", "<", "<=", ">", ">="); litv <- literals) {
      val expr = Cmp(ColRef("v"), op, Lit(litv, quoted = true))
      val got = df.filter(Semantics.toColumn(expr, df))
        .collect().map(_.getString(0)).toSet
      val want = values.filter(goCompare(_, op, litv)).toSet
      assert(got == want, s"op=$op lit=$litv diff=${got.diff(want)}/${want.diff(got)}")
    }
  }

  test("BETWEEN agrees with the model (numeric iff all three parse)") {
    val values = sample(Gen.listOfN(100, valueGen)).distinct
    val df = values.map(Tuple1(_)).toDF("v")
    for ((lo, hi) <- Seq(("10", "200"), ("-5.5", "5.5"), ("a", "n"), ("10", "zz"))) {
      val expr = graft.dialect.Between(ColRef("v"), Lit(lo, true), Lit(hi, true))
      val got = df.filter(Semantics.toColumn(expr, df)).collect().map(_.getString(0)).toSet
      val want = values.filter { v =>
        (v.toDoubleOption, lo.toDoubleOption, hi.toDoubleOption) match {
          case (Some(x), Some(l), Some(h)) => x >= l && x <= h
          case _ => v >= lo && v <= hi
        }
      }.toSet
      assert(got == want, s"between $lo and $hi")
    }
  }

  test("numeric columns: string-regime compare and IN agree with the Go %v model") {
    val doubles = sample(Gen.listOfN(80, Gen.oneOf(
      Gen.choose(-1000, 1000).map(_.toDouble),
      Gen.choose(-100.0, 100.0),
      Gen.oneOf(72.0, 72.5, 0.0, 61.0, 95.0)))).distinct
    val df = doubles.map(Tuple1(_)).toDF("v")
    // Go fmt %v of float64: integral values render without the point
    // (independent model for the common range); the exotic notations
    // are pinned against a Go-output table in DialectSpec, so the
    // non-integral tail may reuse the engine's formatter here
    def goV(d: Double): String =
      // integral cutoff is 1e6: Go's %g uses e-notation from exponent 6
      if (d.isWhole && math.abs(d) < 1e6) d.toLong.toString
      else graft.dialect.Semantics.goVFormat(d)
    def cmpBool(c: Int, op: String) = op match {
      case "=" => c == 0; case "!=" => c != 0
      case "<" => c < 0; case "<=" => c <= 0
      case ">" => c > 0; case ">=" => c >= 0
    }
    for (op <- Seq("=", "!=", "<", "<=", ">", ">=");
         litv <- Seq("72.!", "abc", "72.0", "50", "zz", "")) {
      val expr = Cmp(ColRef("v"), op, Lit(litv, quoted = true))
      val got = df.filter(Semantics.toColumn(expr, df))
        .collect().map(_.getDouble(0)).toSet
      val want = doubles.filter { d =>
        litv.toDoubleOption match {
          case Some(b) => cmpBool(d.compareTo(b), op) // both parse → numeric
          case None => cmpBool(goV(d).compareTo(litv), op) // %v string regime
        }
      }.toSet
      assert(got == want, s"op=$op lit='$litv' diff=${got.diff(want)}/${want.diff(got)}")
    }
    // IN: membership of the %v rendering among RAW literal texts
    val inExpr = graft.dialect.In(ColRef("v"),
      List(Lit("72.0", true), Lit("72", false), Lit("-5", false), Lit("61.5", false)))
    val got = df.filter(Semantics.toColumn(inExpr, df)).collect().map(_.getDouble(0)).toSet
    val want = doubles.filter(d => Set("72.0", "72", "-5", "61.5").contains(goV(d))).toSet
    assert(got == want, s"IN diff=${got.diff(want)}/${want.diff(got)}")
  }

  test("LIKE shapes agree with contains/startsWith/endsWith/exact") {
    val words = sample(Gen.listOfN(80, Gen.oneOf(
      Gen.alphaStr.map(_.take(8)), Gen.oneOf("Anna", "banana", "An", "nA", "", "aa%a"))))
      .distinct
    val df = words.map(Tuple1(_)).toDF("v")
    val cores = Seq("a", "An", "na", "")
    for {
      core <- cores
      (pattern, model) <- Seq[(String, String => Boolean)](
        (s"%$core%", _.contains(core)),
        (s"$core%", _.startsWith(core)),
        (s"%$core", _.endsWith(core)),
        (core, _ == core))
    } {
      val got = df.filter(Semantics.like(col("v"), pattern))
        .collect().map(_.getString(0)).toSet
      assert(got == words.filter(model).toSet, s"pattern '$pattern'")
    }
  }
}
