package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native expression for the two-level distributed rank machinery
  * (Layout.orderStats / Behavior.exactTile): assign a row to its
  * rough-cut bucket.
  *
  * Semantics: the number of cut points strictly below the input —
  * term-for-term what the previous `aggregate(cuts, 0, (acc, c) =>
  * acc + when(x > c, 1).otherwise(0))` fold computed (NULL and NaN
  * inputs yield bucket 0, exactly like the coalesce'd fold). The HOF
  * fold evaluated its lambda interpreted per row per cut (63 boxed
  * steps — the measured majority of the operators' scan time), and
  * the static when-sum expansion that fixes the executor side blows
  * the PLAN up instead (63 CaseWhens duplicated into every consumer —
  * a planner tax that tripled q_rfm's driver gap). One expression
  * node with a codegen'd binary search fixes both: O(log n cuts) per
  * row, constant plan size. Cuts must be non-decreasing (always true
  * for percentile cut arrays — enforced at construction).
  */
case class CutBucket(child: Expression, cuts: Seq[Double])
    extends UnaryExpression {
  require(cuts.forall(c => !c.isNaN), "cuts must be NaN-free")
  require(cuts.isEmpty || cuts.sliding(2).forall(w =>
    w.size < 2 || !(w(0) > w(1))), "cuts must be non-decreasing")

  override def prettyName: String = "cut_bucket"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double input, got ${child.dataType}")

  @transient private lazy val sortedCuts: Array[Double] = cuts.toArray

  // count of cuts strictly below x = lower-bound index of x in the
  // non-decreasing cut array. Spark's double comparison orders NaN
  // ABOVE every non-NaN value, so the fold put NaN keys in the top
  // bucket — replicated here by the explicit NaN branch (Java's
  // primitive compare would silently send NaN to bucket 0 instead).
  private def bucketOf(x: Double): Int = {
    if (java.lang.Double.isNaN(x)) return sortedCuts.length
    var lo = 0
    var hi = sortedCuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sortedCuts(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else bucketOf(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("cuts", sortedCuts, "double[]")
    val c = child.genCode(ctx)
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = 0;
      if (!${c.isNull}) {
        if (java.lang.Double.isNaN(${c.value})) {
          ${ev.value} = $arr.length;
        } else {
          int $lo = 0;
          int $hi = $arr.length;
          while ($lo < $hi) {
            int $mid = ($lo + $hi) >>> 1;
            if ($arr[$mid] < ${c.value}) { $lo = $mid + 1; } else { $hi = $mid; }
          }
          ${ev.value} = $lo;
        }
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** TRUE iff every element of `probes` (array<long>) occurs in the
  * SORTED distinct `sorted` (array<long>) — the codegen'd replacement
  * for `forall(probes, p => array_contains(sorted, p))`, which paid an
  * interpreted lambda per probe times a LINEAR array scan per
  * membership test (the q_bloom_join probe stage: 600 k rows × k
  * probes × |bit set|). Binary search per probe; inputs must be
  * non-null-element arrays and `sorted` ascending (both hold by
  * construction for the Bloom bit-set representation).
  */
case class AllInSortedArray(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "all_in_sorted_array"
  override def dataType: DataType = BooleanType

  private def elemOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left) && elemOk(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val probes = l.asInstanceOf[ArrayData]
    val sorted = r.asInstanceOf[ArrayData]
    val n = sorted.numElements()
    var i = 0
    while (i < probes.numElements()) {
      val p = probes.getLong(i)
      var lo = 0
      var hi = n - 1
      var found = false
      while (lo <= hi && !found) {
        val mid = (lo + hi) >>> 1
        val v = sorted.getLong(mid)
        if (v == p) found = true
        else if (v < p) lo = mid + 1
        else hi = mid - 1
      }
      if (!found) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val Seq(ok, i, p, lo, hi, mid, v, found) =
        Seq("ok", "i", "p", "lo", "hi", "mid", "v", "found").map(ctx.freshName)
      s"""
         |boolean $ok = true;
         |for (int $i = 0; $ok && $i < $l.numElements(); $i++) {
         |  long $p = $l.getLong($i);
         |  int $lo = 0;
         |  int $hi = $r.numElements() - 1;
         |  boolean $found = false;
         |  while ($lo <= $hi && !$found) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    long $v = $r.getLong($mid);
         |    if ($v == $p) { $found = true; }
         |    else if ($v < $p) { $lo = $mid + 1; }
         |    else { $hi = $mid - 1; }
         |  }
         |  $ok = $found;
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object RankExpressions {
  /** Bucket id of `c` under the non-decreasing `cuts` — the codegen'd
    * replacement for the interpreted per-row cut fold.
    */
  def cut_bucket(c: Column, cuts: Seq[Double]): Column =
    GraftColumnBridge.column(CutBucket(GraftColumnBridge.expression(c), cuts))

  /** All probe longs present in a sorted distinct long array — the
    * codegen'd forall/array_contains replacement.
    */
  def all_in_sorted_array(probes: Column, sorted: Column): Column =
    GraftColumnBridge.column(AllInSortedArray(
      GraftColumnBridge.expression(probes), GraftColumnBridge.expression(sorted)))
}
