package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

object RankExpressions {
  /** Bucket id of `c` under the non-decreasing `cuts` — the codegen'd
    * replacement for the interpreted per-row cut fold.
    */
  def cut_bucket(c: Column, cuts: Seq[Double]): Column =
    GraftColumnBridge.column(CutBucket(GraftColumnBridge.expression(c), cuts))
}
