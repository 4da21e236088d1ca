package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Positional agreement count of two long arrays — the MinHash
  * signature-similarity estimator (# of j with sigA[j] == sigB[j]).
  *
  * A native codegen Expression because it sits on the hottest row stream in
  * the engine: every LSH band collision evaluates it, and band collisions
  * are quadratic on similarity-saturated corpora. The equivalent
  * `aggregate(zip_with(...))` higher-order functions run INTERPRETED in
  * Spark — an allocation + virtual-call per element per pair — which made
  * the dedup verify stage the slowest query in the round-1 bench. */
case class ArrayLongAgree(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayAgreeFn.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ArrayAgreeFn.agree($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayLongAgree =
    copy(left = newLeft, right = newRight)
}

object ArrayAgreeFn {
  /** public static so generated code can call it */
  def agree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** two-pointer merge count over sorted distinct int arrays; public
    * static so generated code can call it */
  def sortedOverlap(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** [[sortedOverlap]] with a threshold-aware EARLY EXIT: returns the exact
    * overlap when J = c/(na+nb−c) can still round (5 dp) to ≥ `threshold`,
    * or -1 the moment the upper bound c + min(remaining_a, remaining_b)
    * provably cannot — at which point the caller's `≥ threshold` filter
    * would discard the pair anyway, so the result set is IDENTICAL while
    * the merge skips the tail of every clearly-subthreshold pair (the bulk
    * of LSH band collisions on similarity-saturated corpora). The bound is
    * slacked by the 5-dp rounding margin (t − 5·10⁻⁶), so a pair at
    * exactly the threshold can never be dropped. J is monotone in c, so
    * cmax < t'(na+nb)/(1+t') ⟺ Jmax < t' is exact in integers-vs-double.
    * Public static so generated code can call it. */
  def sortedOverlapAtLeast(a: ArrayData, b: ArrayData, threshold: Double): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    val t = threshold - 5e-6 // rounded(J, 5) >= t  ⇐  J >= t - 5e-6
    val need = t * (na + nb) / (1 + t) // c below this ⟹ J below t
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
      if (c + math.min(na - i, nb - j) < need) return -1
    }
    c
  }
}

/** |A ∩ B| of two SORTED distinct int arrays by linear merge — the exact
  * set-intersection size the pair-level Jaccard verify needs, with zero
  * per-row allocation. The built-in `array_intersect` builds a hash set and
  * an output array per row; on millions of candidate pairs that allocation
  * (not the comparison) dominates the verify stage. */
case class SortedIntArrayOverlap(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayAgreeFn.sortedOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ArrayAgreeFn.sortedOverlap($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntArrayOverlap =
    copy(left = newLeft, right = newRight)
}

/** [[SortedIntArrayOverlap]] with the threshold-aware early exit of
  * [[ArrayAgreeFn.sortedOverlapAtLeast]]: -1 when the pair provably cannot
  * round to J ≥ threshold, the exact overlap otherwise. The threshold is a
  * literal baked into the generated code, not a child expression. */
case class SortedOverlapAtLeast(left: Expression, right: Expression, threshold: Double)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayAgreeFn.sortedOverlapAtLeast(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.ArrayAgreeFn.sortedOverlapAtLeast($a, $b, ${threshold}D)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapAtLeast =
    copy(left = newLeft, right = newRight)
}

object SigOps {
  import org.apache.spark.sql.graftshim.GraftColumns
  /** Column API: agree(sigA, sigB) → int (positional, long arrays). */
  def agree(a: Column, b: Column): Column =
    GraftColumns.column(ArrayLongAgree(GraftColumns.expression(a), GraftColumns.expression(b)))
  /** Column API: sortedOverlap(hsA, hsB) → int (|A∩B| of sorted int arrays). */
  def sortedOverlap(a: Column, b: Column): Column =
    GraftColumns.column(SortedIntArrayOverlap(GraftColumns.expression(a), GraftColumns.expression(b)))
  /** Column API: sortedOverlapAtLeast(hsA, hsB, t) → int (overlap, or -1
    * when J cannot round to ≥ t — early-exit merge). */
  def sortedOverlapAtLeast(a: Column, b: Column, threshold: Double): Column =
    GraftColumns.column(SortedOverlapAtLeast(
      GraftColumns.expression(a), GraftColumns.expression(b), threshold))
}
