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
}

object SigOps {
  /** Column API: agree(sigA, sigB) → int. */
  def agree(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftColumns
    GraftColumns.column(ArrayLongAgree(GraftColumns.expression(a), GraftColumns.expression(b)))
  }
}
