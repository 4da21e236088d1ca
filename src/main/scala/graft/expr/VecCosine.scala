package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two numeric vectors (array<float> or array<double>)
  * in double precision — a native codegen Expression, because the cosine
  * verify sits on the ANN/near-dup CANDIDATE stream, where the equivalent
  * `aggregate`/`zip_with` higher-order functions run interpreted (an
  * allocation + virtual call per element per pair).
  *
  * Arithmetic order matches the composable plan exactly (sequential
  * left-to-right sums, dot/(√na·√nb)), so swapping it in changes no output
  * bit. */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecCosineFn.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.VecCosineFn.cos($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object VecCosineFn {
  /** public static so generated code can call it */
  def cos(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    // norms run over each vector's FULL length, the dot over the common
    // prefix. For EQUAL-length inputs (the only shape the engine produces)
    // this is bit-identical to the zip_with/aggregate composable plan; for
    // ragged inputs the composable plan returns null (zip_with pads with
    // null and `acc + null` nulls the aggregate) while this returns the
    // common-prefix number — do not rely on the equivalence off fixed dims
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < a.numElements()) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      na += x * x; i += 1
    }
    var nb = 0.0
    i = 0
    while (i < b.numElements()) {
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

object VecOps {
  /** Column API: cosine(a, b) → double. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftColumns
    GraftColumns.column(VecCosine(GraftColumns.expression(a), GraftColumns.expression(b)))
  }
}
