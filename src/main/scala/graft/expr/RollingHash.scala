package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string — the document-fingerprinting
  * primitive (k-gram hashes for winnowing). A native Catalyst Expression
  * with codegen: stays inside whole-stage codegen instead of a Scala UDF's
  * serialize/invoke boundary (prompt preference order (b)).
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    RollingHash64Fn.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.RollingHash64Fn.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64Fn {
  /** h₀ = seed; h = 31·h + byte — operates on UTF-8 bytes for locale
    * independence. Public static so generated code can call it. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    h
  }
}

object RollingHash {
  /** Column API: rolling_hash64(str). */
  def rollingHash64(c: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftColumns
    GraftColumns.column(RollingHash64(GraftColumns.expression(c)))
  }
}
