package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Full MinHash signature of a document in ONE zero-allocation byte scan —
  * a native Catalyst Expression with codegen (prompt preference (b)).
  *
  * Semantics are bit-identical to the composable plan
  * (TextOps.shingles → 16 × min((h·a_j + b_j) mod P)): 3-gram hash
  * h = c₁·961 + c₂·31 + c₃ over ASCII-lowercased bytes; duplicates are
  * harmless because MIN is idempotent. The expression replaces
  * |docs|·|len| exploded rows (and their substring allocations — the GC
  * bottleneck that capped multi-core scaling) with a tight register loop
  * per row.
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashFn.sig(input.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MinHashFn.sig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashFn {
  val P = 2147483647L
  // must match graft.dedup.Dedup.hashA/hashB
  def a(j: Int): Long = 1000003L + 999983L * j
  def b(j: Int): Long = 7L + 104729L * j

  /** public static so generated code can call it. ASCII text takes the
    * zero-allocation byte scan; any non-ASCII byte falls back to lowercased
    * CODE POINTS (TextCodePoints), matching the composable plan's
    * lower()+ascii(substring) semantics — UTF-8 bytes with ASCII-only
    * lowercasing would silently diverge from the SQL oracle on non-ASCII
    * documents. */
  def sig(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    val n = bytes.length
    var ascii = true
    while (i < n && ascii) { if ((bytes(i) & 0x80) != 0) ascii = false; i += 1 }
    if (!ascii) return sigCodePoints(TextCodePoints.lowered(s), k, mins)
    i = 0
    while (i + 2 < n) {
      val c1 = lower(bytes(i)); val c2 = lower(bytes(i + 1)); val c3 = lower(bytes(i + 2))
      val h = c1 * 961L + c2 * 31L + c3
      var j = 0
      while (j < k) {
        val v = (h * (1000003L + 999983L * j) + (7L + 104729L * j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      any = true
      i += 1
    }
    if (!any) new GenericArrayData(Array.empty[Long]) else new GenericArrayData(mins)
  }

  private def sigCodePoints(cps: Array[Int], k: Int, mins: Array[Long]): ArrayData = {
    val n = cps.length
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    var i = 0
    while (i + 2 < n) {
      val h = cps(i) * 961L + cps(i + 1) * 31L + cps(i + 2)
      var j = 0
      while (j < k) {
        val v = (h * (1000003L + 999983L * j) + (7L + 104729L * j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  @inline private def lower(b: Byte): Long = {
    val c = b & 0xff
    if (c >= 'A' && c <= 'Z') (c + 32).toLong else c.toLong
  }
}

object MinHash {
  /** Column API: minhash_sig(text, k) → array<long> of k signature rows. */
  def minhashSig(c: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftshim.GraftColumns
    GraftColumns.column(MinHashSignature(GraftColumns.expression(c), numHashes))
  }
}
