package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared text→code-point scan for the hashing expressions: lowercased code
  * points with the semantics of the built-in `lower()` + `ascii(substring)`
  * pipeline, so every custom expression stays bit-compatible with its
  * composable-plan and SQL-oracle mirrors on non-ASCII input too. ASCII text
  * (the common case for web corpora after language filtering) takes a
  * zero-copy byte path. */
object TextCodePoints {
  /** lowercased code points of s. */
  def lowered(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    var i = 0
    val n = bytes.length
    var ascii = true
    while (i < n) {
      if ((bytes(i) & 0x80) != 0) { ascii = false; i = n }
      i += 1
    }
    if (ascii) {
      val out = new Array[Int](n)
      i = 0
      while (i < n) {
        val c = bytes(i) & 0xff
        out(i) = if (c >= 'A' && c <= 'Z') c + 32 else c
        i += 1
      }
      out
    } else {
      // matches lower(text): UTF8String.toLowerCase, then per-char code points
      s.toLowerCase.toString.codePoints().toArray
    }
  }
}

/** All k-gram polynomial hashes of lower(text), one per window position:
  * h_i = Σ_{j<k} cp_{i+j}·31^{k-1-j} mod P (P = 2³¹−1), computed as a true
  * rolling hash in ONE scan — a native Catalyst Expression with codegen.
  * The bounded-mod arithmetic is exactly portable to the SQL oracle
  * (Σ ascii·31^j % P per window), unlike a wrapping 64-bit Java hash.
  * Winnowing fingerprint selection consumes this (TextOps.winnow). */
case class KGramHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    KGramHashFn.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.KGramHashFn.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): KGramHashes =
    copy(child = newChild)
}

object KGramHashFn {
  val P = 2147483647L

  /** public static so generated code can call it */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    val cps = TextCodePoints.lowered(s)
    val n = cps.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var pow = 1L // 31^(k-1) mod P
    var j = 1
    while (j < k) { pow = pow * 31L % P; j += 1 }
    var h = 0L
    var i = 0
    while (i < n) {
      if (i >= k) h = (h + P - cps(i - k) * pow % P) % P
      h = (h * 31L + cps(i)) % P
      if (i >= k - 1) out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

object KGram {
  /** Column API: kgram_hashes(text, k) → array<long>, 0-indexed by window
    * start. */
  def kgramHashes(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.GraftColumns
    GraftColumns.column(KGramHashes(GraftColumns.expression(c), k))
  }
}
