package graft.core

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable synopses for cardinality and frequency at web scale — the
  * sketch family a 10^12-row profile pass runs INSTEAD of exact
  * distinct/groupBy when the key space itself (URLs, tokens, entity
  * surfaces) is too large to shuffle:
  *
  *  - [[KMinValues]] / [[kmvDistinct]] — KMV distinct-value estimation
  *    (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07): keep the k
  *    smallest distinct hash values; D̂ = (k−1)·M/h₍k₎ over hash domain M.
  *  - [[countMin]] / [[countMinEstimate]] — Count-Min frequency sketch
  *    (Cormode & Muthukrishnan, J.Alg 2005): depth×width counter grid,
  *    point estimate = min over rows, one-sided error (est ≥ truth).
  *
  * Both hash with [[Determinism.md5Int]] (48-bit, portable to the DuckDB
  * oracle via [[Determinism.md5IntDuck]]) so every cell and every kept
  * value is bit-reproducible across engines, runs, and parallelism — the
  * estimates are data-keyed arithmetic, not samples. Exact-count sibling
  * for the sub-threshold regime: `Frequency.heavyHitters` (Misra–Gries).
  */
object Sketches {

  /** Hash-domain size of [[Determinism.md5Int]]: 2^48. */
  val HashDomain: Long = 1L << 48

  /** Bounded-state typed Aggregator keeping the k smallest DISTINCT values
    * of a Long column — O(k) state per group, map-side combinable, so the
    * per-group distinct-hash stream never shuffles (only k-value synopses
    * do). Buffer is a sorted ascending array ≤ k long; reduce is a binary
    * search + bounded insert, merge is a sorted-merge cut at k. */
  final class KMinValues(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 1, "KMV needs k >= 1")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], v: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, v)
      if (pos >= 0) buf // already kept
      else {
        val ins = -pos - 1
        if (ins >= k) buf // larger than the kth smallest — irrelevant
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = v
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      var last = Long.MinValue
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (o == 0 || v != last) { out(o) = v; o = o + 1; last = v }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Distinct-value estimate per group: hash `itemCol` with md5Int, run the
    * bounded [[KMinValues]] aggregate, derive the estimator columns. Output
    * per group: `n_kept` (synopsis fill ≤ k), `kth_hash` (h₍k₎, null while
    * under-full), `est_distinct` (EXACT distinct-hash count when the
    * synopsis isn't full — the sketch has seen everything — else
    * (k−1)·2^48 div h₍k₎, integer-exact in both engines), and
    * `exact_distinct` (the full countDistinct over HASHES, kept on the row
    * as the gate's ruler — it is the shuffle the sketch exists to avoid, so
    * production callers drop it; ≡ distinct items modulo 48-bit
    * collisions, which both engines share by construction). */
  def kmvDistinct(items: DataFrame, itemCol: String, groupCols: Seq[String],
                  k: Int = 64): DataFrame = {
    val kmv = udaf(new KMinValues(k), org.apache.spark.sql.Encoders.scalaLong)
    val hashed = items
      .select((groupCols.map(col) :+
        Determinism.md5Int(col(itemCol)).as("hv")): _*)
    val numer = (k - 1).toLong * HashDomain
    hashed.groupBy(groupCols.map(col): _*)
      .agg(kmv(col("hv")).as("kmins"),
        countDistinct(col("hv")).as("exact_distinct"))
      .select((groupCols.map(col) ++ Seq(
        size(col("kmins")).as("n_kept"),
        when(size(col("kmins")) < k, lit(null).cast("long"))
          .otherwise(get(col("kmins"), lit(k - 1))).as("kth_hash"),
        when(size(col("kmins")) < k, size(col("kmins")).cast("long"))
          .otherwise(expr(s"${numer}L div get(kmins, ${k - 1})"))
          .as("est_distinct"),
        col("exact_distinct"))): _*)
  }

  /** Count-Min counter grid over every OCCURRENCE of `itemCol`: rows
    * 0..depth−1, bucket_j(x) = md5Int(j || '|' || x) mod width. ONE
    * aggregate — the depth-way fan-out is a broadcast cross join (depth
    * rows), the groupBy is map-side combinable into ≤ depth·width cells, so
    * a billion-key frequency table collapses to a broadcastable synopsis
    * without ever shuffling the key space. Output: (cm_row, cm_bucket,
    * cnt), absent cells ≡ 0. */
  def countMin(items: DataFrame, itemCol: String,
               depth: Int = 4, width: Int = 512): DataFrame = {
    val spark = items.sparkSession
    val rows = spark.range(depth).select(col("id").cast("int").as("cm_row"))
    items.select(col(itemCol).cast("string").as("item"))
      .crossJoin(broadcast(rows))
      .select(col("cm_row"),
        pmod(Determinism.md5Int(
          concat(col("cm_row").cast("string"), lit("|"), col("item"))),
          lit(width.toLong)).cast("int").as("cm_bucket"))
      .groupBy(col("cm_row"), col("cm_bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a query-item set against a [[countMin]] sketch:
    * est(x) = min_j cell(j, bucket_j(x)), missing cells read as 0. The
    * sketch side is the broadcast (≤ depth·width rows); the query side
    * stays distributed, so estimating a million keys is a map-side probe.
    * CMS guarantee: `cm_est` ≥ true count, over-estimation bounded by
    * collisions (≤ 2N/width with prob 1 − 2^−depth). */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
                       depth: Int = 4, width: Int = 512): DataFrame = {
    val spark = queries.sparkSession
    val rows = spark.range(depth).select(col("id").cast("int").as("cm_row"))
    val probes = queries.select(col(itemCol).cast("string").as("item")).distinct()
      .crossJoin(broadcast(rows))
      .select(col("item"), col("cm_row"),
        pmod(Determinism.md5Int(
          concat(col("cm_row").cast("string"), lit("|"), col("item"))),
          lit(width.toLong)).cast("int").as("cm_bucket"))
    probes
      .join(broadcast(sketch.select(col("cm_row"), col("cm_bucket"), col("cnt"))),
        Seq("cm_row", "cm_bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** Bloom membership synopsis (Bloom, CACM 1970) over the same
    * data-keyed hash family as [[countMin]] — position j of item x is
    * md5Int(j || '|' || x) mod width, j = 0..depth−1 — so every set bit
    * is bit-reproducible across engines and the DuckDB oracle replays
    * the filter exactly, false positives included. Output: the DISTINCT
    * `(bm_row, bm_bit)` set — ≤ depth·min(width, n) rows, broadcastable;
    * this replaces Spark's built-in `stat.bloomFilter` (an opaque
    * driver-side byte blob) everywhere a VERIFIED filter is wanted.
    * [[graft.pipeline.LinkGraph.frontierBloom]] keeps the built-in for
    * the unverified fast path. */
  def bloomBits(items: DataFrame, itemCol: String,
                depth: Int = 4, width: Int = 65536): DataFrame = {
    val spark = items.sparkSession
    val rows = spark.range(depth).select(col("id").cast("int").as("bm_row"))
    items.select(col(itemCol).cast("string").as("item")).distinct()
      .crossJoin(broadcast(rows))
      .select(col("bm_row"),
        pmod(Determinism.md5Int(
          concat(col("bm_row").cast("string"), lit("|"), col("item"))),
          lit(width.toLong)).cast("int").as("bm_bit"))
      .distinct()
  }

  /** Membership probe: `(item, member)` with member ⟺ ALL depth
    * positions set. The bit set is the BROADCAST side — the point of the
    * synopsis: a ≤ depth·width-row bitmap filters an unbounded probe
    * stream map-side, no shuffle of the probe side. One-sided by
    * construction: an inserted item always probes true (no false
    * negatives); false positives are deterministic data-keyed
    * arithmetic, not chance — the oracle replays each one. */
  def bloomProbe(bits: DataFrame, probes: DataFrame, itemCol: String,
                 depth: Int = 4, width: Int = 65536): DataFrame = {
    val spark = probes.sparkSession
    val rows = spark.range(depth).select(col("id").cast("int").as("bm_row"))
    probes.select(col(itemCol).cast("string").as("item")).distinct()
      .crossJoin(broadcast(rows))
      .select(col("item"), col("bm_row"),
        pmod(Determinism.md5Int(
          concat(col("bm_row").cast("string"), lit("|"), col("item"))),
          lit(width.toLong)).cast("int").as("bm_bit"))
      .join(broadcast(bits.select(col("bm_row"), col("bm_bit"))
          .withColumn("hit", lit(1))),
        Seq("bm_row", "bm_bit"), "left")
      .groupBy(col("item"))
      .agg((count(col("hit")) === depth).as("member"))
  }
}
