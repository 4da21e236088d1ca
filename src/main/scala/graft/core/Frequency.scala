package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact corpus frequency statistics shaped for the 100-TB key space.
  *
  * [[heavyHitters]] is the two-pass exact heavy-hitter pattern
  * (Misra & Gries, Sci. Comput. Program. 2 (1982); the MR adaptation in
  * Berinde et al. PODS'09): pass 1 runs a (k−1)-counter Misra–Gries
  * summary INSIDE each partition (mapPartitions, O(k) state, zero
  * shuffle) and unions the surviving candidate keys; pass 2 exact-counts
  * ONLY the candidates via a broadcast semi-join and keeps keys with
  * count·k > n. The per-partition MG guarantee (undercount ≤ nᵢ/k) plus
  * the averaging argument make the candidate union a SUPERSET of every
  * global key with count > n/k, so the two-pass output is EXACT and
  * partitioning-invariant — while the aggregation in pass 2 touches only
  * ≤ (k−1)·partitions candidate keys instead of shuffling the full key
  * space (the full-vocabulary groupBy this replaces is the dominant
  * shuffle of a token-frequency job over a web corpus, where the key
  * space is billions and the answer is the head).
  *
  * [[freqSpectrum]] is the frequency-of-frequencies table (count → how
  * many distinct keys occur exactly that often) — the Good–Turing
  * smoothing input and the standard Zipf-fit surface; two map-side-
  * partial aggregates, the second over the tiny spectrum domain.
  *
  * Null keys are excluded from both (a null is an ill-formed key, not a
  * frequency class).
  */
object Frequency {

  /** All keys with exact count > n/k, with their exact counts.
    * Output: (item: string, cnt: long), deterministic for any
    * partitioning. Candidate-set size is bounded by (k−1)·partitions —
    * broadcast-scale for any sane k. */
  def heavyHitters(df: DataFrame, key: String, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.filter(col(key).isNotNull)
      .select(col(key).cast("string").as("item")).as[String]
    val cand = keys.mapPartitions { it =>
      val c = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { s =>
        val cur = c.getOrElse(s, 0L)
        if (cur > 0 || c.size < k - 1) c(s) = cur + 1
        else {
          // decrement-all: entries at 1 hit zero and leave the summary;
          // the incoming item is NOT inserted (its virtual counter was 0)
          val dead = c.iterator.collect { case (ky, v) if v == 1L => ky }.toList
          c.mapValuesInPlace((_, v) => v - 1)
          dead.foreach(c.remove)
        }
      }
      c.keysIterator
    }.toDF("item").distinct()
    val total = keys.count()
    keys.toDF().join(broadcast(cand), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > lit(total))
  }

  /** Frequency-of-frequencies: (cnt, n_items) — n_items distinct keys
    * occur exactly cnt times. */
  def freqSpectrum(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt")).agg(count(lit(1)).as("n_items"))
}
