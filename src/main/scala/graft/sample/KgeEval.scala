package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filtered ranking evaluation for KG completion (the metric protocol of
  * Bordes et al. NeurIPS'13 §4, "filtered" setting): each DISTINCT positive
  * triple is ranked against its own filtered corruptions ([[KgeNegatives]]
  * already removed identities and true triples), and the evaluation reports
  * exact-integer aggregates — rank sum (mean rank = rank_sum/n_queries),
  * reciprocal-rank sum in micro-units (MRR = rr_sum_micros/n_queries/10^6,
  * per-query truncating integer division, replayed identically by the
  * oracle), and Hits@k counts.
  *
  * Scoring is pluggable via `scores`; [[freqScored]] supplies the standard
  * frequency baseline score(s,p,o) = |(s,p,·)| + |(·,p,o)| over the true
  * edge bag — the sanity floor a learned embedding must beat. Determinism:
  * ties break on (cand_src, cand_dst) ascending, so ranks are total and
  * partitioning-invariant.
  *
  * Scale shape: candidate groups are ≤ k+1 rows keyed by their positive —
  * the rank window is per-group (never a global sort); the two frequency
  * count tables are map-side-combinable aggregates keyed (src,pred) /
  * (pred,dst) and join candidates on those keys; the final metric row is
  * one partial-aggregable reduction. Nothing collects, nothing fans out
  * beyond k per edge.
  */
object KgeEval {

  /** candidates = each distinct positive + its distinct corruptions,
    * scored by the frequency baseline. Output: (src, pred, dst, cand_src,
    * cand_dst, is_pos, score). */
  def freqScored(edges: DataFrame, negatives: DataFrame): DataFrame = {
    val pos = edges.select(col("src"), col("pred"), col("dst")).distinct()
      .select(col("src"), col("pred"), col("dst"),
        col("src").as("cand_src"), col("dst").as("cand_dst"), lit(1).as("is_pos"))
    val neg = negatives
      .select(col("src"), col("pred"), col("dst"),
        col("neg_src").as("cand_src"), col("neg_dst").as("cand_dst"))
      .distinct()
      .withColumn("is_pos", lit(0))
    val sp = edges.groupBy(col("src").as("cand_src"), col("pred"))
      .agg(count(lit(1)).as("n_sp"))
    val po = edges.groupBy(col("pred"), col("dst").as("cand_dst"))
      .agg(count(lit(1)).as("n_po"))
    pos.unionByName(neg)
      .join(sp, Seq("cand_src", "pred"), "left")
      .join(po, Seq("pred", "cand_dst"), "left")
      .withColumn("score",
        coalesce(col("n_sp"), lit(0L)) + coalesce(col("n_po"), lit(0L)))
      .drop("n_sp", "n_po")
  }

  /** Scored candidates → ONE exact-integer metric row. `scores` must carry
    * (src, pred, dst, cand_src, cand_dst, is_pos, score). */
  def metrics(scores: DataFrame, hitsAt: Seq[Int] = Seq(1, 3)): DataFrame = {
    require(hitsAt.nonEmpty && hitsAt.forall(_ >= 1), s"hitsAt=$hitsAt")
    val w = Window.partitionBy(col("src"), col("pred"), col("dst"))
      .orderBy(col("score").desc, col("cand_src"), col("cand_dst"))
    val posRanks = scores.withColumn("cand_rank", row_number().over(w))
      .filter(col("is_pos") === 1)
    val aggs = Seq(
      sum(col("cand_rank")).as("rank_sum"),
      sum(expr("1000000 div cand_rank")).as("rr_sum_micros")) ++
      hitsAt.map(k =>
        sum(when(col("cand_rank") <= k, 1L).otherwise(0L)).as(s"hits$k"))
    posRanks.agg(count(lit(1)).as("n_queries"), aggs: _*)
  }

  /** The full protocol over a Kb: corrupt ([[KgeNegatives]]), score
    * (frequency baseline), rank, aggregate. */
  def rankingEval(kb: graft.core.Kb, k: Int = 2, seed: Long = 42L,
                  hitsAt: Seq[Int] = Seq(1, 3)): DataFrame =
    metrics(freqScored(kb.edges.select("src", "pred", "dst"),
      KgeNegatives.negatives(kb, k, seed)), hitsAt)
}
