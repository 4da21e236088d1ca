package graft.sample

import graft.core.{Determinism, Kb, Ranks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Filtered negative sampling for KG-embedding training (the corruption
  * protocol of Bordes et al., "Translating embeddings for modeling
  * multi-relational data", NeurIPS 2013 §3, with the "filtered" refinement
  * of their evaluation): per positive triple (src, pred, dst) and draw
  * i < k, corrupt EITHER the head or the tail (md5 parity of the draw key)
  * with a uniformly drawn replacement node, then FILTER out corruptions
  * that happen to be true triples (or the identity). Together with the
  * DeepWalk / node2vec / skip-gram / PPMI surface this completes the
  * engine's embedding-training input family.
  *
  * Every draw is a pure function of (seed, i, triple) through the portable
  * md5 family, so the oracle replays byte-identically and output is
  * invariant to parallelism. The uniform node draw needs node ids indexed
  * 0..n−1 in a portable order — md5 rank via [[Ranks.rankByBucketedOrder]]
  * (bucketed two-pass, no single-task global sort).
  *
  * Scale shape: one explode (k rows per edge), one equi-join of draws
  * against the node index (both sides linear), one anti-join against the
  * true edge set — all keyed shuffles; nothing collects, nothing windows
  * globally. Filtered semantics means a positive can yield < k negatives
  * (the standard behavior — re-draw rounds are a caller loop if exact-k
  * matters).
  */
object KgeNegatives {

  def negatives(kb: Kb, k: Int = 2, seed: Long = 42L): DataFrame =
    negatives(kb.nodes, kb.edges, k, seed)

  /** Same protocol over explicit (nodes(id), edges(src, pred, dst)) tables —
    * the form a predicate-sliced training run ([[Transe]]) composes. */
  def negatives(nodes: DataFrame, edges: DataFrame, k: Int,
                seed: Long): DataFrame = {
    require(k >= 1, s"k=$k")
    val n = nodes.count()
    val hk = Determinism.md5Int(col("id"))
    // 0-based portable node index; hk is 48-bit → top-6-bit buckets balance
    val nidx = Ranks.rankByBucketedOrder(
        nodes.select(col("id"), hk.as("hk")),
        bucket = shiftright(col("hk"), 42), order = Seq(col("hk"), col("id")),
        outCol = "rk")
      .select(col("id").as("rep"), (col("rk") - 1).as("draw"))
    def key(tag: String) = concat_ws("|", lit(seed), lit(tag), col("i"),
      col("src"), col("pred"), col("dst"))
    val draws = edges.select("src", "pred", "dst")
      .withColumn("i", explode(array((0 until k).map(lit): _*)))
      .select(col("src"), col("pred"), col("dst"), col("i"),
        pmod(Determinism.md5Int(key("c")), lit(2L)).as("corrupt_head"),
        pmod(Determinism.md5Int(key("d")), lit(n)).as("draw"))
    val neg = draws.join(nidx, Seq("draw"))
      .select(col("src"), col("pred"), col("dst"), col("i"),
        when(col("corrupt_head") === 1, col("rep")).otherwise(col("src")).as("neg_src"),
        when(col("corrupt_head") === 1, col("dst")).otherwise(col("rep")).as("neg_dst"))
      .filter(col("neg_src") =!= col("src") || col("neg_dst") =!= col("dst"))
    // filtered setting: a corruption that IS a true triple is not a negative
    neg.join(
      edges.select(col("src").as("neg_src"), col("pred"), col("dst").as("neg_dst")),
      Seq("neg_src", "pred", "neg_dst"), "left_anti")
      .select(col("src"), col("pred"), col("dst"), col("i"),
        col("neg_src"), col("neg_dst"))
  }
}
