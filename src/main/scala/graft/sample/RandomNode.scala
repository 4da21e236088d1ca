package graft.sample

import graft.core.Kb
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** RandomNodeSampler (reference classic_samplers.py:17-46): uniform nodes
  * without replacement until n; induced subgraph (include_all_edges=True).
  *
  * Variants (one engine, policy flags):
  *  - LPFirst (lpf_samplers.py:23-33): all LP nodes pre-inserted, uniform fill.
  *  - LPCentralized (lpc_samplers.py:34-49): fill tier-by-tier LP → 1-hop →
  *    2-hop → rest, uniform within a tier.
  *
  * Spark shape: a deterministic order column + global top-n
  * (TakeOrderedAndProject — no full sort materialization), then the induced
  * subgraph via the two endpoint semi joins. No driver-side loops.
  */
final class RandomNodeSampler(
    kb: Kb, seed: Long = 42L, keyed: Option[DataFrame] = None,
    lpSeeds: Seq[String] = Nil, lpc: Boolean = false) extends GraphSampler {

  def draw(n: Int): Drawn = {
    val ordered = Samplers.withOrd(kb.nodes, seed, keyed)
    val ranked =
      if (lpc) {
        val tiers = Samplers.lpcTiers(kb, lpSeeds)
        ordered.join(tiers, Seq("id"))
          .orderBy(col("tier"), col("ord"), col("id"))
      } else if (lpSeeds.nonEmpty) {
        val lpDf = kb.spark.createDataset(lpSeeds)(Encoders.STRING).toDF("id")
          .withColumn("pre", lit(0))
        ordered.join(broadcast(lpDf), Seq("id"), "left_outer")
          .orderBy(coalesce(col("pre"), lit(1)), col("ord"), col("id"))
      } else ordered.orderBy(col("ord"), col("id"))
    Drawn(ranked.select("id").limit(n), selectedEdges = None)
  }

  def sample(n: Int, dpp: Double = 1.0): Kb = {
    Samplers.checkInput(kb.nodes.count(), n, dpp)
    Samplers.finalizeSample(kb, draw(n), dpp, seed)
  }
}
