package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CONTEXTUAL entity disambiguation — the linking stage [[Link]] can't do:
  * when a surface has several dictionary candidates, pick per PAGE by
  * coherence with the page's unambiguous entities (Cucerzan EMNLP'07 /
  * Milne-Witten CIKM'08 relatedness voting, reduced to its exact-integer
  * core so every score replays in SQL):
  *
  *   context(p)        = entities of p's single-candidate surfaces
  *   coherence(p, e)   = |context(p) ∩ neighbors(e)|   (background-KG edges)
  *   winner(p, surface)= argmax by (coherence, prior_micros, entity_id asc)
  *
  * The prior is the dictionary score in integer micro-units — a page with
  * no context (or candidates tied at coherence 0) falls back to exactly
  * [[Link.resolveAliases]]'s context-free pick, so this operator strictly
  * refines the baseline, never contradicts it without evidence.
  *
  * Scale shape (10^12 mentions, 10^8-entity KG):
  *   - the candidate table is dictionary-scale → broadcast into both the
  *     ambiguity split and the candidate fan-out (same gate philosophy as
  *     Link; a web-scale candidate table would swap these two joins to
  *     shuffle-hash on `surface` — the plan is keyed either way);
  *   - the context table is one distinct aggregate keyed (url, entity);
  *   - the coherence join chain is candidate ⋈ neighbors (keyed entity)
  *     then ⋈ context (keyed url, nbr) — both co-partitionable, both
  *     aggregate map-side; a candidate never materializes more than its
  *     neighbor list × its page's mentions;
  *   - hub entities are DEGREE-CAPPED deterministically (lowest-hash
  *     `hubCap` neighbors kept): an entity adjacent to half the KG would
  *     otherwise fan every mention of it out by |V|/2. The cap biases
  *     coherence low for hubs — exactly the entities whose neighbor
  *     overlap is least informative (same cap rationale as
  *     GraphMetrics.frequentPairs).
  */
object Disambiguate {

  /** mentions(url, surface) × candidates(surface, entity_id, prior_micros)
    * over background edges(src, dst) (treated undirected) →
    * (url, surface, entity_id, coherence, prior_micros): the winning
    * candidate per ambiguous (url, surface). Single-candidate surfaces are
    * not returned (they ARE the context — [[Link]] already links them). */
  def link(mentions: DataFrame, candidates: DataFrame, edges: DataFrame,
           hubCap: Int = 64): DataFrame = {
    val nCand = candidates.groupBy(col("surface"))
      .agg(count(lit(1)).as("n_cand"))
    val cands = candidates.join(nCand, "surface")

    // context: entities of the page's unambiguous surfaces, deduped
    val ctx = mentions
      .join(broadcast(cands.filter(col("n_cand") === 1)
        .select(col("surface"), col("entity_id").as("ctx_entity"))), "surface")
      .select(col("url"), col("ctx_entity")).distinct()

    // ambiguous mentions fanned out to their candidates
    val amb = mentions
      .join(broadcast(cands.filter(col("n_cand") > 1)
        .select(col("surface"), col("entity_id"), col("prior_micros"))), "surface")

    // degree-capped undirected neighbor lists: keep the hubCap lowest-hash
    // neighbors per entity (deterministic on any partitioning)
    val und = edges.select(col("src").as("e"), col("dst").as("nbr"))
      .unionAll(edges.select(col("dst").as("e"), col("src").as("nbr")))
      .distinct()
    val nbrW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("e")).orderBy(xxhash64(col("nbr")), col("nbr"))
    val nbrs = und.withColumn("rn", row_number().over(nbrW))
      .filter(col("rn") <= hubCap).drop("rn")

    // coherence = context entities among the candidate's neighbors
    val coh = amb
      .join(nbrs, amb("entity_id") === nbrs("e"))
      .join(ctx, amb("url") === ctx("url") && nbrs("nbr") === ctx("ctx_entity"))
      .groupBy(amb("url"), amb("surface"), amb("entity_id"))
      .agg(count(lit(1)).as("coherence"))

    val scored = amb.join(coh, Seq("url", "surface", "entity_id"), "left")
      .withColumn("coherence", coalesce(col("coherence"), lit(0L)))

    scored.groupBy(col("url"), col("surface"))
      .agg(min(struct((-col("coherence")).as("nc"),
        (-col("prior_micros")).as("np"),
        col("entity_id").as("entity_id"))).as("w"))
      .select(col("url"), col("surface"), col("w.entity_id").as("entity_id"),
        (-col("w.nc")).as("coherence"), (-col("w.np")).as("prior_micros"))
  }
}
