package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity canonicalization (north_star): blocking + connected components
  * over the same-entity graph; canonical id = min entity id per component.
  *
  * Blocking key here is a deterministic alias normalization (first-3-chars
  * prefix + the numeric part) — ids sharing a key become CC edges. The
  * MinHash-LSH blocking variant for fuzzy-name candidates lives in
  * graft.dedup (shared machinery); the CC core below is generic and handles
  * transitive chains across keys, with checkpointed lineage.
  */
object Canonicalize {

  /** alias normalization: lowercase 3-prefix + digits ("Ent 7" & "Entity 7"
    * → "ent|7"). */
  def normKey = concat(
    lower(substring(col("surface"), 1, 3)), lit("|"),
    regexp_extract(col("surface"), "(\\d+)", 1))

  /** (entity_id, canonical) for every entity in the alias table. */
  def canonicalMap(aliases: DataFrame): DataFrame = {
    // bipartite edges entity ↔ blocking-key node
    val edges = aliases.select(col("entity_id").as("src"),
      concat(lit("K:"), normKey).as("dst")).distinct()
    val comp = ConnectedComponents.run(edges)
    // canonical = min *entity* id in the component (exclude K: block nodes)
    val entComp = comp.filter(!col("id").startsWith("K:"))
    val canon = entComp.groupBy("component").agg(min(col("id")).as("canonical"))
    entComp.join(canon, Seq("component")).select(col("id").as("entity_id"), col("canonical"))
  }

  /** Rewrite linked triples onto canonical ids. The canonical map is
    * entity-catalog-sized; broadcast. */
  def apply(linked: DataFrame, aliases: DataFrame): DataFrame = {
    val canon = canonicalMap(aliases)
    linked
      .join(broadcast(canon.withColumnRenamed("entity_id", "subj_id")
        .withColumnRenamed("canonical", "subj")), Seq("subj_id"))
      .join(broadcast(canon.withColumnRenamed("entity_id", "obj_id")
        .withColumnRenamed("canonical", "obj")), Seq("obj_id"))
      .select(col("subj"), col("pred"), col("obj"))
  }
}

/** Connected components via iterative min-label propagation on DataFrames
  * (the Catalyst-friendly alternative to GraphX the north rule asks for):
  * each iteration joins current labels across symmetrized edges, takes the
  * per-node min, and stops when no label changes. Lineage is truncated by
  * localCheckpoint every iteration pair; convergence needs O(diameter)
  * rounds (large-star/small-star would be O(log n) — same join shapes —
  * and is the documented upgrade path for adversarially deep chains).
  */
object ConnectedComponents {

  /** edges(src, dst) undirected → (id, component). */
  def run(edges: DataFrame, maxIter: Int = 50, checkpointEvery: Int = 2): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      i += 1
      val viaNbr = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.unionAll(viaNbr)
        .groupBy("id").agg(min(col("component")).as("component"))
      val nextCk = if (i % checkpointEvery == 0) next.localCheckpoint(true) else next
      changed = nextCk.join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .filter(col("component") =!= col("old")).count()
      labels = nextCk
    }
    sym.unpersist()
    labels
  }
}
