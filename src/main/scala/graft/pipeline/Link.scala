package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary/alias entity linking (north_star): mention surfaces joined
  * against the candidate table with score-based disambiguation.
  *
  * The candidate table is driver-scale → resolved once (best candidate per
  * surface: highest score, id tiebreak) and then BROADCAST into the two
  * surface joins. At 10^12-doc scale the mention side is huge but never
  * shuffles here: both joins are broadcast-hash with the mentions streaming
  * through map-side.
  */
object Link {

  /** best candidate per surface — context-free disambiguation table */
  def resolveAliases(aliases: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("surface"))
      .orderBy(col("score").desc, col("entity_id"))
    aliases.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("surface"), col("entity_id"))
  }

  /** mentions(url, subjSurface, pred, objSurface) → linked triples with
    * pre-canonical entity ids. Unlinkable mentions (surface not in the
    * dictionary) are dropped — precision over recall at the link stage.
    * `keep` passes extra input columns through (e.g. the event-time column
    * a streaming caller watermarks on). */
  def apply(mentions: DataFrame, aliases: DataFrame,
            keep: Seq[String] = Nil): DataFrame = {
    val resolved = resolveAliases(aliases)
    mentions
      .join(broadcast(resolved.withColumnRenamed("surface", "subjSurface")
        .withColumnRenamed("entity_id", "subj_id")), Seq("subjSurface"))
      .join(broadcast(resolved.withColumnRenamed("surface", "objSurface")
        .withColumnRenamed("entity_id", "obj_id")), Seq("objSurface"))
      .select(col("url") +: keep.map(col) :+ col("subj_id") :+ col("pred") :+ col("obj_id"): _*)
  }

  /** Surface normalization for NIL clustering: case-fold + collapse/trim
    * whitespace — the TAC-KBP exact-match baseline's key. */
  def normalizeSurface(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Deterministic NIL-cluster id: `nil:` + 16 hex of md5(normalized
    * surface). A pure function of the surface, so the same unlinkable
    * mention gets the same id across partitions, task retries, recrawl
    * batches, and the batch/streaming split — no state, no sequence. */
  def nilId(surface: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("nil:"), substring(md5(normalizeSurface(surface)), 1, 16))

  /** [[apply]] with NIL DETECTION + CLUSTERING (TAC-KBP): mentions whose
    * surface misses the dictionary are NOT dropped — each unlinkable
    * endpoint is assigned to a NIL cluster keyed by its normalized surface
    * (the standard exact-match baseline; fuzzy cluster merging composes
    * downstream via the existing blocking machinery —
    * `Canonicalize.sortedNeighborPairs` / `Dedup.minhashLsh` over the nil
    * surfaces + ConnectedComponents — exactly like alias canonicalization).
    * Emits `subj_nil`/`obj_nil` flags so consumers can route NIL-backed
    * triples to a quarantine/curation sink. Plan shape: the same two
    * broadcast joins as [[apply]], LEFT instead of inner — the mention
    * stream still never shuffles. */
  def withNils(mentions: DataFrame, aliases: DataFrame,
               keep: Seq[String] = Nil): DataFrame = {
    val resolved = resolveAliases(aliases)
    mentions
      .join(broadcast(resolved.withColumnRenamed("surface", "subjSurface")
        .withColumnRenamed("entity_id", "subj_hit")), Seq("subjSurface"), "left")
      .join(broadcast(resolved.withColumnRenamed("surface", "objSurface")
        .withColumnRenamed("entity_id", "obj_hit")), Seq("objSurface"), "left")
      .select((col("url") +: keep.map(col)) ++ Seq(
        coalesce(col("subj_hit"), nilId(col("subjSurface"))).as("subj_id"),
        col("pred"),
        coalesce(col("obj_hit"), nilId(col("objSurface"))).as("obj_id"),
        col("subj_hit").isNull.as("subj_nil"),
        col("obj_hit").isNull.as("obj_nil")): _*)
  }
}
