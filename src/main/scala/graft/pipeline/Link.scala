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
}
