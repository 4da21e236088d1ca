package graft.pipeline

import graft.core.Kb
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end KG construction (north_star): pages → byte-identical text
  * extraction → mention detection → alias entity linking (broadcast join)
  * → pattern-rule triple extraction → canonicalization (blocking + CC) →
  * materialized graph. Every stage is checkpointed with lineage metrics
  * (Lineage.stage) so a killed run resumes from the last completed stage.
  */
object KgPipeline {

  val stages = Seq("pages", "extracted", "mentions", "linked", "triples")

  /** Run up to `upTo` (inclusive); default full. Returns the last stage's
    * DataFrame. `checkpointDir` holds the per-stage parquet + lineage. */
  def run(spark: SparkSession, dataDir: String, checkpointDir: String,
          upTo: String = "triples"): DataFrame = {
    val limit = stages.indexOf(upTo)
    require(limit >= 0, s"unknown stage $upTo")
    val aliases = Pages.aliases(spark)

    var out: DataFrame = null
    if (limit >= 0)
      out = Lineage.stage(spark, checkpointDir, "pages") {
        Pages.fromDir(spark, dataDir)
      }
    if (limit >= 1)
      out = Lineage.stage(spark, checkpointDir, "extracted") {
        Extract(out).toDF()
      }
    if (limit >= 2)
      out = Lineage.stage(spark, checkpointDir, "mentions") {
        Mentions(out.as[Extract.Extracted](
          org.apache.spark.sql.Encoders.product[Extract.Extracted])).toDF()
      }
    if (limit >= 3)
      out = Lineage.stage(spark, checkpointDir, "linked") {
        Link(out, aliases)
      }
    if (limit >= 4)
      out = Lineage.stage(spark, checkpointDir, "triples") {
        Canonicalize(out, aliases).distinct()
      }
    out
  }

  /** Pure pages → canonical triples (no lineage/checkpoint) — the same
    * stage kernels as [[run]], for callers that bring their own page set
    * (recrawl changesets, ad-hoc diffs). */
  def triplesOf(pages: org.apache.spark.sql.DataFrame,
                aliases: org.apache.spark.sql.DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    val extracted = Extract(pages).toDF()
    val mentions = Mentions(extracted.as[Extract.Extracted](
      Encoders.product[Extract.Extracted])).toDF()
    Canonicalize(Link(mentions, aliases), aliases).distinct()
  }

  /** The canonical (src page, subj, pred, obj) CLAIM stream of a page set
    * — triples with provenance kept, the truth-discovery input. Same stage
    * kernels as [[triplesOf]] with `url` riding the keep pass-throughs. */
  def claimsOf(pages: org.apache.spark.sql.DataFrame,
               aliases: org.apache.spark.sql.DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    val extracted = Extract(pages).toDF()
    val mentions = Mentions(extracted.as[Extract.Extracted](
      Encoders.product[Extract.Extracted])).toDF()
    Canonicalize(Link(mentions, aliases), aliases, keep = Seq("url"))
      .withColumnRenamed("url", "src")
  }

  /** Full run + materialization into a Kb. */
  def buildKb(spark: SparkSession, dataDir: String, checkpointDir: String): Kb =
    Materialize.asKb(run(spark, dataDir, checkpointDir))

  /** Fresh throwaway checkpoint dir (verify/bench runs). */
  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
