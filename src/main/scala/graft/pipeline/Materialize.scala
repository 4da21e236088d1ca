package graft.pipeline

import graft.core.{Kb, PropMeta, Tbox}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph materialization (north_star: "materializes nodes/edges as
  * partitioned tables with salting for skewed head entities").
  *
  * Canonical triples → the engine's KG fact tables. Head entities (high
  * in-degree objects) make `dst`-keyed aggregations/self-joins skew; a
  * persisted `salt` column (xxhash64 % S over the full row) gives
  * downstream jobs a ready two-phase key. Writes partition by `pred` (low
  * cardinality, prunes predicate-filtered scans).
  */
object Materialize {

  val Salts = 16

  def nodesOf(triples: DataFrame): DataFrame =
    triples.select(col("subj").as("id"))
      .unionAll(triples.select(col("obj").as("id")))
      .distinct()

  /** class of a canonical id = its namespace prefix (entA_/city_/org_/…). */
  private def clsOf(c: org.apache.spark.sql.Column) =
    when(c.startsWith("ent"), "Entity")
      .when(c.startsWith("city_"), "City")
      .when(c.startsWith("org_"), "Org")
      .when(c.startsWith("country_"), "Country")
      .otherwise("Thing")

  def typesOf(triples: DataFrame): DataFrame =
    nodesOf(triples).select(col("id").as("node"), clsOf(col("id")).as("cls"))

  def tbox: Tbox = Tbox(
    classes = Seq("Entity", "City", "Org", "Country", "Thing"),
    subClass = Seq("Entity" -> "Thing", "City" -> "Thing", "Org" -> "Thing", "Country" -> "Thing"),
    props = Seq(
      PropMeta("bornIn", "object", "Entity", "City"),
      PropMeta("worksFor", "object", "Entity", "Org"),
      PropMeta("locatedIn", "object", "City", "Country")))

  /** Write edges salted + partitioned; returns the written path. */
  def writeEdges(triples: DataFrame, path: String): Unit =
    triples.select(col("subj").as("src"), col("pred"), col("obj").as("dst"))
      .withColumn("salt", pmod(xxhash64(col("src"), col("pred"), col("dst")), lit(Salts)).cast("int"))
      .write.mode("overwrite").partitionBy("pred").parquet(path)

  /** Wrap canonical triples as a first-class Kb — samplers, class
    * expressions and LP evaluation run directly on the materialized graph. */
  def asKb(triples: DataFrame): Kb = {
    val spark = triples.sparkSession
    Kb(
      nodes = nodesOf(triples),
      edges = triples.select(col("subj").as("src"), col("pred"), col("obj").as("dst")),
      attrs = Kb.empty(spark).attrs,
      types = typesOf(triples),
      tbox = tbox)
  }
}
