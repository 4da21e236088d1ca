package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural statistics a KG-construction pipeline computes over a freshly
  * materialized graph: characteristic sets (the cardinality statistic SPARQL
  * optimizers plan star joins with) and lexical datatype inference (the
  * schema-discovery pass that assigns `xsd:` types to predicates scraped
  * from untyped web sources).
  */
object KgStats {

  /** Characteristic sets (Neumann & Moerkotte, ICDE'11 "Characteristic
    * sets: Accurate cardinality estimation for RDF queries"): partition
    * subjects by the exact SET of predicates they emit, and report per set
    * the subject count and total edge count. A SPARQL star-join
    * `?s p1 ?a . ?s p2 ?b` matches exactly the subjects of the sets
    * containing {p1,p2}, so these counts answer star cardinalities without
    * touching the edge table.
    *
    * Plan shape: two aggregates, both map-side-partial. The per-subject
    * `collect_set` state is bounded by the (small) predicate vocabulary —
    * never by subject degree — so no key skews the first aggregate's
    * reducers. Output cardinality = distinct predicate COMBINATIONS
    * observed, which real KGs keep in the thousands (the paper's point).
    * The set renders as a '|'-joined sorted string so the result is a
    * portable, hashable gate surface.
    */
  def characteristicSets(edges: DataFrame): DataFrame =
    edges.groupBy(col("src"))
      .agg(
        concat_ws("|", sort_array(collect_set(col("pred")))).as("char_set"),
        count(lit(1)).as("deg"))
      .groupBy(col("char_set"))
      .agg(
        count(lit(1)).as("n_subjects"),
        sum(col("deg")).as("n_edges"))

  // anchored RE2-compatible lexical-space probes, shared verbatim with the
  // DuckDB oracle: what a value-space parser would accept for each type
  private val LongRe = "^[+-]?[0-9]+$"
  private val DoubleRe = "^[+-]?([0-9]+\\.[0-9]*|\\.[0-9]+|[0-9]+)([eE][+-]?[0-9]+)?$"
  private val DateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"

  /** Lexical datatype inference over the attrs table — the schema-discovery
    * ANALYZE of KG construction: for each predicate, count how many of its
    * lexical values parse as integer / decimal / date / boolean, and assign
    * the TIGHTEST type that covers every non-null value (boolean before
    * long — their lexical spaces are disjoint; long before double — every
    * integer lexical is also a decimal lexical; anything short of full
    * coverage degrades to xsd:string, never a lossy majority vote).
    * Type probes are anchored regexes rather than engine `try_cast`s:
    * cast acceptance grammars differ subtly between engines ('yes' is a
    * Spark boolean, whitespace trimming varies), regex lexical spaces are
    * portable by construction.
    *
    * ONE map-side-partial aggregate over one scan of attrs; the row-local
    * regex probes are codegen'd. Output is predicate-vocabulary-sized.
    */
  def inferDatatypes(attrs: DataFrame): DataFrame = {
    val v = col("lexical")
    def n(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    attrs.groupBy(col("prop"))
      .agg(
        count(v).as("n_values"),
        n(v.rlike(LongRe)).as("n_long"),
        n(v.rlike(DoubleRe)).as("n_double"),
        n(v.rlike(DateRe)).as("n_date"),
        n(v.isin("true", "false")).as("n_bool"))
      .withColumn("inferred",
        when(col("n_values") === 0L, "xsd:string")
          .when(col("n_bool") === col("n_values"), "xsd:boolean")
          .when(col("n_long") === col("n_values"), "xsd:long")
          .when(col("n_double") === col("n_values"), "xsd:double")
          .when(col("n_date") === col("n_values"), "xsd:date")
          .otherwise("xsd:string"))
  }
}
