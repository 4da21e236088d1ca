package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY §2 inventory) to DataFrame
  * builders over a testdata sf directory; `oracleSql` carries the exact
  * DuckDB-SQL equivalent for the driver's correctness gate. Queries without
  * an oracle (seeded-random iterative samplers) get rows-only checks, but
  * their invariants are additionally exposed as constant-oracle check
  * queries (counts / retention sets the reference's own tests assert).
  */
object SparkEntry {

  /** Flagship: full KG construction + triple emission on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    graft.sources.TpchKg.load(spark, "/root/testdata/sf0.001").triples

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    KgQueries.queries ++ CeQueries.queries ++ PipelineQueries.queries ++
      TrainingDataQueries.queries ++ CurationQueries.queries ++
      BpeQueries.queries ++ SamplerQueries.queries ++ AccessorQueries.queries

  def oracleSql: Map[String, String] =
    KgQueries.oracleSql ++ CeQueries.oracleSql ++ PipelineQueries.oracleSql ++
      TrainingDataQueries.oracleSql ++ CurationQueries.oracleSql ++
      BpeQueries.oracleSql ++ SamplerQueries.oracleSql ++ AccessorQueries.oracleSql
}
