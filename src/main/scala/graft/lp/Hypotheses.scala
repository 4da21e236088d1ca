package graft.lp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learner-support ranking over hypothesis tables (reference
  * search.py:620-638 / :755-772 `get_top_n`): the engine-side piece of the
  * search tree. The tree bookkeeping (parent/child links, refinement
  * operators) is learner machinery outside the engine scope (SURVEY §2.9
  * T2); what a learner needs FROM the engine is ranking scored hypotheses —
  * a distributed top-n.
  */
object Hypotheses {

  /** get_top_n(n, key): top-n hypotheses by `key` descending, key ∈
    * {quality, heuristic, length} (length reads column `len`, like the
    * reference's node.len). Executed as TakeOrderedAndProject — no global
    * sort materialization, no single-task window. Ties break on `concept`
    * for determinism (the reference's Python sort is stable on dict
    * insertion order, which is run-dependent; a data tiebreak is strictly
    * stronger). Unknown key raises, mirroring the reference's KeyError. */
  def topN(hypotheses: DataFrame, n: Int, key: String = "quality"): DataFrame = {
    val c = key match {
      case "quality"   => col("quality")
      case "heuristic" => col("heuristic")
      case "length"    => col("len")
      case other => throw new IllegalArgumentException(s"Wrong Key:$other")
    }
    hypotheses.orderBy(c.desc, col("concept")).limit(n)
  }
}
