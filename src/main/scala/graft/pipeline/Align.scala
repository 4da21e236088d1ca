package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary-free instance alignment between two entity namespaces —
  * the PARIS idea (Suchanek et al., VLDB'12: instances match when they
  * share values of discriminating relations) reduced to an exact-integer
  * evidence join. Two KGs extracted from different crawls (or the two
  * surface-form namespaces one crawl links before canonicalization)
  * describe the same world; a pair (a ∈ KG₁, b ∈ KG₂) is an alignment
  * candidate when both assert the same (pred, obj) facts, and each shared
  * fact contributes evidence INVERSELY weighted by how many subjects
  * assert it (the Resource-Allocation discount over the entity–fact
  * bipartite graph — PARIS's inverse-functionality weighting in integer
  * micro-units: w = 10⁶ div (n₁+n₂ subjects of the fact)).
  *
  * Plan shape: the evidence join is keyed by (pred, obj) — the only
  * quadratic hazard is a POPULAR fact ("type: Person") matching everyone
  * with everyone, so fact keys are capped by the n₁·n₂ pair product
  * (`maxPairsPerValue`); a popular fact carries ~zero RA weight anyway,
  * so the cap drops noise, not signal. Then one (a, b) aggregate and one
  * per-a top-k window over candidates that shared ≥ `minShared` facts.
  * Nothing is ever computed per entity-PAIR except for pairs with at
  * least one shared fact — blocking by evidence, the Fellegi-Sunter
  * shape again.
  */
object Align {

  /** t1/t2: (subj, pred, obj) triple sets (bag ok — deduped internally).
    * Returns (a, b, shared_n, ra_micros, arank) — per-a candidates ranked
    * by RA evidence desc (tie: b asc), cut at `topK`. */
  def alignByEvidence(t1: DataFrame, t2: DataFrame, minShared: Long = 2L,
                      maxPairsPerValue: Long = 1L << 20, topK: Int = 3): DataFrame = {
    require(minShared >= 1 && maxPairsPerValue >= 1 && topK >= 1,
      s"minShared=$minShared maxPairsPerValue=$maxPairsPerValue topK=$topK")
    val s1 = t1.select(col("subj").as("a"), col("pred"), col("obj")).distinct()
    val s2 = t2.select(col("subj").as("b"), col("pred"), col("obj")).distinct()
    val n1 = s1.groupBy("pred", "obj").agg(count(lit(1)).as("c1"))
    val n2 = s2.groupBy("pred", "obj").agg(count(lit(1)).as("c2"))
    val vok = n1.join(n2, Seq("pred", "obj"))
      .filter(col("c1") * col("c2") <= maxPairsPerValue)
      .select(col("pred"), col("obj"),
        expr("1000000 div (c1 + c2)").as("w"))
    val ev = s1.join(vok, Seq("pred", "obj")).join(s2, Seq("pred", "obj"))
    val g = ev.groupBy("a", "b")
      .agg(count(lit(1)).as("shared_n"), sum(col("w")).as("ra_micros"))
      .filter(col("shared_n") >= minShared)
    val w = Window.partitionBy(col("a")).orderBy(col("ra_micros").desc, col("b"))
    g.withColumn("arank", row_number().over(w)).filter(col("arank") <= topK)
  }
}
