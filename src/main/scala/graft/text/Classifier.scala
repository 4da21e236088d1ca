package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A TRAINED-IN-ENGINE document classifier for corpus curation: a
  * Bernoulli-Naive-Bayes-style evidence voter over word bigrams. Training
  * and scoring are both Spark aggregations over the corpus — the "model"
  * is a DataFrame, persistable via TableIO like every other curation
  * artifact.
  *
  * Deliberately integer-only: a gram votes +1 for the positive class when
  * its document frequency is relatively higher there (cp·nn > cn·np —
  * exactly sign(log-odds) under Bernoulli NB with equal-prior decision,
  * evaluated in cross-multiplied integer form), −1 when lower, 0 on a tie;
  * a document's score is the sum of its DISTINCT grams' votes. This keeps
  * the decision function bit-identical across engines (no transcendental
  * log-prob sums whose last-ulp differences could flip an argmax between
  * Spark and the SQL oracle) while preserving NB's per-feature decision
  * boundary.
  *
  * Scale shape: training is one distinct (doc, gram) pass + one keyed
  * aggregation with map-side partial combine; the class totals are two
  * scalars. Scoring re-streams the doc grams against the model on an
  * equi-join (AQE picks broadcast when |vocab| is small; shuffle-hash
  * otherwise) + one per-doc sum. At 100 TB, hash grams to 64 bits
  * (xxhash64) to shrink both the model key and the probe payload, and
  * optionally keep only grams with |vote| = 1 above a document-frequency
  * floor — the model table collapses to the discriminative vocabulary,
  * usually broadcastable. The string key is kept here because the oracle
  * shares it byte-for-byte.
  */
object Classifier {

  /** Train vote weights from labeled docs. `labels(idCol, pos: boolean)`
    * must cover the training docs 1:1. Returns (gram, vote ∈ {−1,0,1}). */
  def trainVotes(docs: DataFrame, labels: DataFrame, n: Int = 2,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = Curation.wordNgramsAll(docs, n, textCol, idCol)
      .select(col(idCol), col("gram")).distinct()
    val tot = labels.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("nn")).head()
    val (np, nn) = (tot.getLong(0), tot.getLong(1))
    grams.join(labels, Seq(idCol))
      .groupBy("gram")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
      .select(col("gram"),
        // cross-multiplied in DECIMAL(38,0): a raw int64 product cp·nn
        // overflows (ANSI: throws) once class totals reach the ~1e9×1e9
        // range a weak-labeled web corpus hits; decimal(19,0)² → (38,0)
        // stays exact. Identical comparisons at any tested scale; the
        // oracle side is already exact (DuckDB promotes to HUGEINT).
        when(col("cp").cast("decimal(19,0)") * nn > col("cn").cast("decimal(19,0)") * np, 1L)
          .when(col("cp").cast("decimal(19,0)") * nn < col("cn").cast("decimal(19,0)") * np, -1L)
          .otherwise(0L).as("vote"))
  }

  /** Score docs against a trained vote model: (idCol, vote_score,
    * predicted). Docs with no grams (or only unseen grams) score 0 and
    * predict negative — the deterministic tie rule. */
  def score(docs: DataFrame, model: DataFrame, n: Int = 2,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = Curation.wordNgramsAll(docs, n, textCol, idCol)
      .select(col(idCol), col("gram")).distinct()
    val scores = grams.join(model, Seq("gram"))
      .groupBy(idCol)
      .agg(sum(col("vote")).as("vote_score"))
    docs.select(col(idCol))
      .join(scores, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("vote_score"), lit(0L)).as("vote_score"),
        (coalesce(col("vote_score"), lit(0L)) > 0).as("predicted"))
  }
}
