package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine n-gram language-model quality scoring — the CCNet move
  * (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data"): train a small LM on a trusted
  * reference corpus, score every web document by per-token cross-entropy
  * under it, and keep/route documents by score. CCNet uses a KenLM 5-gram
  * over Wikipedia; here the model is a Laplace-smoothed word BIGRAM model
  * trained by the engine itself, so the whole train→score cycle is
  * deterministic relational algebra shared verbatim with the oracle.
  *
  * Model: P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V) over reference bigram
  * counts, V = |distinct reference unigrams| + 1 (the +1 reserves an OOV
  * type). A bigram whose CONTEXT w₁ is unseen scores the uniform 1/V.
  * Per-doc cross-entropy (nats/bigram) H = −(Σ ln P)/n over the doc's n
  * bigrams; docs with < 2 tokens get no bigram and score NULL-free via a
  * left join (n_bigrams = 0, xent = 0.0 by convention). All probability
  * arithmetic stays RATIONAL (integer counts) until the single final
  * `ln` — engine (Java log) and oracle (DuckDB ln) agree to < 1 ulp per
  * term, far inside the 4-dp gate rounding.
  *
  * Scale shape (the 100-TB story):
  *  - TRAIN side is the bounded trusted corpus (Wikipedia-scale): two
  *    keyed aggregations with map-side partial combine (bigram counts,
  *    then context totals), one scalar V. Never touches the web corpus.
  *  - SCORE side streams the web corpus's raw bigram stream through a
  *    join against the model. The model is a dim table (|reference
  *    bigrams|); at the tested scales it broadcasts (size-gated by the
  *    caller the same way as [[graft.pipeline.Canonicalize]]'s maps), and
  *    above the broadcast bar the join key is a single string — AQE
  *    shuffle-hash with the corpus side never sorting. The per-doc
  *    aggregation is a map-side-combinable sum keyed by doc id.
  *  - No windows, no global sorts, no driver loops anywhere.
  */
object Lm {

  /** Laplace-smoothed bigram model from a reference corpus:
    * (w1, w2, cnt, ctx, v) — bigram count, the context total c(w₁·), and
    * the (constant) vocabulary size V = distinct unigrams + 1. One
    * relation for storage/inspection; [[crossEntropy]] re-normalizes it
    * into the (bigram, context) pair of probe tables it joins with. */
  def trainBigram(ref: DataFrame,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bi = Curation.wordNgramsAll(ref, 2, textCol, idCol)
      .select(split(col("gram"), " ").getItem(0).as("w1"),
        split(col("gram"), " ").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
    val ctx = bi.groupBy(col("w1")).agg(sum(col("cnt")).as("ctx"))
    val v = Curation.wordNgramsAll(ref, 1, textCol, idCol)
      .agg((countDistinct(col("gram")) + 1).as("v"))
    bi.join(ctx, Seq("w1")).crossJoin(broadcast(v))
  }

  /** ln P(w₂|w₁) from per-row joined counts, either of which may be null
    * (join miss): unseen context → uniform 1/V; seen context, unseen
    * bigram → 1/(ctx+V); seen bigram → (cnt+1)/(ctx+V). */
  private def lnP(cnt: Column, ctx: Column, v: Column): Column =
    log((coalesce(cnt, lit(0L)) + 1L).cast("double") /
      (coalesce(ctx, lit(0L)) + v).cast("double"))

  /** Score `docs` under a [[trainBigram]] model: (idCol, n_bigrams, xent)
    * with xent = per-bigram cross-entropy in nats rounded to 4 dp (0.0 for
    * docs too short to form a bigram — they carry no LM evidence and are
    * routed by the length filters instead). Two left joins against the
    * model — bigram counts on (w1, w2), context totals on w1 — so a
    * bigram miss under a SEEN context still uses that context's smoothed
    * denominator, exactly as Laplace smoothing defines it. */
  def crossEntropy(docs: DataFrame, model: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bigrams = model.select(col("w1"), col("w2"), col("cnt"))
    val contexts = model.select(col("w1"), col("ctx")).distinct()
    // V is constant on every model row; keep one copy for the miss branch
    val v = model.select(col("v").as("v0")).limit(1)
    val stream = Curation.wordNgramsAll(docs, 2, textCol, idCol)
      .select(col(idCol), split(col("gram"), " ").getItem(0).as("w1"),
        split(col("gram"), " ").getItem(1).as("w2"))
    val scored = stream
      .join(broadcast(bigrams), Seq("w1", "w2"), "left")
      .join(broadcast(contexts), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(lnP(col("cnt"), col("ctx"), col("v0"))).as("s"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(-col("s") / col("n_bigrams"), lit(0.0)), 4).as("xent"))
  }
}
