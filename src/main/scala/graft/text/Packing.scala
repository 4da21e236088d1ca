package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing — the concat-and-chunk manifest an LLM
  * pretraining loader consumes: per stream (language here), documents are
  * concatenated in a deterministic order and the token stream is cut into
  * fixed-`budget` sequences; each document contributes one manifest row per
  * sequence it overlaps, carrying the doc-relative token span
  * [doc_from, doc_to). Every sequence is exactly `budget` tokens except
  * each stream's last — no padding waste, the standard pretraining packing
  * (GPT-style concat+chunk), as opposed to first-fit bin packing whose
  * greedy state is inherently sequential.
  *
  * Companion surface: [[Curation.packSequences]] (td_pack) emits each
  * doc's START bin + in-bin offset — one row per doc; this manifest is
  * the full span DECOMPOSITION — one row per (doc, sequence) overlap —
  * i.e. the rows a loader joins to assemble each fixed-length sequence.
  *
  * Shape: ONE partitioned window (running token offset per stream — a
  * single hash exchange on the stream key, streams pack in parallel) + a
  * codegen `sequence` explode + span arithmetic. No joins, no driver
  * state. At 100 TB the stream key is sub-sharded ((lang, shard) with
  * shard-local budgets) so no single window partition holds a whole
  * language; the manifest stays one exchange.
  */
object Packing {

  /** (stream, order, bin, doc_from, doc_to) manifest; `tokensCol` defaults
    * to the whitespace token count over `text`. Spans partition each doc
    * ([[graft.text.PackingSpec]] laws) and each bin's pieces sum to
    * `budget` except the stream tail. */
  def packManifest(docs: DataFrame, budget: Long,
                   streamCol: String = "lang", orderCol: String = "doc_id",
                   tokensCol: Option[Column] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    val toks = tokensCol.getOrElse(TextOps.tokenCount(col("text"))).cast("long")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(streamCol), col(orderCol), toks.as("toks"))
      .withColumn("gs", coalesce(sum(col("toks")).over(w), lit(0L)))
      .withColumn("bin",
        explode(expr(s"sequence(gs div ${budget}L, (gs + toks - 1) div ${budget}L)")))
      .select(col(streamCol), col(orderCol), col("bin"),
        greatest(lit(0L), col("bin") * budget - col("gs")).as("doc_from"),
        least(col("toks"), (col("bin") + 1L) * budget - col("gs")).as("doc_to"))
  }
}
