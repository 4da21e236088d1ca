package graft.queries

import graft.text.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer-training gates: the full train cycle (8 merges over the
  * documents corpus), the resulting subword vocabulary, and the
  * dictionary-join encode — each replayed end-to-end in DuckDB via
  * [[Bpe.oracleCtes]] (same word counts, same total-order pair picks, same
  * 16-pass fixpoint merge application).
  */
object BpeQueries {

  type Q = (SparkSession, String) => DataFrame

  private val K = 8

  private def docs(s: SparkSession, d: String) =
    s.read.parquet(s"$d/documents.parquet")

  val queries: Map[String, Q] = Map(
    "td_bpe_merges" -> ((s, d) => Bpe.mergesDf(s, Bpe.train(docs(s, d), K))),

    "td_bpe_vocab" -> ((s, d) => Bpe.vocab(Bpe.train(docs(s, d), K))),

    "td_bpe_encode" -> ((s, d) => {
      val dd = docs(s, d)
      Bpe.encodeTokenCounts(dd, Bpe.train(dd, K))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "td_bpe_merges" ->
      s"""WITH ${Bpe.oracleCtes(K)}
         |SELECT * FROM (
         |${(1 to K).map(i => s"  SELECT CAST($i AS INT) AS merge_rank, x AS lhs, y AS rhs, cnt FROM b$i")
             .mkString("\n  UNION ALL\n")}
         |) ORDER BY merge_rank""".stripMargin,

    "td_bpe_vocab" ->
      s"""WITH ${Bpe.oracleCtes(K)}
         |SELECT symbol, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
         |  SELECT l[g.i] AS symbol, cnt
         |  FROM (SELECT string_split(seg, '${Bpe.Sep}') AS l, cnt FROM w$K) t
         |  CROSS JOIN generate_series(2, ${Bpe.MaxWordLen + 1}) g(i)
         |  WHERE g.i <= len(l) - 1
         |) GROUP BY symbol""".stripMargin,

    "td_bpe_encode" ->
      s"""WITH ${Bpe.oracleCtes(K)}
         |SELECT d.doc_id, CAST(SUM(len(string_split(w.seg, '${Bpe.Sep}')) - 2) AS BIGINT) AS n_tokens
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) d
         |JOIN w$K w USING (word)
         |GROUP BY d.doc_id""".stripMargin
  )
}
