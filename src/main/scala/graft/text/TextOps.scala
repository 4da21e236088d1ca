package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting, shingling. All are
  * single-pass column expressions (whole-stage codegen; no UDFs) whose
  * arithmetic is portable to the SQL oracle.
  */
object TextOps {

  /** occurrences of `needle` in `haystack` via length arithmetic —
    * codegen-friendly and exactly reproducible in any SQL dialect. */
  def countOccurrences(haystack: Column, needle: String): Column =
    ((length(haystack) - length(regexp_replace(haystack, java.util.regex.Pattern.quote(needle), "")))
      / needle.length).cast("long")

  /** whitespace token count = spaces + 1 (single-space corpus contract) */
  def tokenCount(text: Column): Column =
    countOccurrences(text, " ") + 1

  /** n-gram-heuristic language ID: stopword-marker counts per language,
    * argmax with fixed priority order (en > de > fr > es). */
  def langId(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    val en = countOccurrences(t, " the ") + countOccurrences(t, " and ") + countOccurrences(t, " of ")
    val de = countOccurrences(t, " der ") + countOccurrences(t, " und ") + countOccurrences(t, " die ")
    val fr = countOccurrences(t, " le ") + countOccurrences(t, " et ") + countOccurrences(t, " la ")
    val es = countOccurrences(t, " el ") + countOccurrences(t, " y ") + countOccurrences(t, " los ")
    when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** quality features + composite score (length / punctuation / stopword
    * ratios — the usual web-text quality heuristics), rounded to 5. */
  def quality(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val punct = countOccurrences(t, ".") + countOccurrences(t, ",") + countOccurrences(t, "!")
    val stop = countOccurrences(concat(lit(" "), lower(t), lit(" ")), " the ") +
      countOccurrences(concat(lit(" "), lower(t), lit(" ")), " a ") +
      countOccurrences(concat(lit(" "), lower(t), lit(" ")), " of ")
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      round(punct.cast("double") / nTok, 5).as("punct_ratio"),
      round(stop.cast("double") / nTok, 5).as("stop_ratio"),
      // composite: long enough, some stopwords, not punctuation-drenched
      round(least(nTok.cast("double") / 100.0, lit(1.0)) *
        (lit(1.0) - least(punct.cast("double") / nTok, lit(1.0))) *
        least(stop.cast("double") * 10.0 / nTok + lit(0.1), lit(1.0)), 5).as("quality"))
  }

  /** whole-document fingerprint: md5 of the lowercase text (exact-dup key;
    * oracle-portable). For the rolling/winnowing path see
    * [[graft.expr.RollingHash]]. */
  def fingerprintMd5(text: Column): Column = md5(lower(text).cast("binary"))

  /** all character 3-gram shingle hash occurrences (with duplicates),
    * h = a₁·31² + a₂·31 + a₃ over ASCII codes of lower(text). Pure
    * explode + arithmetic — whole-stage codegen, no shuffle. Idempotent
    * aggregates (MIN — i.e. MinHash) can consume this directly and skip
    * deduplication entirely. */
  def shinglesAll(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= 3)
      .select(col(idCol), col("t"),
        explode(sequence(lit(1), length(col("t")) - 2)).as("i"))
      .select(col(idCol), expr("substring(t, i, 3)").as("sh"))
      .select(col(idCol),
        (ascii(substring(col("sh"), 1, 1)) * 961 +
          ascii(substring(col("sh"), 2, 1)) * 31 +
          ascii(substring(col("sh"), 3, 1))).cast("long").as("h"))

  /** distinct (doc_id, h) shingle set — for set-semantics consumers
    * (Jaccard sizes, SimHash majorities, shingle counts). */
  def shingles(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    shinglesAll(docs, textCol, idCol).distinct()

  /** per-doc distinct-shingle array (one row per doc; broadcastable) —
    * map-only via higher-order functions. HOFs run interpreted, so this is
    * for |docs|-sized passes (e.g. the broadcast side of pair-level
    * Jaccard), not for the hot shingle stream. */
  def shingleArrays(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= 3)
      .select(col(idCol), expr(
        """array_distinct(transform(sequence(1, length(t) - 2),
          |  i -> CAST(ascii(substring(t, i, 1)) * 961 + ascii(substring(t, i + 1, 1)) * 31
          |       + ascii(substring(t, i + 2, 1)) AS BIGINT)))""".stripMargin).as("hs"))

  /** The same shingle derivation as DuckDB SQL (over a relation aliased
    * `corpus(doc_id, text)`). */
  val shinglesSql: String =
    """SELECT DISTINCT doc_id,
      |  CAST(ascii(substr(t, i, 1)) * 961 + ascii(substr(t, i + 1, 1)) * 31 + ascii(substr(t, i + 2, 1)) AS BIGINT) AS h
      |FROM (SELECT doc_id, lower(text) AS t FROM corpus WHERE length(text) >= 3) c
      |CROSS JOIN generate_series(1, 2000) g(i)
      |WHERE i <= length(t) - 2""".stripMargin
}
