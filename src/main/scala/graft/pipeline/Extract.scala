package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Deterministic boilerplate-stripped text extraction (north_rule:
  * "byte-identical extracted text per url").
  *
  * Pure Scala function applied via typed mapPartitions (input_hint mandates
  * typed Datasets for the extraction stage; no UDF registration, stays in
  * one deserialize-once pass per partition). Identical input bytes produce
  * identical output bytes on any partitioning — the extraction depends only
  * on the row, never on task context.
  */
object Extract {

  private val blockTags = Seq("head", "nav", "footer", "script", "style", "aside")

  /** Strip boilerplate blocks + remaining markup; decode the few entities
    * the corpus uses. No trimming — content bytes pass through verbatim. */
  def extractText(html: Array[Byte]): String = {
    var s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    for (t <- blockTags)
      s = s.replaceAll(s"(?is)<$t\\b[^>]*>.*?</$t>", "")
    s = s.replaceAll("(?s)<[^>]*>", "")
    s.replace("&copy;", "©").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">")
  }

  final case class PageIn(url: String, html: Array[Byte])
  final case class Extracted(url: String, text: String)
  final case class PageTsIn(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte])
  final case class ExtractedTs(url: String, warc_ts: java.sql.Timestamp, text: String)

  /** pages(url, …, html, …) → (url, text). */
  def apply(pages: DataFrame): Dataset[Extracted] = {
    val in = pages.select("url", "html").as[PageIn](Encoders.product[PageIn])
    in.mapPartitions(_.map(p => Extracted(p.url, extractText(p.html))))(
      Encoders.product[Extracted])
  }

  /** Event-time-carrying variant (streaming ingest keeps `warc_ts` for the
    * downstream watermark). Same [[extractText]] kernel — batch and stream
    * extraction are byte-identical by construction. */
  def withTs(pages: DataFrame): Dataset[ExtractedTs] = {
    val in = pages.select("url", "warc_ts", "html").as[PageTsIn](Encoders.product[PageTsIn])
    in.mapPartitions(_.map(p => ExtractedTs(p.url, p.warc_ts, extractText(p.html))))(
      Encoders.product[ExtractedTs])
  }
}
