package graft.pipeline

import graft.sources.Warc
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WAT sidecar (the Common-Crawl per-record JSON metadata files — the
  * third of the WARC/WET/WAT trio): one `WARC-Type: metadata` record per
  * page whose JSON payload carries the CC-style envelope —
  * `Envelope.WARC-Header-Metadata.WARC-Target-URI` plus
  * `Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata` with the page
  * `Head.Title` and the outgoing `Links` (url + anchor text). Writing is
  * file-per-partition (the [[Warc.write]] shape), reading file-per-task;
  * the JSON parse-back reuses the pipeline's strict minimal parser
  * ([[Structured.parseJson]]) with per-row degradation — a malformed
  * envelope drops its record, never the task. */
object Wat {

  def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** The envelope JSON for one page. */
  def renderEnvelope(url: String, title: String,
                     links: Seq[(String, String)]): String = {
    val linkJson = links.map { case (u, t) =>
      s"""{"url":"${jsonEscape(u)}","text":"${jsonEscape(t)}"}"""
    }.mkString(",")
    s"""{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"${jsonEscape(url)}"},""" +
      s""""Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{""" +
      s""""Head":{"Title":"${jsonEscape(title)}"},"Links":[$linkJson]}}}}}"""
  }

  private val titleRe = "(?s)<title>(.*?)</title>".r

  def titleOf(html: Array[Byte]): String =
    titleRe.findFirstMatchIn(new String(html, "UTF-8")).map(_.group(1)).getOrElse("")

  /** pages(url, warc_ts, html) → one `part-NNNNN.warc.wat` per partition. */
  def write(pages: DataFrame, path: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    pages.select("url", "warc_ts", "html")
      .as[Warc.WarcPage](Encoders.product[Warc.WarcPage])
      .foreachPartition { (it: Iterator[Warc.WarcPage]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val f = java.nio.file.Paths.get(path, f"part-$pid%05d.warc.wat")
          val os = java.nio.file.Files.newOutputStream(f)
          try it.foreach { p =>
            val json = renderEnvelope(p.url, titleOf(p.html),
              LinkGraph.extractAnchors(p.html))
            os.write(Warc.renderMetadata(p.url, p.warc_ts, json))
          } finally os.close()
        }
      }
  }

  final case class WatLink(url: String, warc_ts: java.sql.Timestamp,
                           title: String, dst: String, anchor: String)

  /** one row per (page, link): envelope parsed back via the strict JSON
    * parser, malformed/missing structures drop the record (quarantine-sink
    * note as NTriples.parse). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = Encoders.product[WatLink]
    Warc.readMetadata(spark, path)
      .withColumnRenamed("json", "text")
      .as[Warc.WetDoc](Encoders.product[Warc.WetDoc])
      .flatMap((d: Warc.WetDoc) => linksOf(d.url, d.warc_ts, d.text))(enc)
      .toDF()
  }

  private def linksOf(url: String, ts: java.sql.Timestamp,
                      json: String): Iterator[WatLink] = {
    import Structured.{JArr, JObj, JStr}
    def field(o: Any, k: String): Option[Any] = o match {
      case JObj(fs) => fs.collectFirst { case (`k`, v) => v }
      case _ => None
    }
    (for {
      root <- Structured.parseJson(json)
      env  <- field(root, "Envelope")
      pm   <- field(env, "Payload-Metadata")
      hrm  <- field(pm, "HTTP-Response-Metadata")
      hm   <- field(hrm, "HTML-Metadata")
      head <- field(hm, "Head")
      title <- field(head, "Title").collect { case JStr(s) => s }
      links <- field(hm, "Links").collect { case JArr(items) => items }
    } yield links.iterator.flatMap { item =>
      for {
        u <- field(item, "url").collect { case JStr(s) => s }
        t <- field(item, "text").collect { case JStr(s) => s }
      } yield WatLink(url, ts, title, u, t)
    }).getOrElse(Iterator.empty)
  }
}
