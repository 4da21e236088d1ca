package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC interchange (ISO 28500, the Common-Crawl container format) — the
  * raw form a crawl actually arrives in before it becomes the Iceberg
  * pages table this engine fronts. Pure-JDK response-record writer/parser:
  * no external warc library, headers parsed byte-exactly, payload bytes
  * carried opaque.
  *
  * Scale shape: WARC members are gzip-per-record in the wild, so a file is
  * NOT line- or byte-splittable — the unit of parallelism is the FILE
  * (exactly how Hadoop/Spark CC jobs run: one task per ~1 GB warc.gz).
  * `read` uses Spark's `binaryFile` source (one row per file) and parses
  * all records of a file inside its task via `flatMap`; `write` renders
  * one file per partition through `foreachPartition`. Both directions are
  * shuffle-free.
  *
  * Record layout written (WARC/1.0 response records):
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: <url>\r\n
  * WARC-Date: <ISO-8601 instant, microsecond precision>\r\n
  * Content-Length: <payload bytes>\r\n
  * \r\n
  * <payload>\r\n\r\n
  * }}}
  * Content-Length governs payload framing (binary payloads may contain
  * anything, including header-lookalike bytes — the parser never scans the
  * payload for separators).
  */
object Warc {

  final case class WarcPage(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte])

  private val Crlf = "\r\n"
  private val Iso = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  // ---- row-local kernels -------------------------------------------------

  def renderRecord(p: WarcPage): Array[Byte] = renderTyped(p, "response", None)

  /** WET conversion record (the Common-Crawl extracted-text sidecar): same
    * framing, `WARC-Type: conversion` + `Content-Type: text/plain`,
    * payload = UTF-8 text. */
  def renderConversion(url: String, ts: java.sql.Timestamp, text: String): Array[Byte] =
    renderTyped(WarcPage(url, ts, text.getBytes("UTF-8")), "conversion",
      Some("text/plain"))

  private def renderTyped(p: WarcPage, warcType: String,
                          contentType: Option[String]): Array[Byte] = {
    val header =
      s"WARC/1.0${Crlf}WARC-Type: $warcType${Crlf}WARC-Target-URI: ${p.url}$Crlf" +
        s"WARC-Date: ${Iso.format(p.warc_ts.toInstant)}$Crlf" +
        contentType.map(ct => s"Content-Type: $ct$Crlf").getOrElse("") +
        s"Content-Length: ${p.html.length}$Crlf$Crlf"
    val h = header.getBytes("UTF-8")
    val out = new Array[Byte](h.length + p.html.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(p.html, 0, out, h.length, p.html.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Parse every record of `accept` type in a WARC file body. Other record
    * types are skipped by their declared Content-Length (never scanned);
    * truncated trailing bytes are dropped like a resumed crawl would. */
  def parseRecords(bytes: Array[Byte],
                   accept: String = "response"): Iterator[WarcPage] = new Iterator[WarcPage] {
    private var pos = 0
    private var nextRec: WarcPage = fetch()

    private def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length && !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      val s = new String(bytes, start, pos - start, "UTF-8")
      pos = math.min(pos + 2, bytes.length)
      s
    }

    @annotation.tailrec
    private def fetch(): WarcPage = {
      // seek the next version line
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) return null
      val version = line()
      if (!version.startsWith("WARC/")) return null // garbage tail: stop
      var url: String = null; var date: String = null
      var len = -1L; var warcType: String = null
      var l = line()
      while (l.nonEmpty) {
        val i = l.indexOf(':')
        if (i > 0) {
          val k = l.substring(0, i).trim.toLowerCase
          val v = l.substring(i + 1).trim
          k match {
            case "warc-target-uri" => url = v
            case "warc-date"       => date = v
            case "content-length"  => len = java.lang.Long.parseLong(v)
            case "warc-type"       => warcType = v
            case _                 => ()
          }
        }
        l = line()
      }
      if (len < 0 || pos + len > bytes.length) return null // truncated
      val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
      pos += len.toInt
      if (warcType == accept && url != null && date != null)
        WarcPage(url,
          java.sql.Timestamp.from(java.time.Instant.parse(date)), payload)
      else fetch() // skip non-response records
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): WarcPage = {
      val r = nextRec; nextRec = fetch(); r
    }
  }

  // ---- distributed surfaces ----------------------------------------------

  /** pages(url, warc_ts, html, …) → one `part-NNNNN.warc` file per
    * partition under `path` (local-fs binding of the TableIO spirit; a
    * cluster deployment swaps the java.nio sink for the HDFS/S3 stream —
    * the per-partition framing is identical). */
  def write(pages: DataFrame, path: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    pages.select("url", "warc_ts", "html")
      .as[WarcPage](Encoders.product[WarcPage])
      .foreachPartition { (it: Iterator[WarcPage]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val f = java.nio.file.Paths.get(path, f"part-$pid%05d.warc")
          val os = java.nio.file.Files.newOutputStream(f)
          try it.foreach(p => os.write(renderRecord(p)))
          finally os.close()
        }
      }
  }

  /** Every `.warc` file under `path` → (url, warc_ts, html); one task per
    * file (WARC files are the parallelism unit — see the scaladoc header). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = Encoders.product[WarcPage]
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc").load(path)
      .select(col("content"))
      .as(Encoders.BINARY)
      .flatMap((bytes: Array[Byte]) => parseRecords(bytes))(enc)
      .toDF()
  }

  // ---- WET (extracted-text conversion records, the CC sidecar) ------------

  final case class WetDoc(url: String, warc_ts: java.sql.Timestamp, text: String)

  /** docs(url, warc_ts, text) → one `part-NNNNN.warc.wet` file per
    * partition: conversion records whose payload is the UTF-8 extracted
    * text — exactly Common Crawl's WET convention, so the north rule's
    * byte-identical-extraction contract survives interchange. Same
    * shuffle-free file-per-partition shape as [[write]]. */
  def writeWet(docs: DataFrame, path: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    docs.select("url", "warc_ts", "text")
      .as[WetDoc](Encoders.product[WetDoc])
      .foreachPartition { (it: Iterator[WetDoc]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val f = java.nio.file.Paths.get(path, f"part-$pid%05d.warc.wet")
          val os = java.nio.file.Files.newOutputStream(f)
          try it.foreach(d => os.write(renderConversion(d.url, d.warc_ts, d.text)))
          finally os.close()
        }
      }
  }

  // ---- WAT (per-record JSON metadata, the CC sidecar trio's third) -------

  /** One WAT metadata record: `WARC-Type: metadata` +
    * `Content-Type: application/json`, payload = the UTF-8 JSON envelope
    * (rendered by the caller — `pipeline.Wat` builds the CC-style
    * HTML-Metadata envelope). Same framing machinery as every record. */
  def renderMetadata(url: String, ts: java.sql.Timestamp, json: String): Array[Byte] =
    renderTyped(WarcPage(url, ts, json.getBytes("UTF-8")), "metadata",
      Some("application/json"))

  /** Every `.warc.wat` file under `path` → (url, warc_ts, json); one task
    * per file; other record types skipped by declared length. */
  def readMetadata(spark: SparkSession, path: String): DataFrame = {
    val enc = Encoders.product[WetDoc]
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.wat").load(path)
      .select(col("content"))
      .as(Encoders.BINARY)
      .flatMap((bytes: Array[Byte]) => parseRecords(bytes, accept = "metadata")
        .map(p => WetDoc(p.url, p.warc_ts, new String(p.html, "UTF-8"))))(enc)
      .toDF("url", "warc_ts", "json")
  }

  /** Every `.warc.wet` file under `path` → (url, warc_ts, text); one task
    * per file; response/metadata records inside a mixed archive are skipped
    * by declared length. */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    val enc = Encoders.product[WetDoc]
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.wet").load(path)
      .select(col("content"))
      .as(Encoders.BINARY)
      .flatMap((bytes: Array[Byte]) => parseRecords(bytes, accept = "conversion")
        .map(p => WetDoc(p.url, p.warc_ts, new String(p.html, "UTF-8"))))(enc)
      .toDF()
  }
}
