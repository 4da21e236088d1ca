package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {

  private def page(url: String, ts: String, payload: Array[Byte]) =
    Warc.WarcPage(url, java.sql.Timestamp.valueOf(ts), payload)

  test("record roundtrip: framing is Content-Length, never payload scanning") {
    // hostile payload embedding a fake record header — framing must not bite
    val hostile = ("evil\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 0\r\n\r\n").getBytes("UTF-8")
    val pages = Seq(
      page("https://a.org/x", "2025-01-01 00:00:01.123456", hostile),
      page("https://b.org/y", "2025-06-30 23:59:59.0", Array[Byte](0, 1, 2, -1)),
      page("https://c.org/empty", "2025-01-01 00:00:00.0", Array.empty[Byte]))
    val bytes = pages.flatMap(p => Warc.renderRecord(p).toSeq).toArray
    val back = Warc.parseRecords(bytes).toSeq
    assert(back.map(_.url) === pages.map(_.url))
    assert(back.map(_.warc_ts) === pages.map(_.warc_ts))
    back.zip(pages).foreach { case (b, p) =>
      assert(java.util.Arrays.equals(b.html, p.html), p.url)
    }
  }

  test("non-response records are skipped by declared length; truncated tail drops") {
    val meta = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\n" +
      "hello\r\n\r\n").getBytes("UTF-8")
    val good = Warc.renderRecord(page("https://a.org", "2025-01-01 00:00:00.0",
      "payload".getBytes("UTF-8")))
    val truncated = good.dropRight(9) // cut into the payload
    val all = meta ++ good ++ meta ++ truncated
    val back = Warc.parseRecords(all).toSeq
    assert(back.map(_.url) === Seq("https://a.org"))
    assert(new String(back.head.html, "UTF-8") === "payload")
  }

  test("file write/read roundtrip over the real pages table, byte-exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pages = graft.pipeline.Pages.fromDocuments(docs)
      .select("url", "warc_ts", "html")
    val dir = java.nio.file.Files.createTempDirectory("warc_spec_").toString
    Warc.write(pages.repartition(4), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc")) === 4)
    val back = Warc.read(spark, dir)
    assert(back.count() === pages.count())
    // byte-exact: md5 of html, exact ts, per url
    val a = pages.select(col("url"), col("warc_ts").cast("string").as("ts"),
      md5(col("html")).as("m")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    val b = back.select(col("url"), col("warc_ts").cast("string").as("ts"),
      md5(col("html")).as("m")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(a === b)
  }

  test("wet: conversion records roundtrip text exactly; mixed archives filter by type") {
    // unicode + a hostile header-lookalike INSIDE the text payload
    val hostile = "evil\r\n\r\nWARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 0\r\n\r\n"
    val docs = Seq(
      ("https://a.org/x", "2025-01-01 00:00:01.123456", hostile),
      ("https://b.org/y", "2025-06-30 23:59:59.0", "héllo wörld — ünïcode ✓"),
      ("https://c.org/e", "2025-01-01 00:00:00.0", ""))
    // render a MIXED byte stream: conversion + response + warcinfo records
    val conv = docs.flatMap { case (u, ts, t) =>
      Warc.renderConversion(u, java.sql.Timestamp.valueOf(ts), t).toSeq }.toArray
    val resp = Warc.renderRecord(Warc.WarcPage("https://r.org",
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00.0"), "html".getBytes("UTF-8")))
    val meta = "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
      .getBytes("UTF-8")
    val mixed = resp ++ conv ++ meta
    val back = Warc.parseRecords(mixed, accept = "conversion").toSeq
    assert(back.map(_.url) === docs.map(_._1))
    assert(back.map(p => new String(p.html, "UTF-8")) === docs.map(_._3))
    // the response parse of the same stream sees ONLY the response record
    assert(Warc.parseRecords(mixed).toSeq.map(_.url) === Seq("https://r.org"))
  }

  test("wet: file write/read roundtrip over the real extracted text, byte-exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pages = graft.pipeline.Pages.fromDocuments(docs)
    val ex = graft.pipeline.Extract.withTs(pages).toDF()
    val dir = java.nio.file.Files.createTempDirectory("wet_spec_").toString
    Warc.writeWet(ex.repartition(4), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc.wet")) === 4)
    val back = Warc.readWet(spark, dir)
    val a = ex.select(col("url"), col("warc_ts").cast("string").as("ts"),
      md5(col("text")).as("m")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    val b = back.select(col("url"), col("warc_ts").cast("string").as("ts"),
      md5(col("text")).as("m")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(a === b)
  }
}
