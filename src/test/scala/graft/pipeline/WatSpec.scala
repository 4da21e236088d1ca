package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WAT envelope: hostile-string escaping roundtrips, malformed-record
  * degradation, byte-exact file roundtrip on the real pages. */
class WatSpec extends SparkSpec {

  test("envelope: hostile titles and anchor texts roundtrip through the strict parser") {
    val hostile = Seq(
      "quote\" back\\slash", "new\nline\ttab", "unicode ✓ ünïcode",
      "control", "{\"fake\":\"json\"}", "")
    hostile.foreach { t =>
      val json = Wat.renderEnvelope("https://x.org/p?a=1&b=\"2\"", t,
        Seq(("https://y.org/" + t, t)))
      val ts = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
      // parse back through the same path read() uses
      val dir = java.nio.file.Files.createTempDirectory("wat_unit_").toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "one.warc.wat"),
        graft.sources.Warc.renderMetadata("https://x.org/p?a=1&b=\"2\"", ts, json))
      val rows = Wat.read(spark, dir).collect()
      assert(rows.length === 1, s"title=$t")
      assert(rows.head.getString(2) === t)
      assert(rows.head.getString(3) === "https://y.org/" + t)
      assert(rows.head.getString(4) === t)
    }
  }

  test("malformed envelope drops its record; neighbors survive") {
    val ts = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val good = graft.sources.Warc.renderMetadata("https://a.org", ts,
      Wat.renderEnvelope("https://a.org", "T", Seq(("https://b.org", "x"))))
    val bad = graft.sources.Warc.renderMetadata("https://broken.org", ts,
      """{"Envelope":{"truncated""")
    val noLinks = graft.sources.Warc.renderMetadata("https://c.org", ts,
      """{"Envelope":{"Payload-Metadata":{}}}""")
    val dir = java.nio.file.Files.createTempDirectory("wat_bad_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "mix.warc.wat"),
      bad ++ good ++ noLinks)
    val rows = Wat.read(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("https://a.org"))
  }

  test("file roundtrip on the real pages: 3 links per page, titles exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pages = Pages.fromDocuments(docs).select("url", "warc_ts", "html")
    val dir = java.nio.file.Files.createTempDirectory("wat_rt_").toString
    Wat.write(pages.repartition(4), dir)
    val back = Wat.read(spark, dir)
    assert(back.count() === pages.count() * 3)
    val titles = back.select("url", "title").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(titles("https://ex.org/doc/7") === "Doc 7")
  }
}
