package graft.pipeline

import graft.SparkSpec

/** Sitemap XML parsing: field extraction with whitespace/multiline
  * bodies, spec defaults, invalid-entry dropping, index expansion, and
  * the frontier anti-join. */
class SitemapsSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val urlset =
    """<?xml version="1.0"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc> https://a.org/1 </loc>
      |    <lastmod>2024-05-01T00:00:00Z</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc>https://a.org/2</loc></url>
      |  <url><priority>0.9</priority></url>
      |  <url><loc>https://a.org/3</loc><priority>1.0</priority></url>
      |</urlset>""".stripMargin

  test("entries: trimmed fields, milli priority, defaults, loc-less entry dropped") {
    val got = Sitemaps.entries(Seq(("https://a.org/sm.xml", urlset)).toDF("url", "body"))
      .collect().map(r => (r.getString(1), Option(r.getString(2)),
        Option(r.getString(3)), r.getLong(4))).toSet
    assert(got === Set(
      ("https://a.org/1", Some("2024-05-01T00:00:00Z"), Some("daily"), 800L),
      ("https://a.org/2", None, None, 500L), // spec default priority 0.5
      ("https://a.org/3", None, None, 1000L)))
  }

  test("indexChildren: sitemapindex expansion, loc-less blocks dropped") {
    val idx =
      """<sitemapindex>
        |  <sitemap><loc>https://a.org/s0.xml</loc></sitemap>
        |  <sitemap><lastmod>2024-01-01</lastmod></sitemap>
        |  <sitemap><loc>https://a.org/s1.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    val got = Sitemaps.indexChildren(Seq(("https://a.org/i.xml", idx)).toDF("url", "body"))
      .collect().map(_.getString(1)).toSet
    assert(got === Set("https://a.org/s0.xml", "https://a.org/s1.xml"))
  }

  test("frontier: uncrawled locs only, priority rides along") {
    val es = Sitemaps.entries(Seq(("sm", urlset)).toDF("url", "body"))
    val crawled = Seq("https://a.org/1", "https://a.org/3").toDF("url")
    val got = Sitemaps.frontier(es, crawled).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("https://a.org/2", 500L)))
  }
}
