package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkGraphSpec extends SparkSpec {

  test("extractLinks: quoted, single-quoted, unquoted, attribute order, multiplicity") {
    val html =
      ("""<html><body><a href="https://a.org/x">one</a>""" +
        """<a class="c" href='https://b.org/y'>two</a>""" +
        """<a href=https://c.org/z rel=nofollow>three</a>""" +
        """<a HREF="https://a.org/x">dup kept</a>""" +
        """<a name="anchor-no-href">skip</a></body></html>""").getBytes("UTF-8")
    assert(LinkGraph.extractLinks(html) ===
      Seq("https://a.org/x", "https://b.org/y", "https://c.org/z", "https://a.org/x"))
    assert(LinkGraph.extractLinks("<p>no links</p>".getBytes("UTF-8")) === Seq.empty)
  }

  test("links: planted nav anchors come back for every page (hub, next, cdn)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 30)
    val links = LinkGraph.links(Pages.fromDocuments(docs)).toDF()
    val got = links.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = (0 until 30).flatMap { id =>
      val src = s"https://ex.org/doc/$id"
      Seq(
        src -> s"https://ex.org/doc/${id % 97}",       // hub (self-loop here, id < 97)
        src -> s"https://ex.org/doc/${id + 1}",        // next chain
        src -> s"https://cdn${id % 3}.ex-assets.net/p/$id")
    }.toSet
    assert(got === expected)
    assert(links.count() === 90) // 3 anchors per page, multiplicity kept
  }

  test("extractAnchors: inner tags stripped, whitespace collapsed, unclosed skipped") {
    val html =
      ("""<a href="https://a.org/x">plain text</a>""" +
        """<a href='https://b.org/y'><b>bold</b>  and\tmore</a>""" +
        """<a href=https://c.org/z rel=x>multi
          |word</a>""".stripMargin +
        """<a href="https://d.org/unclosed">no close tag""").getBytes("UTF-8")
    val got = LinkGraph.extractAnchors(html)
    assert(got.map(_._1) === Seq("https://a.org/x", "https://b.org/y", "https://c.org/z"))
    assert(got(0)._2 === "plain text")
    assert(got(1)._2 === "bold and\\tmore")
    assert(got(2)._2 === "multi word")
  }

  test("frontier: uncrawled targets with in-reference counts, crawled excluded") {
    import spark.implicits._
    val links = Seq(
      ("p1", "p2"), ("p1", "x"), ("p2", "x"), ("p2", "y"), ("p1", "p1")
    ).toDF("src", "dst")
    val pages = Seq("p1", "p2").toDF("url")
    val got = LinkGraph.frontier(links, pages).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("x" -> 2L, "y" -> 1L))
  }

  test("frontierBloom equals frontier exactly, even with forced false positives") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val crawled = (0 until 200).map(i => s"https://ex.org/p/$i")
    val links = Seq.fill(600)((crawled(rnd.nextInt(200)),
      if (rnd.nextBoolean()) crawled(rnd.nextInt(200))
      else s"https://ex.org/new/${rnd.nextInt(80)}")).toDF("src", "dst")
    val pages = crawled.toDF("url")
    val exact = LinkGraph.frontier(links, pages).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // undersized filter (expectedItems = 2 for 200 urls) → fp rate near 1:
    // nearly every uncrawled target must survive via the exact re-check
    val bloomed = LinkGraph.frontierBloom(links, pages, fpp = 0.5, expectedItems = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bloomed === exact)
    assert(exact.keySet.forall(_.startsWith("https://ex.org/new/")))
  }

  test("hostGraph: host quotient with multiplicity, parsed not assumed") {
    import spark.implicits._
    val links = Seq(
      ("https://EX.org/a", "https://ex.org/b"),   // host lowercased
      ("https://ex.org/b", "https://ex.org/c"),
      ("https://ex.org:8443/p", "http://cdn1.ex-assets.net/x"), // port stripped
      ("https://ex.org/q", "/relative/ignored")  // relative → empty host
    ).toDF("src", "dst")
    val hosts = LinkGraph.hostGraph(links).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(hosts(("ex.org", "ex.org")) === 2L)
    assert(hosts(("ex.org", "cdn1.ex-assets.net")) === 1L)
    assert(hosts(("ex.org", "")) === 1L)
  }
}
