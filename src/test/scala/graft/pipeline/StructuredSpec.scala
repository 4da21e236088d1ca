package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structured-data extraction units: microdata nesting + per-tag value
  * sources, JSON-LD flattening + malformed-block degradation, table
  * header/ragged/nested handling, and parser robustness on adversarial
  * markup (nothing may throw; results must be exactly the documented
  * subset). */
class StructuredSpec extends SparkSpec {

  private def pagesOf(html: String*) = {
    import spark.implicits._
    html.zipWithIndex.map { case (h, i) =>
      (s"u$i", h.getBytes("UTF-8"))
    }.toDF("url", "html")
  }

  private def micro(html: String) =
    Structured.microdata(pagesOf(html)).collect()
      .map(r => (r.item, r.itemtype, r.prop, r.value)).toSet

  test("microdata: nesting, per-tag sources, space-separated props, loose drop") {
    val html =
      """<html><body>
        |<div itemscope itemtype="https://schema.org/Article">
        |  <span itemprop="author">  Ada   Lovelace </span>
        |  <meta itemprop="datePublished" content="2025-01-02">
        |  <a itemprop="url" href="https://ex.org/a">ignored text</a>
        |  <time itemprop="dateModified" datetime="2025-02-03">Feb 3</time>
        |  <img itemprop="image" src="https://ex.org/i.png">
        |  <div itemprop="publisher" itemscope itemtype="https://schema.org/Org">
        |    <span itemprop="name">Acme <b>Corp</b></span>
        |  </div>
        |  <span itemprop="p q">both</span>
        |</div>
        |<span itemprop="loose">dropped</span>
        |</body></html>""".stripMargin
    val rows = micro(html)
    val art = "https://schema.org/Article"
    assert(rows == Set(
      (1L, art, "author", "Ada Lovelace"),
      (1L, art, "datePublished", "2025-01-02"),
      (1L, art, "url", "https://ex.org/a"),
      (1L, art, "dateModified", "2025-02-03"),
      (1L, art, "image", "https://ex.org/i.png"),
      (1L, art, "publisher", "#2"),
      (1L, art, "p", "both"),
      (1L, art, "q", "both"),
      (2L, "https://schema.org/Org", "name", "Acme Corp")))
  }

  test("microdata: single-quoted/unquoted attrs, comments, unclosed at EOF") {
    val html =
      """<div itemscope itemtype='T'><!-- <span itemprop="x">no</span> -->
        |<span itemprop=name>tail""".stripMargin
    assert(micro(html) == Set((1L, "T", "name", "tail")))
  }

  test("microdata: adversarial markup never throws, emits only the subset") {
    val nasty = Seq(
      "<div itemscope><span itemprop=", // truncated tag
      "<div itemscope itemprop=self>text</div>", // itemprop without enclosing item: dropped
      "</div></span><div itemscope itemtype=\"T\"><p itemprop=a>x", // unmatched closes
      "a < b > c <div itemscope itemtype=T><i itemprop=v>1</i></div>", // bare <
      "<script>var x = '<div itemscope><span itemprop=k>no</span>'</script>" +
        "<div itemscope itemtype=T><span itemprop=k>yes</span></div>")
    val rows = Structured.microdata(pagesOf(nasty: _*)).collect()
    assert(rows.forall(r => r.value != "no" && r.value != "self"))
    assert(rows.exists(r => r.url == "u4" && r.prop == "k" && r.value == "yes"))
    assert(rows.exists(r => r.url == "u3" && r.prop == "v" && r.value == "1"))
  }

  test("jsonld: flattening, arrays, nested refs, @-keys skipped, number lexical form") {
    val html =
      """<head><script type="application/ld+json">
        |{"@context":"https://schema.org","@type":"Person","name":"Ada",
        | "age":36, "brave":true, "middle":null,
        | "worksFor":{"@type":"Org","name":"RSoc"},
        | "knows":[{"@type":"Person","name":"Babbage"},"Byron"],
        | "score": 1.50}
        |</script></head>""".stripMargin
    val rows = Structured.jsonLd(pagesOf(html)).collect()
      .map(r => (r.node, r.nodetype, r.prop, r.value)).toSet
    assert(rows == Set(
      (1L, "Person", "name", "Ada"),
      (1L, "Person", "age", "36"),
      (1L, "Person", "brave", "true"),
      (1L, "Person", "middle", "null"),
      (1L, "Person", "worksFor", "#2"),
      (2L, "Org", "name", "RSoc"),
      (1L, "Person", "knows", "#3"),
      (3L, "Person", "name", "Babbage"),
      (1L, "Person", "knows", "Byron"),
      (1L, "Person", "score", "1.50")))
  }

  test("jsonld: malformed block skipped whole, later block still parsed; node ids span blocks") {
    val html =
      """<script type="application/ld+json">{"@type":"A","x": }</script>
        |<script type="text/javascript">{"@type":"NOT","x":1}</script>
        |<script type="application/ld+json">[{"@type":"B","y":"1"},{"@type":"C","z":"2"}]</script>""".stripMargin
    val rows = Structured.jsonLd(pagesOf(html)).collect()
      .map(r => (r.node, r.nodetype, r.prop, r.value)).toSet
    assert(rows == Set((1L, "B", "y", "1"), (2L, "C", "z", "2")))
  }

  test("jsonld: string escapes and @type array") {
    val html =
      """<script type="application/ld+json">{"@type":["T1","T2"],"s":"a\"b\\c\ndA"}</script>"""
    val rows = Structured.jsonLd(pagesOf(html)).collect()
    assert(rows.length == 1)
    assert(rows.head.nodetype == "T1")
    assert(rows.head.value == "a\"b\\c\ndA")
  }

  test("tables: header row, data renumbering, ragged row, headerless table") {
    val html =
      """<table><tr><th>k</th><th>v</th></tr>
        |<tr><td>city</td><td>Paris</td></tr>
        |<tr><td>pop</td><td>2M</td><td>extra</td></tr></table>
        |<table><tr><td>a</td><td>b</td></tr></table>""".stripMargin
    val rows = Structured.tables(pagesOf(html)).collect()
      .map(r => (r.table_idx, r.row_idx, r.col_idx, r.header, r.value)).toSet
    assert(rows == Set(
      (1L, 1L, 1L, "k", "city"), (1L, 1L, 2L, "v", "Paris"),
      (1L, 2L, 1L, "k", "pop"), (1L, 2L, 2L, "v", "2M"),
      (1L, 2L, 3L, "col_3", "extra"),
      (2L, 1L, 1L, "col_1", "a"), (2L, 1L, 2L, "col_2", "b")))
  }

  test("tables: mixed first row is data, unclosed cells/rows at EOF survive") {
    val html = "<table><tr><th>h</th><td>d</td><tr><td>x"
    val rows = Structured.tables(pagesOf(html)).collect()
      .map(r => (r.row_idx, r.col_idx, r.header, r.value)).toSet
    assert(rows == Set(
      (1L, 1L, "col_1", "h"), (1L, 2L, "col_2", "d"), (2L, 1L, "col_1", "x")))
  }

  test("all three extractors are partitioning-invariant") {
    val html = (0 until 64).map { i =>
      s"""<div itemscope itemtype="T"><span itemprop="n">$i</span></div>
         |<script type="application/ld+json">{"@type":"P","i":$i}</script>
         |<table><tr><th>h</th></tr><tr><td>$i</td></tr></table>""".stripMargin
    }
    val p1 = pagesOf(html: _*).repartition(1)
    val p8 = pagesOf(html: _*).repartition(8)
    assert(Structured.microdata(p1).collect().toSet == Structured.microdata(p8).collect().toSet)
    assert(Structured.jsonLd(p1).collect().toSet == Structured.jsonLd(p8).collect().toSet)
    assert(Structured.tables(p1).collect().toSet == Structured.tables(p8).collect().toSet)
  }
}
