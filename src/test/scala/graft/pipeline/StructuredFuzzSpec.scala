package graft.pipeline

import graft.SparkSpec

/** Differential fuzz for the structured-data extractors: randomly
  * generated JSON-LD documents and tables with an independently mirrored
  * expected-row model, plus a mutation sweep asserting the tokenizer and
  * all three extractors degrade (fewer rows) instead of throwing on
  * arbitrarily corrupted markup. Seeded — failures replay exactly. */
class StructuredFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20250819L)

  private def pagesOf(html: Seq[String]) = {
    import spark.implicits._
    html.zipWithIndex.map { case (h, i) => (s"u$i", h.getBytes("UTF-8")) }
      .toDF("url", "html")
  }

  // ---- random JSON-LD with a mirrored flattening model ----

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def randScalarValue(): (String, String) = rnd.nextInt(5) match {
    case 0 =>
      val s = (0 until rnd.nextInt(8)).map(_ =>
        "abXY 9λ中\n\t\"\\".charAt(rnd.nextInt(12))).mkString
      ("\"" + jsonEscape(s) + "\"", s)
    case 1 => val n = rnd.nextInt(2000) - 1000; (n.toString, n.toString)
    case 2 => val d = s"${rnd.nextInt(100)}.${rnd.nextInt(100)}5"; (d, d)
    case 3 => val b = rnd.nextBoolean(); (b.toString, b.toString)
    case _ => ("null", "null")
  }

  private def ws(): String = Seq("", " ", "\n ", "  ")(rnd.nextInt(4))

  test("jsonld differential fuzz: 150 random documents match the mirrored model") {
    // generator builds (jsonText, nodeId) with explicit id plumbing; the
    // shared counter mirrors the extractor's pre-order numbering exactly
    def gen(url: String, counter: Array[Long], depth: Int,
            out: scala.collection.mutable.Buffer[(String, Long, String, String, String)]): (String, Long) = {
      counter(0) += 1
      val id = counter(0)
      val typ = if (rnd.nextBoolean()) s"T${rnd.nextInt(5)}" else ""
      val parts = scala.collection.mutable.Buffer.empty[String]
      if (typ.nonEmpty) parts += s""""@type":${ws()}"$typ""""
      if (rnd.nextInt(4) == 0) parts += """"@id":"ignored""""
      val nProps = rnd.nextInt(4)
      (0 until nProps).foreach { pi =>
        val prop = s"p$pi"
        rnd.nextInt(4) match {
          case 0 if depth < 2 =>
            val (childJson, childId) = gen(url, counter, depth + 1, out)
            out += ((url, id, typ, prop, s"#$childId"))
            parts += s""""$prop":$childJson"""
          case 1 =>
            val n = 1 + rnd.nextInt(3)
            val elems = (0 until n).map { _ =>
              val (j, v) = randScalarValue()
              out += ((url, id, typ, prop, v)); j
            }
            parts += s""""$prop":[${elems.mkString(",")}]"""
          case _ =>
            val (j, v) = randScalarValue()
            out += ((url, id, typ, prop, v))
            parts += s""""$prop":${ws()}$j"""
        }
      }
      (s"{${ws()}${parts.mkString("," + ws())}${ws()}}", id)
    }

    val expected = scala.collection.mutable.Buffer.empty[(String, Long, String, String, String)]
    val htmls = (0 until 150).map { i =>
      val url = s"u$i"
      val counter = Array(0L)
      val nBlocks = 1 + rnd.nextInt(3)
      val blocks = (0 until nBlocks).map { _ =>
        if (rnd.nextInt(5) == 0) // malformed block: must not shift ids
          """<script type="application/ld+json">{"x": }</script>"""
        else {
          val (json, _) =
            if (rnd.nextBoolean()) gen(url, counter, 0, expected)
            else { // top-level array of objects
              val n = 1 + rnd.nextInt(2)
              val objs = (0 until n).map(_ => gen(url, counter, 1, expected)._1)
              (s"[${objs.mkString(",")}]", 0L)
            }
          s"""<script type="application/ld+json">$json</script>"""
        }
      }.mkString
      s"<html><head>$blocks</head><body><p>noise &lt;</p></body></html>"
    }
    val got = Structured.jsonLd(pagesOf(htmls)).collect()
      .map(r => (r.url, r.node, r.nodetype, r.prop, r.value))
    // multiset compare (duplicate scalar values in arrays are legitimate)
    def bag(xs: Seq[(String, Long, String, String, String)]) =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    assert(bag(got.toSeq) == bag(expected.toSeq))
  }

  test("tables differential fuzz: 150 random tables match the mirrored model") {
    val expected = scala.collection.mutable.Buffer.empty[(String, Long, Long, Long, String, String)]
    val htmls = (0 until 150).map { i =>
      val url = s"u$i"
      val nTables = 1 + rnd.nextInt(3)
      val body = (1 to nTables).map { ti =>
        val cols = 1 + rnd.nextInt(4)
        val nRows = 1 + rnd.nextInt(4)
        val withHeader = rnd.nextBoolean()
        val headers = (1 to cols).map(c => if (rnd.nextInt(5) == 0) "" else s"h$c")
        val hdr =
          if (withHeader)
            "<tr>" + headers.map(h => s"<th> $h </th>").mkString + "</tr>"
          else ""
        val rows = (1 to nRows).map { ri =>
          val rc = if (rnd.nextInt(4) == 0) 1 + rnd.nextInt(cols + 1) else cols
          val cells = (1 to rc).map { ci =>
            val v = s"v${ri}x$ci"
            val h = if (withHeader && ci <= cols && headers(ci - 1).nonEmpty)
              headers(ci - 1) else s"col_$ci"
            expected += ((url, ti.toLong, ri.toLong, ci.toLong, h, v))
            s"<td>$v</td>"
          }.mkString
          s"<tr>$cells</tr>"
        }.mkString
        s"<table>$hdr$rows</table>"
      }.mkString
      s"<html><body>$body</body></html>"
    }
    val got = Structured.tables(pagesOf(htmls)).collect()
      .map(r => (r.url, r.table_idx, r.row_idx, r.col_idx, r.header, r.value)).toSet
    assert(got == expected.toSet)
  }

  test("mutation sweep: corrupted markup never throws in any extractor") {
    val base =
      """<html><head><script type="application/ld+json">{"@type":"P","n":"x","c":{"@type":"Q","m":[1,2]}}</script></head>
        |<body itemscope itemtype="T"><span itemprop="a">v</span>
        |<meta itemprop="b" content="w"><div itemprop="c" itemscope><i itemprop="d">y</i></div>
        |<table><tr><th>h</th></tr><tr><td>z</td></tr></table></body></html>""".stripMargin
    val mutants = (0 until 300).map { _ =>
      rnd.nextInt(4) match {
        case 0 => base.take(rnd.nextInt(base.length))
        case 1 =>
          val i = rnd.nextInt(base.length)
          base.take(i) + base.drop(math.min(base.length, i + 1 + rnd.nextInt(20)))
        case 2 =>
          val i = rnd.nextInt(base.length)
          base.take(i) + "<>\"'&/=".charAt(rnd.nextInt(7)) + base.drop(i)
        case _ =>
          val chars = base.toCharArray
          (0 until 10).foreach { _ =>
            chars(rnd.nextInt(chars.length)) = "<>\"'tds ".charAt(rnd.nextInt(8))
          }
          new String(chars)
      }
    }
    val df = pagesOf(mutants)
    // collect() would throw if any task threw — success IS the assertion
    Structured.microdata(df).collect()
    Structured.jsonLd(df).collect()
    Structured.tables(df).collect()
  }

  test("parseJson: strict on trailing garbage and bad escapes") {
    assert(Structured.parseJson("""{"a":1} x""").isEmpty)
    assert(Structured.parseJson("""{"a":01}""").isEmpty)
    assert(Structured.parseJson("""{"a":"\q"}""").isEmpty)
    assert(Structured.parseJson("{\"a\":\"\\" + "u12\"}").isEmpty) // truncated \u escape
    assert(Structured.parseJson("""{"a":[1,]}""").isEmpty)
    assert(Structured.parseJson("""{"a":1}""").nonEmpty)
    assert(Structured.parseJson(""" [ {"a":"A"} , -1.5e3 ] """).nonEmpty)
  }
}
