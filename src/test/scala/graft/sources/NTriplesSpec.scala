package graft.sources

import graft.SparkSpec

class NTriplesSpec extends SparkSpec {

  test("literal escaping roundtrips hostile strings byte-exactly") {
    val hostile = Seq(
      "plain", "with \"quotes\"", "back\\slash", "new\nline", "cr\rlf",
      "tab\there", "bell\u0007", "\u0000nul", "unicode é ü 漢字 🎉", "")
    hostile.foreach { s =>
      val esc = NTriples.escapeLiteral(s)
      assert(!esc.contains('\n') && !esc.contains('\r'), s"raw newline in: $esc")
      assert(NTriples.unescapeLiteral(esc) === s)
    }
    // \U supplementary-plane escape is accepted on parse
    assert(NTriples.unescapeLiteral("\\U0001F389") === "🎉")
  }

  test("iri percent-encoding roundtrips forbidden characters") {
    val nasty = Seq("c:1", "has space", "a<b>c", "p|q^r`s", "curly{x}", "100%", "é")
    nasty.foreach { s =>
      val enc = NTriples.encodeIri(s)
      assert(!enc.exists(c => c <= ' ' || "<>\"{}|^`\\".indexOf(c) >= 0), enc)
      assert(NTriples.decodeIri(enc) === s)
    }
  }

  test("parseLine: iri triples, typed + plain literals, junk dropped") {
    assert(NTriples.parseLine("<urn:graft:a> <urn:graft:p> <urn:graft:b> .") ===
      Some(NTriples.NtRow("a", "p", "b", "iri", "")))
    assert(NTriples.parseLine(
      """<urn:graft:a> <urn:graft:dp> "v \"x\""^^<http://www.w3.org/2001/XMLSchema#string> .""") ===
      Some(NTriples.NtRow("a", "dp", "v \"x\"", "literal", "string")))
    assert(NTriples.parseLine("""<urn:graft:a> <urn:graft:dp> "plain" .""") ===
      Some(NTriples.NtRow("a", "dp", "plain", "literal", "string")))
    assert(NTriples.parseLine("# comment") === None)
    assert(NTriples.parseLine("   ") === None)
    assert(NTriples.parseLine("not a triple") === None)
  }

  test("render/parse roundtrip covers the whole KB triple surface") {
    val kb = TpchKg.load(spark, "/root/testdata/sf0.001")
    val direct = kb.triples.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    val round = NTriples.triples(NTriples.parse(NTriples.render(kb))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(round === direct)
    // kinds partition correctly: literal rows == attrs rows
    val parsed = NTriples.parse(NTriples.render(kb))
    assert(parsed.filter(parsed("kind") === "literal").count() === kb.attrs.count())
  }

  test("n-quads: graph term carries provenance, hostile urls roundtrip") {
    val rows = Seq(
      ("https://ex.org/doc/1?a=b&c=d", "entA_1", "bornIn", "city_2"),
      ("https://ex.org/white space<>", "e \"q\"", "p|p", "o\\o"),
      ("urn:graft:looks-like-base", "s", "p", "o"))
    rows.foreach { case (g, s, p, o) =>
      val line = NTriples.renderQuadLine(g, s, p, o)
      assert(NTriples.parseQuadLine(line) === Some(NTriples.NqRow(g, s, p, o)))
    }
    assert(NTriples.parseQuadLine("# comment").isEmpty)
    assert(NTriples.parseQuadLine("").isEmpty)
    assert(NTriples.parseQuadLine("<a> <b> <c> .").isEmpty) // triple, not quad
  }

  test("n-quads write/read file roundtrip on a claim set") {
    import spark.implicits._
    val claims = Seq(
      ("https://ex.org/1", "a", "p", "b"),
      ("https://ex.org/2", "a", "p", "c"),
      ("https://ex.org/2", "x y", "q", "z"))
      .toDF("src", "subj", "pred", "obj")
    val dir = java.nio.file.Files.createTempDirectory("nq_spec_").toString
    NTriples.writeQuads(claims, dir)
    val back = NTriples.readQuads(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(back === claims.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet)
  }

  test("write/read file roundtrip") {
    val kb = TpchKg.load(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("nt_").toString
    NTriples.write(kb, dir)
    val back = NTriples.read(spark, dir)
    assert(back.count() === kb.triples.count())
  }
}
