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

  test("blank nodes: skolemized deterministically, labels co-refer within a scope") {
    val s1 = NTriples.parseLineSkolem("_:b0 <urn:graft:p> <urn:graft:x> .", "doc1").get
    val s2 = NTriples.parseLineSkolem("<urn:graft:y> <urn:graft:q> _:b0 .", "doc1").get
    // same label + scope → the SAME skolem id, in subject and object position
    assert(s1.subj === s2.obj)
    assert(s1.subj === NTriples.skolemId("b0", "doc1"))
    assert(s1.subj.startsWith("genid:") && s1.subj.length === "genid:".length + 16)
    // different scope (another RDF document) → a DIFFERENT node, per spec
    val other = NTriples.parseLineSkolem("_:b0 <urn:graft:p> <urn:graft:x> .", "doc2").get
    assert(other.subj !== s1.subj)
    // literal with a blank subject; blank-to-blank line
    val lit = NTriples.parseLineSkolem(
      """_:b0 <urn:graft:score> "7"^^<http://www.w3.org/2001/XMLSchema#int> .""", "doc1").get
    assert(lit.subj === s1.subj && lit.obj === "7" && lit.dtype === "int")
    val bb = NTriples.parseLineSkolem("_:b0 <urn:graft:p> _:b1 .", "doc1").get
    assert(bb.subj === s1.subj && bb.obj === NTriples.skolemId("b1", "doc1"))
    // pure-IRI lines parse identically to parseLine; junk labels drop
    val iri = "<urn:graft:a> <urn:graft:p> <urn:graft:b> ."
    assert(NTriples.parseLineSkolem(iri, "any") === NTriples.parseLine(iri))
    assert(NTriples.parseLineSkolem("_: <urn:graft:p> <urn:graft:x> .", "d").isEmpty)
    assert(NTriples.parseLineSkolem("_:.bad <urn:graft:p> <urn:graft:x> .", "d").isEmpty)
  }

  test("blank-node parser fuzz: skolem grammar never crashes, accepts ⊆ render space") {
    val rnd = new scala.util.Random(71)
    val labelChars = "abAB09._-:?* \"\\<>"
    (0 until 500).foreach { _ =>
      val label = (0 until 1 + rnd.nextInt(8))
        .map(_ => labelChars(rnd.nextInt(labelChars.length))).mkString
      val line = s"_:$label <urn:graft:p> <urn:graft:o> ."
      // never throws; a FULLY-legal label must parse to exactly the
      // published skolem formula; any accepted line yields a genid subject
      // (hostile labels may split at the grammar boundary — the tail is
      // then junk inside the loose [^>]* IRI space, same as parseLine)
      NTriples.parseLineSkolem(line, "fz") match {
        case Some(row) =>
          assert(row.subj.startsWith("genid:"), s"'$label' → ${row.subj}")
        case None => ()
      }
      if (label.matches("[A-Za-z0-9_][A-Za-z0-9._-]*"))
        assert(NTriples.parseLineSkolem(line, "fz").map(_.subj)
          === Some(NTriples.skolemId(label, "fz")), s"legal '$label' mishandled")
    }
    // rendered pure-IRI lines always parse identically under both parsers
    (0 until 200).foreach { i =>
      val s0 = s"id ${rnd.nextInt(1000)}<>"
      val line = NTriples.renderIriLine(s0, s"p$i", s0.reverse)
      assert(NTriples.parseLineSkolem(line, "any") === NTriples.parseLine(line))
      assert(NTriples.parseLineSkolem(line, "any").get.subj === s0)
    }
  }

  test("readBlanks: each FILE is its own blank scope; task retry determinism") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ntb_").toString
    val lines = Seq("_:b0 <urn:graft:p> <urn:graft:x> .")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f1.nt"),
      lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f2.nt"),
      lines.mkString("\n").getBytes("UTF-8"))
    val got = NTriples.readBlanks(spark, dir).select("subj").as[String].collect()
    // same label in two files = two DISTINCT nodes
    assert(got.length === 2 && got.toSet.size === 2)
    // re-read mints identical ids (what a task retry must guarantee)
    assert(NTriples.readBlanks(spark, dir).select("subj").as[String].collect().toSet
      === got.toSet)
  }
}
