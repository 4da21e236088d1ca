package graft.sources

import graft.core.Kb
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** N-Triples interchange (W3C RDF 1.1 N-Triples) — the line-oriented dump
  * format KG pipelines exchange at crawl scale (one triple per line, no
  * document state), so a dump splits on newlines and both directions are
  * embarrassingly parallel: render is a row-local `map`, parse is
  * `spark.read.text` + a row-local kernel. No shuffle in either direction.
  *
  * The engine's CURIE-ish ids ("c:1", "contains") are not absolute IRIs, so
  * rendering wraps them under a `urn:graft:` base with percent-encoding of
  * the characters N-Triples forbids inside `<…>`; parsing reverses both.
  * Literals (the `attrs` table's lexical forms) render as typed literals
  * `"…"^^<xsd:…>` with the spec's ECHAR escapes (\" \\ \n \r \t \b \f) and
  * \uXXXX for other control characters.
  */
object NTriples {

  private val Base = "urn:graft:"
  private val Xsd = "http://www.w3.org/2001/XMLSchema#"

  // ---- row-local kernels -------------------------------------------------

  /** IRI-forbidden characters inside <...>: controls, space, <>"{}|^`\ —
    * percent-encoded (UTF-8) so any id roundtrips. '%' itself too. */
  def encodeIri(s: String): String = {
    val sb = new StringBuilder
    s.foreach { c =>
      if (c <= ' ' || "<>\"{}|^`\\%".indexOf(c) >= 0)
        c.toString.getBytes("UTF-8").foreach(b => sb.append(f"%%${b & 0xff}%02X"))
      else sb.append(c)
    }
    sb.toString
  }

  def decodeIri(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else { out.write(c.toString.getBytes("UTF-8")); i += 1 }
    }
    new String(out.toByteArray, "UTF-8")
  }

  def escapeLiteral(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04X")
      case c => sb.append(c)
    }
    sb.toString
  }

  def unescapeLiteral(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case 'u'  => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'U'  => sb.appendAll(Character.toChars(
            Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
          case o    => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def iriRef(id: String): String = s"<$Base${encodeIri(id)}>"

  def renderIriLine(subj: String, pred: String, obj: String): String =
    s"${iriRef(subj)} ${iriRef(pred)} ${iriRef(obj)} ."

  def renderLiteralLine(subj: String, pred: String, lexical: String, dtype: String): String =
    s"""${iriRef(subj)} ${iriRef(pred)} "${escapeLiteral(lexical)}"^^<$Xsd$dtype> ."""

  /** One parsed row. `kind` is "iri" or "literal"; `dtype` is the xsd local
    * name for literals, "" for IRIs. */
  final case class NtRow(subj: String, pred: String, obj: String, kind: String, dtype: String)

  private val iriLine =
    """^<([^>]*)> <([^>]*)> <([^>]*)> \.$""".r
  private val litLine =
    """^<([^>]*)> <([^>]*)> "((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>)? \.$""".r

  private def unbase(iri: String): String =
    decodeIri(if (iri.startsWith(Base)) iri.substring(Base.length) else iri)

  def parseLine(line: String): Option[NtRow] = line.trim match {
    case "" => None
    case l if l.startsWith("#") => None
    case iriLine(s, p, o) => Some(NtRow(unbase(s), unbase(p), unbase(o), "iri", ""))
    case litLine(s, p, o, dt) => Some(NtRow(unbase(s), unbase(p), unescapeLiteral(o),
      "literal", Option(dt).map(d => d.stripPrefix(Xsd)).getOrElse("string")))
    case _ => None
  }

  // ---- blank nodes (RDF 1.1 §3.4/§3.5: skolemization on ingest) ------------
  // Crawl-extracted RDF (microdata/JSON-LD conversions) is full of blank
  // nodes; the engine's data model wants every node to HAVE an id, so blanks
  // are skolemized at the parse boundary — deterministically, because a
  // distributed re-parse (task retry, resumed ingest) must mint the SAME id
  // for the same blank. skolem(label, scope) = "genid:" + 16 hex of
  // md5(scope|label): md5 hex is byte-identical on the JVM and in DuckDB,
  // so skolemized ingest stays fully oracle-checkable. Blank labels are
  // scoped to ONE RDF document — [[readBlanks]] scopes by file (two files'
  // `_:b0` are different nodes, per spec); [[parseBlanks]] takes a caller
  // scope for line streams that are one logical document.

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  def skolemId(label: String, scope: String): String =
    "genid:" + md5Hex(scope + "|" + label).substring(0, 16)

  // conservative PN_CHARS subset for labels; out-of-grammar lines drop like
  // any other junk (quarantine-sink note as parse)
  private val B = """_:([A-Za-z0-9_][A-Za-z0-9._-]*)"""
  private val iriBlankLine =
    s"""^(?:<([^>]*)>|$B) <([^>]*)> (?:<([^>]*)>|$B) \\.$$""".r
  private val litBlankLine =
    s"""^(?:<([^>]*)>|$B) <([^>]*)> "((?:[^"\\\\]|\\\\.)*)"(?:\\^\\^<([^>]*)>)? \\.$$""".r

  /** [[parseLine]] extended with `_:label` in subject/object position,
    * skolemized under `scope`. Pure-IRI lines parse identically. */
  def parseLineSkolem(line: String, scope: String): Option[NtRow] = {
    def term(iri: String, blank: String): String =
      if (iri != null) unbase(iri) else skolemId(blank, scope)
    line.trim match {
      case "" => None
      case l if l.startsWith("#") => None
      case iriBlankLine(s, sb, p, o, ob) =>
        Some(NtRow(term(s, sb), unbase(p), term(o, ob), "iri", ""))
      case litBlankLine(s, sb, p, o, dt) =>
        Some(NtRow(term(s, sb), unbase(p), unescapeLiteral(o),
          "literal", Option(dt).map(d => d.stripPrefix(Xsd)).getOrElse("string")))
      case _ => None
    }
  }

  // ---- distributed surfaces ----------------------------------------------

  /** KB → one N-Triples line per fact (types as rdf:type IRI triples, attrs
    * as typed literals, edges + TBox as IRI triples) — same coverage and
    * multiplicity as [[Kb.triples]]. */
  def render(kb: Kb): Dataset[String] = {
    val enc = Encoders.STRING
    val typeLines = kb.types.select(col("node"), col("cls"))
      .as[(String, String)](Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .map { case (n, c) => renderIriLine(n, graft.core.Schemas.RdfType, c) }(enc)
    val attrLines = kb.attrs.select(col("node"), col("prop"), col("lexical"), col("dtype"))
      .as[(String, String, String, String)](Encoders.tuple(
        Encoders.STRING, Encoders.STRING, Encoders.STRING, Encoders.STRING))
      .map { case (n, p, l, dt) => renderLiteralLine(n, p, l, dt) }(enc)
    val edgeLines = kb.edges.select(col("src"), col("pred"), col("dst"))
      .as[(String, String, String)](Encoders.tuple(
        Encoders.STRING, Encoders.STRING, Encoders.STRING))
      .map { case (s, p, o) => renderIriLine(s, p, o) }(enc)
    val tboxLines = kb.spark.createDataset(kb.tbox.tripleRows().map(t =>
      renderIriLine(t.subj, t.pred, t.obj)))(enc)
    typeLines.unionAll(attrLines).unionAll(edgeLines).unionAll(tboxLines)
  }

  /** Lines → parsed rows; unparseable/comment/blank lines are dropped (a
    * production ingest would route them to a quarantine sink). */
  def parse(lines: Dataset[String]): DataFrame =
    lines.mapPartitions(_.flatMap(parseLine))(Encoders.product[NtRow]).toDF()

  /** [[parse]] accepting blank nodes, skolemized under `scope` — for line
    * streams that are ONE logical RDF document (blank labels co-refer
    * across all lines). Still a row-local map, no shuffle. */
  def parseBlanks(lines: Dataset[String], scope: String = ""): DataFrame =
    lines.mapPartitions(_.flatMap(parseLineSkolem(_, scope)))(
      Encoders.product[NtRow]).toDF()

  /** Read a dump directory accepting blank nodes, each FILE its own blank
    * scope (an N-Triples document is a file, RDF 1.1 N-Triples §2: two
    * files' `_:b0` are distinct nodes). input_file_name() rides the text
    * scan, so scoping costs no extra pass and task retries re-mint
    * identical skolem ids. */
  def readBlanks(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    spark.read.text(path)
      .select(col("value"), input_file_name().as("file")).as(enc)
      .mapPartitions(_.flatMap { case (line, file) =>
        parseLineSkolem(line, file) })(Encoders.product[NtRow])
      .toDF()
  }

  /** The (subj, pred, obj) surface of a parsed dump — literals as their
    * lexical forms, matching the [[Kb.triples]] export. */
  def triples(parsed: DataFrame): DataFrame =
    parsed.select("subj", "pred", "obj")

  def write(kb: Kb, path: String): Unit =
    render(kb).write.mode("overwrite").text(path)

  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    parse(spark.read.textFile(path))

  // ---- N-Quads (W3C RDF 1.1 N-Quads) ---------------------------------------
  // The 4th term names the graph — here the PROVENANCE url of a claim, so
  // the (src, subj, pred, obj) claim stream interchanges losslessly (the
  // named-graph-per-source convention). Graph labels are already IRIs
  // (urls), so they render bare — percent-encoded for forbidden
  // characters but WITHOUT the urn:graft: base the CURIE-ish ids need;
  // `unbase` strips the base only when present, so both forms roundtrip
  // through one parser. IRI-object quads only (claims carry entity ids);
  // literal quads would compose exactly like renderLiteralLine.

  final case class NqRow(src: String, subj: String, pred: String, obj: String)

  /** Graph labels render bare; one adversarial case is disambiguated
    * explicitly — a label that itself STARTS with the urn:graft: base
    * would be mis-stripped by `unbase` on parse, so its first ':' is
    * percent-encoded (decodeIri restores it; the rendered IRI no longer
    * matches the base prefix). Totality over prettiness. */
  private def graphIri(g: String): String = {
    val enc = encodeIri(g)
    if (enc.startsWith(Base)) "<" + enc.replaceFirst(":", "%3A") + ">"
    else s"<$enc>"
  }

  def renderQuadLine(src: String, subj: String, pred: String, obj: String): String =
    s"${iriRef(subj)} ${iriRef(pred)} ${iriRef(obj)} ${graphIri(src)} ."

  private val quadLine =
    """^<([^>]*)> <([^>]*)> <([^>]*)> <([^>]*)> \.$""".r

  def parseQuadLine(line: String): Option[NqRow] = line.trim match {
    case "" => None
    case l if l.startsWith("#") => None
    case quadLine(s, p, o, g) => Some(NqRow(unbase(g), unbase(s), unbase(p), unbase(o)))
    case _ => None
  }

  /** claims(src, subj, pred, obj) → one N-Quads line per claim. Row-local
    * map, no shuffle. */
  def renderQuads(claims: DataFrame): Dataset[String] =
    claims.select(col("src"), col("subj"), col("pred"), col("obj"))
      .as[(String, String, String, String)](Encoders.tuple(
        Encoders.STRING, Encoders.STRING, Encoders.STRING, Encoders.STRING))
      .map { case (g, s, p, o) => renderQuadLine(g, s, p, o) }(Encoders.STRING)

  /** Lines → (src, subj, pred, obj); unparseable/comment/blank lines drop
    * (quarantine-sink note as [[parse]]). */
  def parseQuads(lines: Dataset[String]): DataFrame =
    lines.mapPartitions(_.flatMap(parseQuadLine))(Encoders.product[NqRow]).toDF()

  def writeQuads(claims: DataFrame, path: String): Unit =
    renderQuads(claims).write.mode("overwrite").text(path)

  def readQuads(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    parseQuads(spark.read.textFile(path))
}
