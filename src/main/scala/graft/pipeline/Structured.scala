package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Structured-data extraction from raw HTML — the Web Data Commons trio
  * (schema.org microdata, JSON-LD script blocks, web tables): how a
  * web-scale KG-construction pipeline gets TYPED claims out of pages
  * without an NLP stack. The reference's single-ontology world ships its
  * facts pre-structured; a crawl carries them as page markup.
  *
  * All three extractors are pure per-row Scala over ONE single-pass HTML
  * tokenizer (no regex backtracking over the document, no DOM
  * materialization — O(bytes) per page with a stack bounded by nesting
  * depth), applied via typed mapPartitions exactly like [[Extract]]:
  * deterministic on any partitioning, codegen-adjacent (one
  * deserialize-once pass per partition), and trivially data-parallel at
  * 100 TB because no state crosses rows.
  *
  * Implemented subsets (each documented, each degrading per-row — a
  * malformed page yields fewer rows, never a task failure):
  *
  *  - MICRODATA (WHATWG HTML §5): `itemscope` opens an item (ids assigned
  *    in document order, 1-based); `itemtype` rides on every row of the
  *    item; `itemprop` values come from the spec's per-tag sources
  *    (meta→content, a/area/link→href, img/audio/video/source/iframe/
  *    embed→src, time→datetime, data/meter→value, else the element's
  *    markup-stripped inner text, whitespace-collapsed). An element with
  *    both itemprop and itemscope links parent→child as value "#childId".
  *    Loose itemprops outside any itemscope are dropped. itemref is not
  *    supported (cross-tree references are rare in the wild and break the
  *    single-pass shape).
  *
  *  - JSON-LD: every `<script type="application/ld+json">` body parsed by
  *    a minimal recursive-descent JSON parser (objects keep field ORDER,
  *    so node numbering is deterministic); each object becomes a node
  *    (pre-order ids, 1-based per page across blocks), `@type` its type
  *    (first element when an array), non-@ keys become (node, prop,
  *    value) rows — scalars rendered verbatim (numbers keep their lexical
  *    form), nested objects as "#childId" references, arrays one row per
  *    element. `@context`/`@id`/other @-keys are skipped (no IRI
  *    expansion — the downstream canonicalizer owns identity). A block
  *    that fails to parse is skipped whole (per-row degradation).
  *
  *  - TABLES: each `<table>` (document-order idx, 1-based) with rows
  *    `<tr>` and cells `<th>`/`<td>`; when the first row is all-`<th>` it
  *    is the header row and data rows renumber from 1, else headers are
  *    synthetic "col_<i>". Cells are markup-stripped inner text. Nested
  *    tables get their own idx (and their text also flows into the
  *    enclosing cell — fixtures don't nest; documented, not load-bearing).
  */
object Structured {

  final case class MicroRow(url: String, item: Long, itemtype: String,
                            prop: String, value: String)
  final case class JsonLdRow(url: String, node: Long, nodetype: String,
                             prop: String, value: String)
  final case class TableRow(url: String, table_idx: Long, row_idx: Long,
                            col_idx: Long, header: String, value: String)

  /** pages(url, …, html, …) → microdata item-property rows. */
  def microdata(pages: DataFrame): Dataset[MicroRow] = {
    val in = pages.select("url", "html").as[Extract.PageIn](
      Encoders.product[Extract.PageIn])
    in.mapPartitions(_.flatMap(p => microdataOf(p.url,
      new String(p.html, java.nio.charset.StandardCharsets.UTF_8))))(
      Encoders.product[MicroRow])
  }

  /** pages(url, …, html, …) → flattened JSON-LD node-property rows. */
  def jsonLd(pages: DataFrame): Dataset[JsonLdRow] = {
    val in = pages.select("url", "html").as[Extract.PageIn](
      Encoders.product[Extract.PageIn])
    in.mapPartitions(_.flatMap(p => jsonLdOf(p.url,
      new String(p.html, java.nio.charset.StandardCharsets.UTF_8))))(
      Encoders.product[JsonLdRow])
  }

  /** pages(url, …, html, …) → web-table cells (the WebTables shape). */
  def tables(pages: DataFrame): Dataset[TableRow] = {
    val in = pages.select("url", "html").as[Extract.PageIn](
      Encoders.product[Extract.PageIn])
    in.mapPartitions(_.flatMap(p => tablesOf(p.url,
      new String(p.html, java.nio.charset.StandardCharsets.UTF_8))))(
      Encoders.product[TableRow])
  }

  // ---------------------------------------------------------------- tokenizer

  /** One HTML token: a tag (open or close) with lowercased name and attrs,
    * or a text/raw-content span. `raw` is the script/style body. */
  private sealed trait Tok
  private final case class TagTok(name: String, attrs: Map[String, String],
                                  isClose: Boolean, selfClose: Boolean) extends Tok
  private final case class TextTok(text: String) extends Tok
  private final case class RawTok(owner: String, body: String) extends Tok

  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")
  private val RawTags = Set("script", "style")

  /** Single pass, no backtracking: emits tags, text spans, and raw
    * script/style bodies. Tolerates unterminated constructs (consumes to
    * end of input). */
  private def tokenize(html: String)(emit: Tok => Unit): Unit = {
    val n = html.length
    var i = 0
    var textStart = 0
    def flushText(upTo: Int): Unit =
      if (upTo > textStart) emit(TextTok(html.substring(textStart, upTo)))
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { flushText(n); return }
      flushText(lt)
      if (html.startsWith("<!--", lt)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
        val end = html.indexOf('>', lt + 1)
        i = if (end < 0) n else end + 1
      } else {
        val isClose = lt + 1 < n && html.charAt(lt + 1) == '/'
        var j = lt + (if (isClose) 2 else 1)
        val nameStart = j
        while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
        if (j == nameStart) { // bare '<' in text — treat as text
          i = lt + 1
          textStart = lt
        } else {
          val name = html.substring(nameStart, j).toLowerCase
          var attrs = Map.empty[String, String]
          var selfClose = false
          var done = false
          while (!done && j < n) {
            while (j < n && html.charAt(j).isWhitespace) j += 1
            if (j < n && html.charAt(j) == '>') { j += 1; done = true }
            else if (j + 1 < n && html.charAt(j) == '/' && html.charAt(j + 1) == '>') {
              selfClose = true; j += 2; done = true
            } else if (j >= n) done = true
            else {
              val aStart = j
              while (j < n && !html.charAt(j).isWhitespace &&
                html.charAt(j) != '=' && html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
              val aName = html.substring(aStart, j).toLowerCase
              while (j < n && html.charAt(j).isWhitespace) j += 1
              var aVal = ""
              var hadEq = false
              if (j < n && html.charAt(j) == '=') {
                hadEq = true
                j += 1
                while (j < n && html.charAt(j).isWhitespace) j += 1
                if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val q = html.charAt(j)
                  val vStart = j + 1
                  val vEnd = html.indexOf(q, vStart)
                  if (vEnd < 0) { aVal = html.substring(vStart, n); j = n }
                  else { aVal = html.substring(vStart, vEnd); j = vEnd + 1 }
                } else {
                  val vStart = j
                  while (j < n && !html.charAt(j).isWhitespace && html.charAt(j) != '>') j += 1
                  aVal = html.substring(vStart, j)
                }
              }
              if (aName.nonEmpty && !attrs.contains(aName))
                attrs += aName -> (if (hadEq) aVal else "")
              else if (aName.isEmpty) j += 1 // defensive: never stall
            }
          }
          emit(TagTok(name, attrs, isClose, selfClose))
          i = j
          if (!isClose && !selfClose && RawTags(name)) {
            // raw content until the matching close tag (case-insensitive)
            val close = "</" + name
            var k = i
            var found = -1
            while (found < 0 && k < n) {
              val c = html.indexOf('<', k)
              if (c < 0 || c + close.length > n) { found = n; k = n }
              else if (html.regionMatches(true, c, close, 0, close.length)) found = c
              else k = c + 1
            }
            if (found < 0) found = n // raw tag opened at end of input
            emit(RawTok(name, html.substring(i, math.min(found, n))))
            // consume the close tag itself (if present)
            if (found < n) {
              val gt = html.indexOf('>', found)
              i = if (gt < 0) n else gt + 1
              emit(TagTok(name, Map.empty, isClose = true, selfClose = false))
            } else i = n
          }
          textStart = i
        }
      }
      if (i < n && textStart < i) textStart = i
    }
  }

  /** Markup-stripped text normalization: the minimal entity set
    * [[Extract.extractText]] decodes, whitespace collapsed, trimmed. */
  private def normText(s: String): String =
    s.replace("&copy;", "©").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replaceAll("\\s+", " ").trim

  // ---------------------------------------------------------------- microdata

  private def microdataOf(url: String, html: String): Iterator[MicroRow] = {
    val out = Vector.newBuilder[MicroRow]
    // element stack entries: (tagName, itemIdOpenedHere, captures opened here)
    final case class Capture(item: Long, itemtype: String, prop: String,
                             buf: StringBuilder)
    final case class Elem(name: String, openedItem: Boolean, caps: List[Capture])
    var elemStack = List.empty[Elem]
    // (itemId, itemtype) stack of open itemscopes
    var itemStack = List.empty[(Long, String)]
    var nextItem = 0L
    var activeCaps = List.empty[Capture] // all captures currently collecting

    tokenize(html) {
      case TagTok(name, attrs, false, selfClose) =>
        val void = VoidTags(name) || selfClose
        val hasScope = attrs.contains("itemscope")
        val itemtype = attrs.getOrElse("itemtype", "")
        val propAttr = attrs.get("itemprop").map(_.trim).filter(_.nonEmpty)
        // the prop belongs to the nearest ENCLOSING item (before this
        // element's own itemscope, if any, is pushed)
        val owner = itemStack.headOption
        var caps = List.empty[Capture]
        (propAttr, owner) match {
          case (Some(props), Some((oid, otyp))) =>
            // itemprop can be a space-separated list
            val names = props.split("\\s+").filter(_.nonEmpty)
            if (hasScope) {
              val childId = nextItem + 1
              names.foreach(p => out += MicroRow(url, oid, otyp, p, s"#$childId"))
            } else {
              val attrVal: Option[String] = name match {
                case "meta" => Some(attrs.getOrElse("content", ""))
                case "a" | "area" | "link" => Some(attrs.getOrElse("href", ""))
                case "img" | "audio" | "video" | "source" | "iframe" | "embed" =>
                  Some(attrs.getOrElse("src", ""))
                case "time" =>
                  attrs.get("datetime").orElse(if (void) Some("") else None)
                case "data" | "meter" => Some(attrs.getOrElse("value", ""))
                case _ => None
              }
              attrVal match {
                case Some(v) => names.foreach(p => out += MicroRow(url, oid, otyp, p, v))
                case None if !void =>
                  caps = names.toList.map(p => Capture(oid, otyp, p, new StringBuilder))
                case None => names.foreach(p => out += MicroRow(url, oid, otyp, p, ""))
              }
            }
          case _ => () // loose itemprop or no prop — nothing to emit
        }
        if (hasScope) { nextItem += 1; }
        if (!void) {
          if (hasScope) itemStack ::= (nextItem, itemtype)
          elemStack ::= Elem(name, openedItem = hasScope, caps)
          activeCaps = caps reverse_::: activeCaps
        } else if (hasScope) {
          // itemscope on a void tag: item exists but can hold no children;
          // nothing further to do (its id was consumed above)
          ()
        }
      case TagTok(name, _, true, _) =>
        // pop to the matching open element (ignore unmatched closes)
        if (elemStack.exists(_.name == name)) {
          var done = false
          while (!done && elemStack.nonEmpty) {
            val top = elemStack.head
            elemStack = elemStack.tail
            top.caps.foreach { c =>
              out += MicroRow(url, c.item, c.itemtype, c.prop, normText(c.buf.toString))
              activeCaps = activeCaps.filterNot(_ eq c)
            }
            if (top.openedItem && itemStack.nonEmpty) itemStack = itemStack.tail
            done = top.name == name
          }
        }
      case TextTok(t) => activeCaps.foreach(_.buf.append(t))
      case RawTok(_, _) => () // script/style bodies never contribute text
    }
    // unclosed elements at EOF: finalize their captures
    elemStack.foreach(_.caps.foreach(c =>
      out += MicroRow(url, c.item, c.itemtype, c.prop, normText(c.buf.toString))))
    out.result().iterator
  }

  // ---------------------------------------------------------------- JSON-LD

  private[pipeline] sealed trait JVal
  private[pipeline] final case class JObj(fields: Vector[(String, JVal)]) extends JVal
  private[pipeline] final case class JArr(items: Vector[JVal]) extends JVal
  private[pipeline] final case class JStr(s: String) extends JVal
  private[pipeline] final case class JNum(raw: String) extends JVal
  private[pipeline] final case class JBool(b: Boolean) extends JVal
  private[pipeline] case object JNull extends JVal

  /** Minimal strict JSON parser (recursive descent, field order kept).
    * Returns None on any syntax error — the caller skips the block. */
  private[pipeline] def parseJson(s: String): Option[Any] = {
    try {
      val p = new JsonP(s)
      p.ws()
      val v = p.value()
      p.ws()
      if (p.pos != s.length) None else Some(v)
    } catch { case _: Exception => None }
  }

  private final class JsonP(s: String) {
    var pos = 0
    def ws(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def fail(): Nothing = throw new IllegalArgumentException(s"json@$pos")
    private def expect(c: Char): Unit =
      if (pos < s.length && s.charAt(pos) == c) pos += 1 else fail()
    def value(): JVal = {
      if (pos >= s.length) fail()
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case c if c == '-' || c.isDigit => num()
        case _ => fail()
      }
    }
    private def lit(l: String): Unit =
      if (s.regionMatches(pos, l, 0, l.length)) pos += l.length else fail()
    private def obj(): JObj = {
      expect('{'); ws()
      val fs = Vector.newBuilder[(String, JVal)]
      if (pos < s.length && s.charAt(pos) == '}') { pos += 1; return JObj(Vector.empty) }
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':'); ws(); val v = value(); ws()
        fs += k -> v
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect('}'); more = false }
      }
      JObj(fs.result())
    }
    private def arr(): JArr = {
      expect('['); ws()
      val is = Vector.newBuilder[JVal]
      if (pos < s.length && s.charAt(pos) == ']') { pos += 1; return JArr(Vector.empty) }
      var more = true
      while (more) {
        ws(); is += value(); ws()
        if (pos < s.length && s.charAt(pos) == ',') pos += 1
        else { expect(']'); more = false }
      }
      JArr(is.result())
    }
    private def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (pos < s.length && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (pos >= s.length) fail()
          s.charAt(pos) match {
            case '"' => b += '"'; case '\\' => b += '\\'; case '/' => b += '/'
            case 'b' => b += '\b'; case 'f' => b += '\f'; case 'n' => b += '\n'
            case 'r' => b += '\r'; case 't' => b += '\t'
            case 'u' =>
              if (pos + 4 >= s.length) fail()
              b += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case _ => fail()
          }
          pos += 1
        } else if (c < ' ') fail()
        else { b += c; pos += 1 }
      }
      expect('"')
      b.result()
    }
    private def num(): JNum = {
      val start = pos
      if (s.charAt(pos) == '-') pos += 1
      while (pos < s.length && (s.charAt(pos).isDigit || "+-.eE".indexOf(s.charAt(pos)) >= 0)) pos += 1
      val raw = s.substring(start, pos)
      if (!raw.matches("""-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?""")) fail()
      JNum(raw)
    }
  }

  private def jsonLdOf(url: String, html: String): Iterator[JsonLdRow] = {
    val out = Vector.newBuilder[JsonLdRow]
    var nextNode = 0L
    var pendingLd = false

    def render(v: JVal): String = v match {
      case JStr(s) => s
      case JNum(r) => r
      case JBool(b) => b.toString
      case JNull => "null"
      case _ => "" // never called for composites
    }
    def typeOf(o: JObj): String = o.fields.collectFirst { case ("@type", t) => t } match {
      case Some(JStr(t)) => t
      case Some(JArr(items)) => items.collectFirst { case JStr(t) => t }.getOrElse("")
      case _ => ""
    }
    def flattenObj(o: JObj): Long = {
      nextNode += 1
      val id = nextNode
      val typ = typeOf(o)
      def emitVal(prop: String, v: JVal): Unit = v match {
        case child: JObj =>
          val cid = flattenObj(child)
          out += JsonLdRow(url, id, typ, prop, s"#$cid")
        case JArr(items) => items.foreach(emitVal(prop, _))
        case scalar => out += JsonLdRow(url, id, typ, prop, render(scalar))
      }
      o.fields.foreach { case (k, v) => if (!k.startsWith("@")) emitVal(k, v) }
      id
    }
    def roots(v: JVal): Unit = v match {
      case o: JObj => flattenObj(o); ()
      case JArr(items) => items.foreach(roots)
      case _ => () // top-level scalars carry no structure
    }

    tokenize(html) {
      case TagTok("script", attrs, false, _) =>
        pendingLd = attrs.get("type").exists(_.trim.equalsIgnoreCase("application/ld+json"))
      case RawTok("script", body) =>
        if (pendingLd) {
          parseJson(body) match {
            case Some(v: JVal) => roots(v)
            case _ => () // malformed block skipped whole (per-row degradation)
          }
          pendingLd = false
        }
      case _ => ()
    }
    out.result().iterator
  }

  // ---------------------------------------------------------------- tables

  private def tablesOf(url: String, html: String): Iterator[TableRow] = {
    val out = Vector.newBuilder[TableRow]
    var nextTable = 0L
    // per-open-table state: id, rows built so far (each: cells + wasTh)
    final case class Cell(buf: StringBuilder, isTh: Boolean)
    final case class TState(id: Long,
                            rows: scala.collection.mutable.ArrayBuffer[Vector[Cell]],
                            var cur: Vector[Cell], var inCell: Option[Cell])
    var tstack = List.empty[TState]

    def closeCell(): Unit = tstack.headOption.foreach { t =>
      t.inCell.foreach(c => t.cur :+= c)
      t.inCell = None
    }
    def closeRow(): Unit = tstack.headOption.foreach { t =>
      closeCell()
      if (t.cur.nonEmpty) t.rows += t.cur
      t.cur = Vector.empty
    }
    def closeTable(): Unit = tstack.headOption.foreach { t =>
      closeRow()
      tstack = tstack.tail
      val rows = t.rows.toVector
      if (rows.nonEmpty) {
        val hasHeader = rows.head.forall(_.isTh) && rows.head.nonEmpty
        val headers = if (hasHeader) rows.head.map(c => normText(c.buf.toString)) else Vector.empty
        val data = if (hasHeader) rows.tail else rows
        data.zipWithIndex.foreach { case (r, ri) =>
          r.zipWithIndex.foreach { case (c, ci) =>
            val h = if (ci < headers.length && headers(ci).nonEmpty) headers(ci)
                    else s"col_${ci + 1}"
            out += TableRow(url, t.id, ri + 1L, ci + 1L, h, normText(c.buf.toString))
          }
        }
      }
    }

    tokenize(html) {
      case TagTok("table", _, false, false) =>
        nextTable += 1
        tstack ::= TState(nextTable, scala.collection.mutable.ArrayBuffer.empty,
          Vector.empty, None)
      case TagTok("table", _, true, _) => closeTable()
      case TagTok("tr", _, false, false) => closeRow()
      case TagTok("tr", _, true, _) => closeRow()
      case TagTok(n @ ("th" | "td"), _, false, false) =>
        tstack.headOption.foreach { t =>
          closeCell()
          t.inCell = Some(Cell(new StringBuilder, n == "th"))
        }
      case TagTok("th" | "td", _, true, _) => closeCell()
      case TextTok(txt) =>
        tstack.headOption.foreach(_.inCell.foreach(_.buf.append(txt)))
      case _ => ()
    }
    while (tstack.nonEmpty) closeTable() // unclosed tables at EOF
    out.result().iterator
  }
}
