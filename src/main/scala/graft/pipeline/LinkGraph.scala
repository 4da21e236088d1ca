package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Hyperlink-graph construction from raw page html — the web-graph side of
  * a Common-Crawl-style ingest (cc-webgraph publishes exactly these two
  * artifacts per crawl: a page-level edge list and its host-level quotient).
  *
  * Page-level extraction is a row-local pure kernel applied via typed
  * `mapPartitions` (same contract as [[Extract]]: identical input bytes →
  * identical links on any partitioning, one deserialize-once pass, no UDF
  * registration). At 10^12 pages the edge list is embarrassingly parallel
  * map output — no shuffle at all until an aggregation is asked for.
  *
  * The host-level quotient is ONE partial aggregate: `groupBy(src_host,
  * dst_host).count` map-side-combines per partition before the exchange, so
  * the shuffle carries at most |hosts|² rows per task — hosts number ~10^8
  * against 10^12 pages and the per-partition combine collapses the heavy
  * intra-host mass (most links are site-internal) before it moves.
  */
object LinkGraph {

  /** `<a href="...">` targets, in document order, duplicates kept (the web
    * graph is a multigraph; the host quotient wants link multiplicity).
    * Single-quoted and unquoted href forms are accepted like a lenient
    * crawler's parser would. */
  def extractLinks(html: Array[Byte]): Seq[String] = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    hrefRe.findAllMatchIn(s)
      .map(m => Option(m.group(1)).orElse(Option(m.group(2))).getOrElse(m.group(3)))
      .toSeq
  }

  private val hrefRe =
    """(?is)<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>'"]+))""".r

  final case class LinkRow(src: String, dst: String)

  /** pages(url, …, html, …) → every (src page, dst url) anchor edge. */
  def links(pages: DataFrame): Dataset[LinkRow] = {
    val in = pages.select("url", "html")
      .as[Extract.PageIn](Encoders.product[Extract.PageIn])
    in.mapPartitions(_.flatMap(p =>
      extractLinks(p.html).map(LinkRow(p.url, _))))(Encoders.product[LinkRow])
  }

  /** `<a href>` targets WITH their anchor text (tags inside the element
    * stripped, whitespace collapsed) — the classic entity-linking /
    * retrieval training signal (anchor text describes the TARGET page).
    * Requires a closing `</a>`; anchors [[extractLinks]] accepts without
    * one are skipped here, so the two surfaces may legitimately differ. */
  def extractAnchors(html: Array[Byte]): Seq[(String, String)] = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    anchorRe.findAllMatchIn(s).map { m =>
      val href = Option(m.group(1)).orElse(Option(m.group(2))).getOrElse(m.group(3))
      val text = m.group(4).replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim
      (href, text)
    }.toSeq
  }

  private val anchorRe =
    """(?is)<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>'"]+))[^>]*>(.*?)</a>""".r

  final case class AnchorRow(src: String, dst: String, anchor: String)

  /** pages(url, …, html, …) → (src, dst, anchor text) rows — same
    * embarrassingly-parallel map contract as [[links]]. */
  def anchors(pages: DataFrame): Dataset[AnchorRow] = {
    val in = pages.select("url", "html")
      .as[Extract.PageIn](Encoders.product[Extract.PageIn])
    in.mapPartitions(_.flatMap(p =>
      extractAnchors(p.html).map { case (d, t) => AnchorRow(p.url, d, t) }))(
      Encoders.product[AnchorRow])
  }

  /** Crawl frontier: link targets never fetched, with their in-reference
    * count (the priority signal a crawler schedules by). Aggregate-then-
    * anti: the dst side collapses to distinct urls via ONE map-side-partial
    * aggregate BEFORE the anti-join, so the join's probe side is |discovered
    * urls|, not |links|, and both sides key on url (co-partitionable with a
    * url-bucketed page store at scale). */
  def frontier(links: DataFrame, pages: DataFrame): DataFrame =
    links.groupBy(col("dst").as("url"))
      .agg(count(lit(1)).as("n_refs"))
      .join(pages.select("url"), Seq("url"), "left_anti")

  /** [[frontier]] with a Bloom-filter prefilter on the visited set — the
    * 10¹²-url shape: `might_contain` has NO false negatives, so targets
    * the filter rejects are DEFINITELY uncrawled and skip the anti-join
    * entirely; only the (tiny) possibly-crawled slice — true hits plus the
    * fpp — rides the exact anti-join. The result is EXACTLY [[frontier]]
    * (false positives are re-checked, never dropped); what changes is the
    * join probe side: |discovered ∩ crawled| + fpp·|discovered| instead of
    * |discovered|. The filter itself is one aggregate over the crawled
    * urls, broadcast once. */
  def frontierBloom(links: DataFrame, pages: DataFrame,
                    fpp: Double = 0.01,
                    expectedItems: Long = 0L): DataFrame = {
    import org.apache.spark.sql.Encoders
    val spark = links.sparkSession
    val refs = links.groupBy(col("dst").as("url"))
      .agg(count(lit(1)).as("n_refs"))
    val crawled = pages.select("url")
    val n = if (expectedItems > 0) expectedItems else math.max(crawled.count(), 1L)
    val bloom = spark.sparkContext.broadcast(
      crawled.stat.bloomFilter("url", n, fpp))
    val enc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    val refsDs = refs.as[(String, Long)](enc)
    val definite = refsDs.filter(t => !bloom.value.mightContain(t._1))
      .toDF("url", "n_refs")
    val maybe = refsDs.filter(t => bloom.value.mightContain(t._1))
      .toDF("url", "n_refs")
      .join(crawled, Seq("url"), "left_anti")
    definite.unionAll(maybe)
  }

  /** Lowercased registered host of an absolute url; empty for relative or
    * malformed targets (a real crawl resolves those against the base url —
    * the synthetic corpus only emits absolute hrefs). */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))

  /** Host-level quotient graph with link multiplicity. */
  def hostGraph(links: DataFrame): DataFrame =
    links.groupBy(
      hostOf(col("src")).as("src_host"),
      hostOf(col("dst")).as("dst_host"))
      .agg(count(lit(1)).as("n_links"))

  /** Politeness-scheduled fetch plan over a crawl frontier: per HOST the
    * urls are served FIFO by priority (n_refs desc, url asc — deterministic)
    * with one fetch every `crawlDelayMs` (RFC 9309's Crawl-delay semantics;
    * real schedulers keep exactly this per-host queue). Emits (url, host,
    * slot, fetch_at_ms). ONE host-keyed window — hosts schedule in
    * parallel, which is the actual crawl-scheduler shape: the per-host
    * queue is sequential BY POLICY, so a window per host is the maximum
    * legal parallelism, not a compromise. At 10⁸ hosts the exchange is
    * well-spread; a single mega-host is bounded by its own politeness
    * delay, not by Spark. */
  def schedule(frontier: DataFrame, crawlDelayMs: Long = 1000L,
               hostDelays: Option[DataFrame] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("n_refs").desc, col("url"))
    val slotted = frontier
      .select(col("url"), col("n_refs"), hostOf(col("url")).as("host"))
      .withColumn("slot", row_number().over(w).cast("long") - 1L)
    // per-host Crawl-delay overrides (Robots.crawlDelay harvested per host
    // — a host-catalog dim, broadcast); hosts without an override pace at
    // the default
    val paced = hostDelays match {
      case Some(hd) => slotted
        .join(broadcast(hd.select(col("host"), col("delay_ms"))), Seq("host"), "left")
        .withColumn("eff_delay", coalesce(col("delay_ms"), lit(crawlDelayMs)))
      case None => slotted.withColumn("eff_delay", lit(crawlDelayMs))
    }
    paced.select(col("url"), col("host"), col("slot"),
      (col("slot") * col("eff_delay")).as("fetch_at_ms"))
  }

  /** Anchor-text index: for each link TARGET, the top-`k` anchor terms by
    * frequency (count desc, term asc — deterministic) — the classic
    * retrieval / entity-linking signal aggregated target-side ("anchor text
    * describes the TARGET page"). Terms are lowercased whitespace tokens of
    * the anchor element text. Shape: explode (map-side) → ONE partial
    * (dst, term) count aggregate → one dst-keyed window for the top-k cut;
    * column named `arank` (not `rank` — reserved downstream). */
  def anchorIndex(anchors: DataFrame, k: Int = 3): DataFrame = {
    val terms = anchors
      .select(col("dst"), explode(split(lower(col("anchor")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("dst"), col("term")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst")).orderBy(col("n").desc, col("term"))
    terms.withColumn("arank", row_number().over(w).cast("long"))
      .filter(col("arank") <= k)
  }

  /** Anchor-text entity-linking dictionary (Spitkovsky & Chang, "A
    * cross-lingual dictionary for English Wikipedia concepts", LREC'12 —
    * the web-scale way an alias catalog is MINED rather than curated):
    * per (anchor, target) the link count and the anchor's commonness
    * P(target | anchor) in truncating integer micro-units, top-k targets
    * per anchor. Feeds [[Link]]/[[Disambiguate]] as (surface, entity_id,
    * prior) directly. Two map-side-combinable aggregates + one per-anchor
    * top-k window (keyed, never global); at web scale hot anchors ("here")
    * have huge target fan-in but the window only sorts that anchor's
    * DISTINCT targets, already reduced by the count aggregate. */
  def anchorDict(anchors: DataFrame, k: Int = 3): DataFrame = {
    val counts = anchors.groupBy(col("anchor"), col("dst"))
      .agg(count(lit(1)).as("n_links"))
    val tot = counts.groupBy(col("anchor")).agg(sum(col("n_links")).as("t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor")).orderBy(col("n_links").desc, col("dst"))
    counts.join(tot, "anchor")
      .withColumn("commonness_micros", expr("1000000 * n_links div t"))
      .withColumn("arank", row_number().over(w).cast("long"))
      .filter(col("arank") <= k)
      .select(col("anchor"), col("dst"), col("n_links"),
        col("commonness_micros"), col("arank"))
  }

  /** The link graph as a first-class [[Kb]] (nodes = every url on either
    * side, edges under a single `links` predicate, empty ABox/TBox) — so
    * the whole sampler/analytics stack (PageRank, samplers, k-core,
    * components) runs on the web graph unchanged. */
  def asKb(links: DataFrame): graft.core.Kb = {
    val spark = links.sparkSession
    val edges = links.select(col("src"), lit("links").as("pred"), col("dst"))
    val nodes = links.select(col("src").as("id"))
      .unionAll(links.select(col("dst").as("id"))).distinct()
    def empty(fields: String*) = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(fields.map(f =>
        org.apache.spark.sql.types.StructField(f,
          org.apache.spark.sql.types.StringType))))
    graft.core.Kb(nodes, edges,
      attrs = empty("node", "prop", "lexical", "dtype"),
      types = empty("node", "cls"),
      tbox = graft.core.Tbox.empty)
  }
}
