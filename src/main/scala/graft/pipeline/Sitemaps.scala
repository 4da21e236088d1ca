package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap ingestion (sitemaps.org XML protocol — the crawl-discovery
  * channel robots.txt points at): `<sitemapindex>` expansion and
  * `<urlset>` entry extraction, plus the frontier merge that turns
  * entries into fetch candidates.
  *
  * Scale shape: a crawl holds billions of sitemap FILES but each file is
  * spec-capped (50k URLs / 50 MB), so parsing is a pure per-row kernel —
  * `regexp_extract_all` block split + per-block field extracts, all
  * codegen, NO UDF and NO shuffle until the caller joins. Index
  * expansion is one equi-join from child locs back to the fetched
  * sitemap table (index files are tiny and broadcastable); the frontier
  * merge is the same anti-join shape as [[LinkGraph]]'s.
  *
  * Lexical contract: `loc`/`lastmod`/`changefreq` come back trimmed
  * exactly as written (lastmod is the W3C datetime LEXICAL form — no
  * timezone parsing on the gate surface); `priority` is decimal-parsed
  * into exact integer milli-units (spec default 0.5 → 500), keeping
  * float division off the gate like every other *_micro/_milli surface.
  */
object Sitemaps {

  private def field(tag: String) =
    regexp_extract(col("block"), s"(?s)<$tag>\\s*(.*?)\\s*</$tag>", 1)

  /** `<sitemapindex>` → one row per referenced child sitemap:
    * (index_url, child_loc). */
  def indexChildren(sitemaps: DataFrame, urlCol: String = "url",
                    bodyCol: String = "body"): DataFrame =
    sitemaps
      .select(col(urlCol).as("index_url"),
        explode(expr(s"regexp_extract_all($bodyCol, '(?s)<sitemap>(.*?)</sitemap>', 1)")).as("block"))
      .select(col("index_url"), field("loc").as("child_loc"))
      .filter(col("child_loc") =!= "")

  /** `<urlset>` → one row per `<url>` entry:
    * (sitemap_url, loc, lastmod, changefreq, priority_milli). Entries
    * without a `<loc>` are spec-invalid and dropped; missing optional
    * tags come back NULL (priority defaults to 500 per spec). */
  def entries(sitemaps: DataFrame, urlCol: String = "url",
              bodyCol: String = "body"): DataFrame =
    sitemaps
      .select(col(urlCol).as("sitemap_url"),
        explode(expr(s"regexp_extract_all($bodyCol, '(?s)<url>(.*?)</url>', 1)")).as("block"))
      .select(
        col("sitemap_url"),
        field("loc").as("loc"),
        nullif(field("lastmod"), lit("")).as("lastmod"),
        nullif(field("changefreq"), lit("")).as("changefreq"),
        coalesce(
          (nullif(field("priority"), lit("")).cast("decimal(4,3)") * 1000).cast("long"),
          lit(500L)).as("priority_milli"))
      .filter(col("loc") =!= "")

  /** Fetch candidates: entry locs not yet crawled, highest priority
    * first (the crawl-ordering signal sitemaps exist to carry). The
    * crawled set probe is the standard frontier anti-join — at 10¹²
    * urls the caller pre-filters with [[LinkGraph.frontierBloom]]'s
    * Bloom pass so only possible hits ride the join. */
  def frontier(entries: DataFrame, crawledUrls: DataFrame): DataFrame =
    entries.join(crawledUrls.select(col("url").as("loc")), Seq("loc"), "left_anti")
      .select(col("loc"), col("priority_milli"))
}
