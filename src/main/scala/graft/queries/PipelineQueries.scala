package graft.queries

import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Front-end KG-construction pipeline surface (north_star stages), each
  * stage hash-checked against a DuckDB oracle that recomputes the expected
  * output arithmetically from the `documents` table. `fe_triples` is the
  * triple P/R ≥ 0.95 comparison surface — hash equality here means P = R = 1.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  // one pipeline checkpoint dir per (JVM, dataDir): later stage queries
  // resume from earlier stages' checkpoints instead of recomputing
  private val ckDirs = scala.collection.concurrent.TrieMap.empty[String, String]
  private def ck(dir: String): String =
    ckDirs.getOrElseUpdate(dir, KgPipeline.tempDir("graft_fe_"))

  def queries: Map[String, Q] = Map(
    "fe_pages" -> ((s, d) => KgPipeline.run(s, d, ck(d), "pages")
      .select(col("url"), col("warc_ts"), col("lang"), col("text"))),
    "fe_extract" -> ((s, d) => KgPipeline.run(s, d, ck(d), "extracted")),
    "fe_mentions" -> ((s, d) => KgPipeline.run(s, d, ck(d), "mentions")),
    "fe_linked" -> ((s, d) => KgPipeline.run(s, d, ck(d), "linked")),
    "fe_canonical_map" -> ((s, d) => Canonicalize.canonicalMap(Pages.aliases(s))),
    // the MinHash-LSH-blocked canonicalization path end-to-end (bands →
    // Jaccard verify → CC) composed with the exact key: the synthetic
    // catalog's closest surface pair is "Entity k" / "Entity k0" at
    // shingle-Jaccard 6/7 ≈ 0.857 (the true alias pair "Ent k"/"Entity k"
    // sits at ≈ 0.13), so at threshold 0.9 no pair survives the verify and
    // the result must equal the exact-key canonical map — the
    // fe_canonical_map oracle applies verbatim; any spurious fuzzy link or
    // lost entity breaks the hash
    "fe_canonical_fuzzy" -> ((s, d) =>
      Canonicalize.fuzzyCanonicalMap(Pages.aliases(s), threshold = 0.9,
        alsoExactKey = true)),
    "fe_triples" -> ((s, d) => KgPipeline.run(s, d, ck(d), "triples")),
    "fe_lineage_counts" -> ((s, d) => {
      KgPipeline.run(s, d, ck(d), "triples") // ensure all stages ran
      Lineage.read(s, ck(d)).groupBy("stage")
        .agg(sum(col("rows")).as("total_rows"))
    }),
    "fe_media_meta" -> ((s, d) => Media(KgPipeline.run(s, d, ck(d), "pages")).toDF()),
    // REAL image decode through the same typed-mapPartitions stage:
    // deterministic PNG/JPEG fixtures (ImageIO-encoded driver-side with
    // known dimensions) ride the binary column and come back with
    // header-decoded width/height/format — the oracle pins the exact
    // dimensions, so a silently-engaged stub (whose fake dims derive from
    // byte length) hash-mismatches. n_bytes is excluded: encoder output
    // size is JDK-internal, not portable arithmetic.
    "fe_media_decode" -> ((s, d) => {
      val imgs = (0 until 4).map { i =>
        val (w, h) = (16 + i, 9 + 2 * i)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, if (i % 2 == 0) "png" else "jpg", baos)
        (s"img://$i", baos.toByteArray)
      }
      Media(s.createDataFrame(imgs).toDF("url", "html")).toDF()
        .select("url", "width", "height", "format")
    }),
    // the SAME canonical-triple set via the Structured Streaming pipeline:
    // pages parquet replayed as a bounded stream, drained exactly-once with
    // Trigger.AvailableNow into a parquet sink. The 7-day lateness bound
    // exceeds the synthetic corpus's event-time span at every sf ≤ 1, so
    // the watermarked dedup equals the batch global distinct and the batch
    // fe_triples oracle applies verbatim.
    "fe_stream_triples" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("stream_kg_").toString
      Pages.fromDir(s, d).write.mode("overwrite").parquet(s"$base/pages")
      StreamingKg.runAvailableNow(s, s"$base/pages", s"$base/out", s"$base/ck",
        delay = "7 days")
    }))

  private val docsCte =
    s"""docs AS (SELECT doc_id, text, lang, ${Pages.Sql.url} AS url,
       |  ${Pages.Sql.surfA} AS surfa, ${Pages.Sql.body} AS body FROM documents),
       |als AS (${Pages.Sql.aliases})""".stripMargin

  private def withDocs(body: String): String = s"WITH $docsCte\n$body"

  private val mentionsSql =
    """SELECT url, surfa AS subjSurface, 'bornIn' AS pred, 'city ' || (doc_id % 31) AS objSurface FROM docs
      |UNION ALL SELECT url, surfa, 'worksFor', 'org ' || (doc_id % 13) FROM docs WHERE doc_id % 2 = 0
      |UNION ALL SELECT url, 'city ' || (doc_id % 31), 'locatedIn', 'country ' || (doc_id % 7) FROM docs WHERE doc_id % 3 = 0""".stripMargin

  private val linkedSql =
    """SELECT url, CASE WHEN doc_id % 5 < 2 THEN 'entA_' || (doc_id % 97) ELSE 'entB_' || (doc_id % 97) END AS subj_id,
      |       'bornIn' AS pred, 'city_' || (doc_id % 31) AS obj_id FROM docs
      |UNION ALL SELECT url, CASE WHEN doc_id % 5 < 2 THEN 'entA_' || (doc_id % 97) ELSE 'entB_' || (doc_id % 97) END,
      |       'worksFor', 'org_' || (doc_id % 13) FROM docs WHERE doc_id % 2 = 0
      |UNION ALL SELECT url, 'city_' || (doc_id % 31), 'locatedIn', 'country_' || (doc_id % 7) FROM docs WHERE doc_id % 3 = 0""".stripMargin

  private val triplesSql =
    """SELECT DISTINCT 'entA_' || (doc_id % 97) AS subj, 'bornIn' AS pred, 'city_' || (doc_id % 31) AS obj FROM docs
      |UNION SELECT DISTINCT 'entA_' || (doc_id % 97), 'worksFor', 'org_' || (doc_id % 13) FROM docs WHERE doc_id % 2 = 0
      |UNION SELECT DISTINCT 'city_' || (doc_id % 31), 'locatedIn', 'country_' || (doc_id % 7) FROM docs WHERE doc_id % 3 = 0""".stripMargin

  // html reconstruction for byte-length checks (ASCII boilerplate + body)
  private val htmlSql =
    """'<html><head><title>Doc ' || doc_id || '</title><script>var x=1;</script></head><body>' ||
      |'<nav>Home | About | Contact</nav><p>' || body ||
      |'</p><footer>&copy; 2025 example.org</footer></body></html>'""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "fe_pages" -> withDocs(
      """SELECT url, TIMESTAMP '2025-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts,
        |       lang, body AS text FROM docs""".stripMargin),
    "fe_extract" -> withDocs("SELECT url, body AS text FROM docs"),
    "fe_mentions" -> withDocs(mentionsSql),
    "fe_linked" -> withDocs(linkedSql),
    "fe_canonical_map" -> withDocs(
      """SELECT DISTINCT entity_id,
        |  MIN(entity_id) OVER (PARTITION BY lower(substr(surface,1,3)) || '|' || regexp_extract(surface, '(\d+)', 1)) AS canonical
        |FROM als""".stripMargin),
    // fuzzy path degenerates to the exact-key map on this catalog (see the
    // query comment) — identical oracle
    "fe_canonical_fuzzy" -> withDocs(
      """SELECT DISTINCT entity_id,
        |  MIN(entity_id) OVER (PARTITION BY lower(substr(surface,1,3)) || '|' || regexp_extract(surface, '(\d+)', 1)) AS canonical
        |FROM als""".stripMargin),
    "fe_triples" -> withDocs(triplesSql),
    "fe_stream_triples" -> withDocs(triplesSql),
    "fe_lineage_counts" -> withDocs(
      s"""SELECT 'pages' AS stage, CAST(COUNT(*) AS BIGINT) AS total_rows FROM docs
         |UNION ALL SELECT 'extracted', CAST(COUNT(*) AS BIGINT) FROM docs
         |UNION ALL SELECT 'mentions', CAST(COUNT(*) AS BIGINT) FROM ($mentionsSql) m
         |UNION ALL SELECT 'linked', CAST(COUNT(*) AS BIGINT) FROM ($linkedSql) l
         |UNION ALL SELECT 'triples', CAST(COUNT(*) AS BIGINT) FROM ($triplesSql) t""".stripMargin),
    "fe_media_decode" ->
      """SELECT * FROM (VALUES
        |  ('img://0', CAST(16 AS INT), CAST(9 AS INT), 'png'),
        |  ('img://1', CAST(17 AS INT), CAST(11 AS INT), 'jpeg'),
        |  ('img://2', CAST(18 AS INT), CAST(13 AS INT), 'png'),
        |  ('img://3', CAST(19 AS INT), CAST(15 AS INT), 'jpeg')
        |) t(url, width, height, format)""".stripMargin,
    "fe_media_meta" -> withDocs(
      s"""SELECT url, CAST(octet_length(encode($htmlSql)) AS BIGINT) AS n_bytes,
         |  CAST(64 + octet_length(encode($htmlSql)) % 101 AS INT) AS width,
         |  CAST(64 + octet_length(encode($htmlSql)) % 67 AS INT) AS height,
         |  CASE WHEN octet_length(encode($htmlSql)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
         |FROM docs""".stripMargin))
}
