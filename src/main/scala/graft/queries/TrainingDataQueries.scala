package graft.queries

import graft.dedup.Dedup
import graft.sim.Ann
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators (dedup / similarity / text analysis),
  * each hash-checked against a DuckDB oracle. Near/exact duplicates are
  * planted deterministically (corpus CTE) so dedup outputs are non-trivial
  * and identical on both sides.
  */
object TrainingDataQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) =
    s.read.parquet(s"$d/documents.parquet")
  private def emb(s: SparkSession, d: String) =
    s.read.parquet(s"$d/embeddings.parquet")

  /** documents ∪ planted exact dups (+200000) ∪ planted near dups (+100000,
    * text + " x"). */
  def corpus(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    base
      .unionAll(base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      .unionAll(base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" x")).as("text")))
  }

  /** embeddings ∪ planted identical copies (+100000). */
  def embCorpus(s: SparkSession, d: String): DataFrame = {
    val base = emb(s, d).select(col("vec_id"), col("embedding"))
    base.unionAll(base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }

  def queries: Map[String, Q] = Map(
    "td_dedup_exact" -> ((s, d) => Dedup.exact(corpus(s, d))),
    "td_shingle_count" -> ((s, d) =>
      TextOps.shingles(corpus(s, d)).groupBy("doc_id").agg(count(lit(1)).as("n"))),
    "td_minhash" -> ((s, d) => Dedup.minhash(corpus(s, d))),
    "td_lsh_bands" -> ((s, d) => Dedup.lshBands(corpus(s, d))),
    // meta-blocking over the LSH blocking collection: CBS weights (shared
    // bands), minShared=2 floor, weighted-node pruning top-3 — the
    // candidate-restructuring pass between blocking and verify
    "td_meta_blocking" -> ((s, d) => Dedup.metaBlocking(
      Dedup.lshBands(corpus(s, d)).select(
        org.apache.spark.sql.functions.concat(
          col("band").cast("string"),
          org.apache.spark.sql.functions.lit(":"), col("key")).as("block"),
        col("doc_id").as("id")),
      minShared = 2, topKPerNode = 3)),
    // EXACT set-similarity join (prefix filtering, AllPairs/PPJoin
    // family) at τ = 0.8: recall 1 BY THEOREM where LSH banding is
    // probabilistic — the oracle computes ground truth directly (every
    // shingle-sharing pair + the same exact-integer inequality), so the
    // gate proves candidates-after-verify EQUALS the true answer,
    // independent of the prefix mechanics
    // bounded to base doc_id < 500 (constant gate size at every sf —
    // the fe_trans_closure pattern): the synthetic corpus's tiny 3-gram
    // vocabulary makes prefix blocks scale with corpus size, so the
    // UNBOUNDED join is quadratic-ish HERE BY CONSTRUCTION (a real crawl's
    // shingle space is 2^48); the stop-token cap documented in
    // similarityJoin is the production lever
    "td_simjoin" -> ((s, d) => Dedup.similarityJoin(
      corpus(s, d).filter(pmod(col("doc_id"), lit(100000L)) < 500), 800000L)),
    // greedy weighted 1:1 matching over the meta-blocking candidates —
    // the assignment pass when each record may merge with at most one
    // partner; parallel local-max rounds reproduce the sequential greedy
    // (w DESC, a, b) exactly, every round replayed by the oracle
    "td_1to1_matching" -> ((s, d) => Dedup.maximalMatching(Dedup.metaBlocking(
      Dedup.lshBands(corpus(s, d)).select(
        org.apache.spark.sql.functions.concat(
          col("band").cast("string"),
          org.apache.spark.sql.functions.lit(":"), col("key")).as("block"),
        col("doc_id").as("id")),
      minShared = 2, topKPerNode = 3))),
    // blocking-quality eval (reduction ratio + pair completeness) at
    // tau = 0.5, BELOW the 0.8 banding design point — pc measures exactly
    // how many mid-similarity true pairs the bands miss, rr how much of
    // the quadratic pair space the blocking avoided; both exact integers
    "td_er_quality" -> ((s, d) => Dedup.blockingQuality(corpus(s, d), 0.5)),
    "td_dedup_minhash" -> ((s, d) => Dedup.minhashLsh(corpus(s, d), 0.8)),
    "td_dedup_clusters" -> ((s, d) => Dedup.nearDupClusters(corpus(s, d), 0.8)),
    // incremental dedup: the planted dup rows (doc_id ≥ 100000) arrive as a
    // later crawl increment probed against the indexed base corpus, with
    // the LSH index persisted and read back through TableIO (the
    // stored-state round trip a long-running pipeline depends on). The
    // contract is exactly the full-corpus near-dup pairs touching ≥ 1
    // increment doc — the td_dedup_minhash oracle restricted accordingly.
    "td_dedup_incremental" -> ((s, d) => {
      val full = corpus(s, d)
      val store = full.filter(col("doc_id") < 100000)
      val inc = full.filter(col("doc_id") >= 100000)
      val dir = java.nio.file.Files.createTempDirectory("lsh_idx_").toString
      val io = new graft.core.ParquetTableIO(s, dir)
      io.write(Dedup.lshIndex(store), "lsh_index")
      Dedup.incrementNearDup(store, io.read("lsh_index"), inc, 0.8)
    }),
    "td_simhash" -> ((s, d) => Dedup.simhash(corpus(s, d))),
    "td_dedup_simhash" -> ((s, d) => Dedup.simhashNearDup(docs(s, d), 3)),
    "td_jaccard_consecutive" -> ((s, d) => {
      val ids = docs(s, d).select(col("doc_id"))
      val pairs = ids.select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .join(ids.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
      Dedup.jaccardOf(docs(s, d).select(col("doc_id"), col("text")), pairs)
    }),
    // Broder containment on the same consecutive-doc pairs: the asymmetric
    // |A∩B|/|A| score resemblance-only dedup misses (boilerplate-wrapped
    // copies sit at J ≈ |A|/|B| but cont_a ≈ 1); exact over shingle sets
    "td_containment" -> ((s, d) => {
      val ids = docs(s, d).select(col("doc_id"))
      val pairs = ids.select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
        .join(ids.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
      Dedup.containmentOf(docs(s, d).select(col("doc_id"), col("text")), pairs)
    }),
    // training-sequence packing manifest: per-lang concat-and-chunk into
    // 512-token sequences — one partitioned window + a sequence explode;
    // every (doc, bin, span) row is pure arithmetic over the running
    // offset, so one wrong cumsum anywhere breaks the hash
    "td_seq_pack" -> ((s, d) =>
      graft.text.Packing.packManifest(docs(s, d), budget = 512L)),
    "td_langid" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), TextOps.langId(col("text")).as("predicted"))),
    // token counting: whitespace + BPE-ish pretokenizer match count
    "td_token_count" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("ws_tokens"),
        TextOps.bpeishTokenCount(col("text")).as("bpe_tokens"))),
    "td_quality" -> ((s, d) => TextOps.quality(docs(s, d))),
    // BM25 feature surface (retrieval-based curation): exact-integer
    // postings/df/doclen/corpus constants for a fixed query; the float
    // idf/score math is downstream (RetrievalSpec pins it)
    "td_bm25_features" -> ((s, d) => graft.text.Retrieval.bm25Features(
      docs(s, d), Seq("spark", "table", "join", "vector"))),
    "td_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), TextOps.fingerprintMd5(col("text")).as("fp"))),
    // hybrid retrieval: exact bigram-Jaccard lexical top-20 + brute-force
    // cosine dense top-20 over the SAME doc/vec id space, fused by
    // reciprocal-rank fusion (k=60) in exact integer micro-units — the
    // standard sparse+dense RAG merge, rank-only so no cross-engine float
    // score ever reaches the gate surface
    "td_rrf_hybrid" -> ((s, d) => {
      val lex = graft.text.Retrieval.jaccardRank(docs(s, d), 0L to 9L, 20)
      val dense = Ann.bruteForceTopK(emb(s, d), 0L to 9L, 20)
        .select(col("q"), col("neighbor").as("doc"), col("rank"))
      graft.text.Retrieval.rrfFuse(Seq(lex, dense), k = 60, topK = 10)
    }),
    "td_ann_topk" -> ((s, d) => Ann.bruteForceTopK(emb(s, d), 0L to 9L, 5)),
    "td_ann_ivf" -> ((s, d) => Ann.ivfTopK(emb(s, d), 0L to 9L, 5)),
    // the SAME search through a PERSISTED index: centroids + assignments
    // round-trip through TableIO and the query runs against the stored
    // copies — byte-equal to the inline build (identical oracle)
    "td_ann_ivf_indexed" -> ((s, d) => {
      val e = emb(s, d)
      val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
      val io = new graft.core.ParquetTableIO(s, dir)
      val cents = Ann.ivfCentroidsLloyd(e)
      io.write(cents, "ivf/centroids")
      io.write(Ann.ivfAppend(cents, e), "ivf/assign")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q"), col("embedding").as("qe"))
      Ann.ivfTopKIndexed(e, io.read("ivf/centroids"), io.read("ivf/assign"), q, 5)
    }),
    "td_ann_lsh_bucket" -> ((s, d) => Ann.lshBucket(emb(s, d))),
    // product quantization (Jégou et al. TPAMI'11): per-subspace argmin
    // codes + the ADC search that never re-reads raw embeddings — both
    // fully oracle-replayed (LCG-seeded codebooks, round-6 argmin/rank)
    "td_pq_codes" -> ((s, d) => graft.sim.Pq.encode(emb(s, d))),
    "td_pq_adc" -> ((s, d) => {
      val e = emb(s, d)
      val books = graft.sim.Pq.codebooks(e)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q"), col("embedding").as("qe"))
      graft.sim.Pq.adcTopK(graft.sim.Pq.encodeWith(e, books), books, q, 5)
    }),
    "td_pq_rerank" -> ((s, d) => {
      val e = emb(s, d)
      val books = graft.sim.Pq.codebooks(e, m = 16)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q"), col("embedding").as("qe"))
      graft.sim.Pq.adcTopKRerank(graft.sim.Pq.encodeWith(e, books, m = 16),
        books, q, e, 5, shortlist = 50, m = 16)
    }),
    "td_dedup_embedding" -> ((s, d) =>
      Ann.nearDupPairs(embCorpus(s, d), 0.999).select("a", "b")),
    "td_dedup_emb_clusters" -> ((s, d) =>
      Ann.nearDupClusters(embCorpus(s, d), 0.999)),
    // SemDeDup (Abbas et al. arXiv:2303.09540): k-means blocking +
    // within-cluster ε-ball pruning; kept ∈ {0,1} oracle-checked per vector
    "td_semdedup" -> ((s, d) => Ann.semDedup(embCorpus(s, d), tau = 0.99)),
    // DSIR (Xie et al. NeurIPS'23) hashed n-gram importance features:
    // exact-integer per-doc bucket counts + global target/raw totals
    // (target sample = doc_id % 5 = 0); the log-ratio weight is
    // downstream (DsirSpec)
    "td_dsir_features" -> ((s, d) => graft.text.Dsir.featureSurface(
      docs(s, d), col("doc_id") % 5 === 0)),
    // winnowing fingerprints (window-min selection, rightmost-min tiebreak)
    // over the codegen KGramHashes rolling hash — full DuckDB oracle
    "td_winnow_fp" -> ((s, d) => TextOps.winnow(docs(s, d), k = 8, w = 4)),
    // gap-based sessionization over the events stream table (the same
    // session_window aggregation runs under readStream + watermark —
    // StreamingSpec proves batch/stream parity)
    "td_sessionize" -> ((s, d) => graft.streaming.Sessions.sessionize(
      s.read.parquet(s"$d/events.parquet"), 30)),
    // backward as-of join: every click gains the user's newest
    // at-or-before view (union-tag window plan, never a range join);
    // carried view columns pass through untouched, the lag is exact
    // integer micros — no float hazard anywhere
    "td_asof" -> ((s, d) => {
      val ev = s.read.parquet(s"$d/events.parquet")
      graft.streaming.Temporal.asofJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"),
        key = "user_id", ts = "ts", id = "event_id",
        carry = Seq("event_id" -> "view_id", "value" -> "view_value", "ts" -> "view_ts"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("view_id"), col("view_value"),
          // parquet reads as TIMESTAMP_NTZ; session tz is UTC, so the
          // cast is a pure reinterpretation and the micros are exact
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("view_ts").cast("timestamp"))).as("lag_us"))
    }),
    // trailing 24h per-event activity features: strictly-before RANGE
    // frame over integer micros (training-safe — the row never sees
    // itself); DECIMAL sum keeps the exact surface order-independent,
    // the double cast is strictly downstream
    "td_rolling" -> ((s, d) => graft.streaming.Temporal.rollingFeatures(
      s.read.parquet(s"$d/events.parquet"),
      key = "user_id", ts = "ts", valueCol = "value", windowMicros = 86400000000L)
      .select(col("event_id"), col("user_id"), col("trail_cnt"),
        col("trail_sum").cast("double").as("trail_sum"))),
    // corpus-level MinHash overlap between the language slices:
    // signatures merge by MIN, so the Jaccard estimate between two whole
    // corpora costs one aggregate — the corpora are never joined
    "td_corpus_overlap" -> ((s, d) => Dedup.corpusOverlap(docs(s, d), "lang")),
    // one-pass column profile of the raw drop (exact distincts, native-
    // typed min/max rendered to string) — the ANALYZE before training
    "td_profile" -> ((s, d) => graft.core.Profile.profile(
      docs(s, d), Seq("doc_id", "lang", "source", "n_chars"))),
    // exact grouped percentile_disc ladder over doc length per language —
    // the distribution half of the ANALYZE; integer-percent rank math so
    // the picked rank is engine-portable (no float ceil)
    "td_quantiles" -> ((s, d) => graft.core.Profile.quantilesDisc(
      docs(s, d), "n_chars", Seq("lang"), Seq(25, 50, 75, 95), "doc_id")),
    // SCD type-2 validity intervals from the event log: one row per
    // event_type run per user, valid_to null on the current state
    // (timestamps formatted to the shared 6-digit lexical form)
    "td_scd2" -> ((s, d) => graft.streaming.Temporal.scd2(
      s.read.parquet(s"$d/events.parquet"),
      key = "user_id", ts = "ts", id = "event_id", state = "event_type")
      .select(col("user_id"), col("state"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"))),
    // ordered view→click→purchase funnel per user: earliest step-1 time,
    // then the earliest STRICTLY-later step 2/3; one shuffle, K unordered
    // windows + the collapse all on the same exchange
    "td_funnel" -> ((s, d) => graft.streaming.Temporal.funnel(
      s.read.parquet(s"$d/events.parquet"),
      key = "user_id", ts = "ts", typeCol = "event_type",
      steps = Seq("view", "click", "purchase"))),
    // the SAME funnel as a Structured Streaming query with CUSTOM state
    // (mapGroupsWithState, O(K) longs per user), drained AvailableNow;
    // the events replay in-order (single file-source batch), so the
    // exactness contract holds and the batch oracle applies verbatim
    "td_funnel_stream" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("funnel_stream_").toString
      // the testdata table is a single parquet FILE; the stream file
      // source wants a directory — stage it (fe_stream_triples pattern)
      s.read.parquet(s"$d/events.parquet")
        .write.mode("overwrite").parquet(s"$base/events")
      graft.streaming.Temporal.funnelStreamOnce(
        s, s"$base/events", Seq("view", "click", "purchase"),
        s"$base/out", s"$base/ck")
    }),
    // streaming exact dedup: the duplicate-bearing corpus drained one
    // FILE per micro-batch (maxFilesPerTrigger=1 over a 6-file stage), so
    // first-occurrence state must hold across batches; the emitted key
    // SET is arrival-order-independent — the deterministic gate surface
    "td_stream_dedup" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("stream_dedup_").toString
      corpus(s, d).repartition(6).write.mode("overwrite").parquet(s"$base/in")
      graft.streaming.StreamDedup.firstKeysOnce(
        s, s"$base/in", s"$base/out", s"$base/ck")
    }))

  private val corpusCte =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id % 20 = 0
      |  UNION ALL SELECT doc_id + 100000, text || ' x' FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  private val shCte = s"sh AS (${TextOps.shinglesSql})"

  private val mhCte =
    """mh AS (
      |  SELECT doc_id, CAST(j AS INT) AS j,
      |    MIN((h * (1000003 + 999983 * j) + (7 + 104729 * j)) % 2147483647) AS mh
      |  FROM sh CROSS JOIN generate_series(0, 15) t(j) GROUP BY doc_id, j)""".stripMargin

  private val bandsCte =
    """bands AS (
      |  SELECT doc_id, CAST(j // 4 AS INT) AS band, string_agg(mh, '_' ORDER BY j) AS key
      |  FROM mh GROUP BY doc_id, j // 4)""".stripMargin

  private val candCtes =
    """cand0 AS (
      |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM bands l
      |  JOIN bands r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
      |cand AS (
      |  SELECT c.a, c.b FROM cand0 c
      |  JOIN mh ma ON ma.doc_id = c.a JOIN mh mb ON mb.doc_id = c.b AND mb.j = ma.j
      |  GROUP BY c.a, c.b
      |  HAVING SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) >= """.stripMargin +
      s"${Dedup.sigAgreeMin(0.8)})"

  /** the jaccardSql verify stage as a `pairs` CTE (thresholded) */
  private def jaccardPairsCte(threshold: Double) =
    s"""sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.a, c.b, COUNT(*) AS i FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.h = sa.h
       |  GROUP BY c.a, c.b),
       |pairs AS (
       |  SELECT a, b FROM (
       |    SELECT c.a, c.b,
       |      ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE) / (na.n + nb.n - COALESCE(i.i, 0)), 5) AS jaccard
       |    FROM cand c
       |    LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
       |    JOIN sizes na ON na.doc_id = c.a
       |    JOIN sizes nb ON nb.doc_id = c.b) q
       |  WHERE jaccard >= $threshold)""".stripMargin

  private def jaccardSql(pairsCte: String) =
    s"""$pairsCte,
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.a, c.b, COUNT(*) AS i FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.h = sa.h
       |  GROUP BY c.a, c.b)
       |SELECT a, b, jaccard FROM (
       |  SELECT c.a, c.b,
       |    ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE) / (na.n + nb.n - COALESCE(i.i, 0)), 5) AS jaccard
       |  FROM cand c
       |  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
       |  JOIN sizes na ON na.doc_id = c.a
       |  JOIN sizes nb ON nb.doc_id = c.b) q""".stripMargin

  private val embCte =
    """ec AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 50 = 0)""".stripMargin

  /** exploded double-precision vector view over a relation r(vec_id, embedding)
    * (DuckDB 1.0 has no WITH ORDINALITY — static series + 1-based indexing) */
  private def evCte(rel: String) =
    s"""ev AS (SELECT $rel.vec_id, CAST(i1 - 1 AS INT) AS i, CAST($rel.embedding[i1] AS DOUBLE) AS x
       |  FROM $rel CROSS JOIN generate_series(1, 64) g(i1)
       |  WHERE i1 <= len($rel.embedding))""".stripMargin

  private val bucketSql =
    s"""SELECT vec_id,
       |  CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
       |FROM (
       |  SELECT vec_id, CAST(j AS INT) AS j,
       |    SUM(CASE WHEN ${Ann.planeSignDuck()} THEN x ELSE -x END) AS s
       |  FROM ev CROSS JOIN generate_series(0, 7) t(j) GROUP BY vec_id, j) proj
       |GROUP BY vec_id""".stripMargin

  /** PQ replay (Jégou et al. TPAMI'11 shapes, Pq.scala conventions):
    * codebooks = the 16 LCG-lowest vectors' subvectors (code = rank in
    * that order), codes = per-(vec, sub) argmin round-6 L2. Shared by
    * `td_pq_codes` / `td_pq_adc` (m = 8) and `td_pq_rerank` (m = 16). */
  private def pqCtes(m: Int): String = {
    val sd = 64 / m
    s"""${evCte("embeddings")},
       |cent AS MATERIALIZED (
       |  SELECT vec_id, CAST(row_number() OVER (
       |    ORDER BY ${graft.core.Determinism.lcgDuck("vec_id", 97L)}, vec_id) - 1 AS INT) AS code
       |  FROM embeddings
       |  ORDER BY ${graft.core.Determinism.lcgDuck("vec_id", 97L)}, vec_id LIMIT 16),
       |parts AS MATERIALIZED (
       |  SELECT vec_id, CAST(i // $sd AS INT) AS sub, CAST(i % $sd AS INT) AS j, x FROM ev),
       |cb AS MATERIALIZED (
       |  SELECT p.sub, c.code, p.j, p.x AS cx
       |  FROM parts p JOIN cent c ON c.vec_id = p.vec_id),
       |d2 AS (
       |  SELECT p.vec_id, p.sub, b.code,
       |    ROUND(SUM((p.x - b.cx) * (p.x - b.cx)), 6) AS d2
       |  FROM parts p JOIN cb b ON b.sub = p.sub AND b.j = p.j
       |  GROUP BY 1, 2, 3),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT vec_id, sub, code,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
       |    FROM d2) a WHERE rn = 1)""".stripMargin
  }

  /** the ADC scoring chain over [[pqCtes]], ending in a `sc`/`qn` pair the
    * callers rank from */
  private val pqAdcCtes: String =
    """qp AS (SELECT vec_id AS q, sub, j, x FROM parts WHERE vec_id < 10),
      |lut AS (
      |  SELECT qp.q, cb.sub, cb.code, SUM(qp.x * cb.cx) AS pdot
      |  FROM qp JOIN cb ON cb.sub = qp.sub AND cb.j = qp.j GROUP BY 1, 2, 3),
      |qn AS (SELECT q, SQRT(SUM(x * x)) AS qn FROM qp GROUP BY q),
      |cnorm2 AS (SELECT sub, code, SUM(cx * cx) AS cn2 FROM cb GROUP BY 1, 2),
      |sc AS (
      |  SELECT l.q, c.vec_id AS neighbor, SUM(l.pdot) AS dot, SUM(n.cn2) AS rn2
      |  FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
      |  JOIN cnorm2 n ON n.sub = c.sub AND n.code = c.code
      |  WHERE c.vec_id <> l.q
      |  GROUP BY 1, 2),
      |adc AS (
      |  SELECT sc.q, neighbor, CAST(row_number() OVER (PARTITION BY sc.q
      |    ORDER BY ROUND(dot / (qn.qn * SQRT(rn2)), 6) DESC, neighbor) AS INT) AS adc_rank
      |  FROM sc JOIN qn ON qn.q = sc.q)""".stripMargin

  /** IVF search: LCG-seeded centroids, max-cosine assignment, nprobe=4 of
    * nlist=16 lists probed per query. Shared by `td_ann_ivf` (inline build)
    * and `td_ann_ivf_indexed` (the same search through a TableIO-persisted
    * index — byte-equal by contract). */
  private lazy val ivfOracleSql: String =
    s"""WITH ${evCte("embeddings")},
       |cent AS (SELECT vec_id AS cid FROM embeddings
       |  ORDER BY ${graft.core.Determinism.lcgDuck("vec_id", 97L)}, vec_id LIMIT 16),
       |norms AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ev GROUP BY vec_id),
       |cdots AS (
       |  SELECT a.vec_id, b.vec_id AS cid, SUM(a.x * b.x) AS dot
       |  FROM ev a JOIN ev b ON b.i = a.i
       |  WHERE b.vec_id IN (SELECT cid FROM cent)
       |  GROUP BY a.vec_id, b.vec_id),
       |csims AS (
       |  SELECT c.vec_id, c.cid, ROUND(c.dot / (na.nrm * nc.nrm), 6) AS csim
       |  FROM cdots c JOIN norms na ON na.vec_id = c.vec_id
       |  JOIN norms nc ON nc.vec_id = c.cid),
       |assign AS (SELECT vec_id, cid FROM (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
       |  FROM csims) a WHERE rn = 1),
       |probes AS (SELECT q, cid FROM (
       |  SELECT vec_id AS q, cid, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
       |  FROM csims WHERE vec_id < 10) p WHERE rn <= 4),
       |cand AS (
       |  SELECT p.q, a.vec_id AS neighbor FROM probes p
       |  JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.q),
       |dots AS (
       |  SELECT c.q, c.neighbor, SUM(ea.x * eb.x) AS dot FROM cand c
       |  JOIN ev ea ON ea.vec_id = c.q JOIN ev eb ON eb.vec_id = c.neighbor AND eb.i = ea.i
       |  GROUP BY c.q, c.neighbor)
       |SELECT q, rank, neighbor FROM (
       |  SELECT q, neighbor, CAST(row_number() OVER (
       |    PARTITION BY q ORDER BY ROUND(dot / (nq.nrm * nn.nrm), 6) DESC, neighbor) AS INT) AS rank
       |  FROM dots JOIN norms nq ON nq.vec_id = q JOIN norms nn ON nn.vec_id = neighbor) r
       |WHERE rank <= 5""".stripMargin

  // shared by td_funnel (batch) and td_funnel_stream (the
  // mapGroupsWithState replay of the same events): chained window
  // CTEs with the identical strict-inequality gating
  private val funnelOracle: String =
    """WITH f0 AS MATERIALIZED (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |w1 AS MATERIALIZED (
        |  SELECT user_id, event_type, us,
        |    MIN(CASE WHEN event_type = 'view' THEN us END)
        |      OVER (PARTITION BY user_id) AS step1_us
        |  FROM f0),
        |w2 AS MATERIALIZED (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND step1_us IS NOT NULL
        |                      AND us > step1_us THEN us END)
        |      OVER (PARTITION BY user_id) AS step2_us
        |  FROM w1),
        |w3 AS MATERIALIZED (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND step2_us IS NOT NULL
        |                      AND us > step2_us THEN us END)
        |      OVER (PARTITION BY user_id) AS step3_us
        |  FROM w2)
        |SELECT user_id, MIN(step1_us) AS step1_us, MIN(step2_us) AS step2_us,
        |  MIN(step3_us) AS step3_us,
        |  CAST(MIN((CASE WHEN step1_us IS NOT NULL THEN 1 ELSE 0 END)
        |         + (CASE WHEN step2_us IS NOT NULL THEN 1 ELSE 0 END)
        |         + (CASE WHEN step3_us IS NOT NULL THEN 1 ELSE 0 END)) AS INT) AS reached
        |FROM w3 WHERE step1_us IS NOT NULL GROUP BY user_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "td_dedup_exact" -> s"WITH $corpusCte\nSELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text",
    "td_stream_dedup" -> s"WITH $corpusCte\nSELECT DISTINCT md5(text) AS text_md5 FROM corpus",
    "td_shingle_count" -> s"WITH $corpusCte, $shCte\nSELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id",
    "td_minhash" -> s"WITH $corpusCte, $shCte, $mhCte\nSELECT doc_id, j, mh FROM mh",
    "td_lsh_bands" -> s"WITH $corpusCte, $shCte, $mhCte, $bandsCte\nSELECT doc_id, band, key FROM bands",
    "td_meta_blocking" -> (s"WITH $corpusCte, $shCte, $mhCte, $bandsCte,\n" +
      """pw AS MATERIALIZED (
        |  SELECT a.doc_id AS a, b.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM bands a JOIN bands b
        |    ON b.band = a.band AND b.key = a.key AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |v AS (SELECT a AS node, b AS other, w, a, b FROM pw
        |      UNION ALL SELECT b, a, w, a, b FROM pw),
        |kept AS (SELECT a, b, w, row_number() OVER (
        |           PARTITION BY node ORDER BY w DESC, other) AS r FROM v)
        |SELECT DISTINCT a, b, w FROM kept WHERE r <= 3""".stripMargin),
    "td_simjoin" -> (s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 500
      |  UNION ALL SELECT doc_id + 200000, text FROM documents
      |    WHERE doc_id % 20 = 0 AND doc_id < 500
      |  UNION ALL SELECT doc_id + 100000, text || ' x' FROM documents
      |    WHERE doc_id % 10 = 0 AND doc_id < 500),
      |$shCte,
      |""".stripMargin +
      """szs AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |shr AS MATERIALIZED (
        |  SELECT DISTINCT sa.doc_id AS a, sb.doc_id AS b
        |  FROM sh sa JOIN sh sb ON sb.h = sa.h AND sa.doc_id < sb.doc_id),
        |itr AS (
        |  SELECT c.a, c.b, COUNT(*) AS i FROM shr c
        |  JOIN sh sa ON sa.doc_id = c.a
        |  JOIN sh sb ON sb.doc_id = c.b AND sb.h = sa.h
        |  GROUP BY 1, 2)
        |SELECT i.a, i.b, CAST(i.i AS BIGINT) AS inter,
        |       CAST(na.n AS BIGINT) AS na, CAST(nb.n AS BIGINT) AS nb
        |FROM itr i
        |JOIN szs na ON na.doc_id = i.a
        |JOIN szs nb ON nb.doc_id = i.b
        |WHERE i.i * 1000000 >= 800000 * (na.n + nb.n - i.i)""".stripMargin),
    "td_1to1_matching" -> {
      // matching rounds: winner iff best (w DESC, a, b) among all live
      // pairs sharing an endpoint; 6-round unroll (measured rounds
      // recorded in the engine comment; empty rounds are no-ops)
      val rounds = (1 to 6).map { i =>
        s"""mmw$i AS MATERIALIZED (
           |  SELECT p.a, p.b, p.w FROM mml${i - 1} p
           |  WHERE NOT EXISTS (SELECT 1 FROM mml${i - 1} q
           |    WHERE (q.a = p.a OR q.b = p.a OR q.a = p.b OR q.b = p.b)
           |      AND NOT (q.a = p.a AND q.b = p.b)
           |      AND (q.w > p.w OR (q.w = p.w AND
           |           (q.a < p.a OR (q.a = p.a AND q.b < p.b)))))),
           |mmt$i AS (SELECT a AS node FROM mmw$i UNION SELECT b FROM mmw$i),
           |mml$i AS MATERIALIZED (
           |  SELECT l.a, l.b, l.w FROM mml${i - 1} l
           |  WHERE NOT EXISTS (SELECT 1 FROM mmt$i t WHERE t.node = l.a)
           |    AND NOT EXISTS (SELECT 1 FROM mmt$i t WHERE t.node = l.b))"""
          .stripMargin
      }.mkString(",\n")
      val winners = (1 to 6).map(i => s"SELECT a, b, w FROM mmw$i")
        .mkString("\n  UNION ALL ")
      s"""WITH $corpusCte, $shCte, $mhCte, $bandsCte,
         |pw AS MATERIALIZED (
         |  SELECT a.doc_id AS a, b.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS w
         |  FROM bands a JOIN bands b
         |    ON b.band = a.band AND b.key = a.key AND b.doc_id > a.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |v AS (SELECT a AS node, b AS other, w, a, b FROM pw
         |      UNION ALL SELECT b, a, w, a, b FROM pw),
         |kept AS (SELECT a, b, w, row_number() OVER (
         |           PARTITION BY node ORDER BY w DESC, other) AS r FROM v),
         |mml0 AS MATERIALIZED (SELECT DISTINCT a, b, w FROM kept WHERE r <= 3),
         |$rounds
         |SELECT a, b, w FROM ($winners) t""".stripMargin
    },
    "td_er_quality" -> (s"WITH $corpusCte, $shCte, $mhCte, $bandsCte,\n" +
      """cand0 AS MATERIALIZED (
        |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM bands l
        |  JOIN bands r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id),
        |share AS MATERIALIZED (
        |  SELECT DISTINCT sa.doc_id AS a, sb.doc_id AS b
        |  FROM sh sa JOIN sh sb ON sb.h = sa.h AND sa.doc_id < sb.doc_id),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT c.a, c.b, COUNT(*) AS i FROM share c
        |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.h = sa.h
        |  GROUP BY c.a, c.b),
        |truthp AS MATERIALIZED (
        |  SELECT a, b FROM (
        |    SELECT c.a, c.b,
        |      ROUND(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 5) AS jaccard
        |    FROM share c
        |    JOIN inter i ON i.a = c.a AND i.b = c.b
        |    JOIN sizes na ON na.doc_id = c.a
        |    JOIN sizes nb ON nb.doc_id = c.b) q
        |  WHERE jaccard >= 0.5),
        |agg AS (SELECT
        |  (SELECT COUNT(*) FROM corpus) AS n_records,
        |  (SELECT COUNT(*) FROM cand0) AS n_candidates,
        |  (SELECT COUNT(*) FROM truthp) AS n_truth,
        |  (SELECT COUNT(*) FROM truthp t JOIN cand0 c ON c.a = t.a AND c.b = t.b) AS true_positives)
        |SELECT CAST(n_records AS BIGINT) AS n_records,
        |       CAST(n_candidates AS BIGINT) AS n_candidates,
        |       CAST(n_truth AS BIGINT) AS n_truth,
        |       CAST(true_positives AS BIGINT) AS true_positives,
        |       CAST(1000000 - 1000000 * n_candidates // (n_records * (n_records - 1) // 2) AS BIGINT) AS rr_micros,
        |       CAST(CASE WHEN n_truth = 0 THEN 1000000 ELSE 1000000 * true_positives // n_truth END AS BIGINT) AS pc_micros
        |FROM agg""".stripMargin),
    "td_dedup_minhash" -> (s"WITH $corpusCte, $shCte, $mhCte, $bandsCte,\n" +
      jaccardSql(candCtes) + "\nWHERE jaccard >= 0.8"),
    "td_dedup_incremental" -> (s"WITH $corpusCte, $shCte, $mhCte, $bandsCte,\n" +
      jaccardSql(candCtes) + "\nWHERE jaccard >= 0.8 AND (a >= 100000 OR b >= 100000)"),
    // clusters = transitive closure of the SAME near-dup pairs (recursive
    // CTE — the pair graph is tiny relative to the corpus), keeper = MIN
    // over each doc's reachable set ∪ itself; singletons keep themselves
    "td_dedup_clusters" -> (s"WITH RECURSIVE $corpusCte, $shCte, $mhCte, $bandsCte,\n" +
      s"$candCtes,\n${jaccardPairsCte(0.8)},\n" +
      """und AS MATERIALIZED (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
        |reach(u, v) AS (
        |  SELECT u, v FROM und
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
        |SELECT c.doc_id,
        |  CAST(COALESCE(LEAST(c.doc_id, MIN(r.v)), c.doc_id) AS BIGINT) AS keeper
        |FROM corpus c LEFT JOIN reach r ON r.u = c.doc_id
        |GROUP BY c.doc_id""".stripMargin),
    "td_simhash" -> s"""WITH $corpusCte, $shCte,
      |bits AS (
      |  SELECT doc_id, CAST(j AS INT) AS j,
      |    SUM(CASE WHEN (h * (1000003 + 999983 * j) + (7 + 104729 * j)) % 1021 >= 510 THEN 1 ELSE -1 END) AS tot
      |  FROM sh CROSS JOIN generate_series(0, 15) t(j) GROUP BY doc_id, j)
      |SELECT doc_id,
      |  CAST(SUM(CASE WHEN tot > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
      |FROM bits GROUP BY doc_id""".stripMargin,
    "td_dedup_simhash" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents), $shCte,
         |bits AS (
         |  SELECT doc_id, CAST(j AS INT) AS j,
         |    SUM(CASE WHEN (h * (1000003 + 999983 * j) + (7 + 104729 * j)) % 1021 >= 510 THEN 1 ELSE -1 END) AS tot
         |  FROM sh CROSS JOIN generate_series(0, 15) t(j) GROUP BY doc_id, j),
         |sim AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN tot > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id),
         |chunks AS (
         |  SELECT doc_id, simhash, CAST(i AS INT) AS i, (simhash >> (i * 4)) & 15 AS c
         |  FROM sim CROSS JOIN generate_series(0, 3) t(i)),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.simhash AS sa, r.simhash AS sb
         |  FROM chunks l JOIN chunks r ON l.i = r.i AND l.c = r.c AND l.doc_id < r.doc_id)
         |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,
    "td_seq_pack" ->
      """WITH t AS (
        |  SELECT lang, doc_id,
        |    CAST((length(text) - length(replace(text, ' ', ''))) + 1 AS BIGINT) AS toks
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, toks,
        |    CAST(COALESCE(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gs
        |  FROM t),
        |u AS (
        |  SELECT lang, doc_id, toks, gs,
        |    unnest(generate_series(gs // 512, (gs + toks - 1) // 512)) AS bin
        |  FROM c)
        |SELECT lang, doc_id, CAST(bin AS BIGINT) AS bin,
        |  GREATEST(0, bin * 512 - gs) AS doc_from,
        |  LEAST(toks, (bin + 1) * 512 - gs) AS doc_to
        |FROM u""".stripMargin,
    "td_containment" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents), $shCte,
         |cand AS (
         |  SELECT a.doc_id AS a, a.doc_id + 1 AS b FROM documents a
         |  WHERE EXISTS (SELECT 1 FROM documents x WHERE x.doc_id = a.doc_id + 1)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.a, c.b, COUNT(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.h = sa.h
         |  GROUP BY c.a, c.b)
         |SELECT c.a, c.b,
         |  ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE) / (na.n + nb.n - COALESCE(i.i, 0)), 5) AS jaccard,
         |  ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE) / na.n, 5) AS cont_a,
         |  ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE) / nb.n, 5) AS cont_b
         |FROM cand c
         |LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
         |JOIN sizes na ON na.doc_id = c.a
         |JOIN sizes nb ON nb.doc_id = c.b""".stripMargin,
    "td_jaccard_consecutive" -> (s"WITH corpus AS (SELECT doc_id, text FROM documents), $shCte,\n" +
      jaccardSql(
        """cand AS (
          |  SELECT a.doc_id AS a, a.doc_id + 1 AS b FROM documents a
          |  WHERE EXISTS (SELECT 1 FROM documents x WHERE x.doc_id = a.doc_id + 1))""".stripMargin)),
    "td_langid" -> {
      def cnt(w: String) = s"CAST((length(t) - length(replace(t, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
      s"""WITH d AS (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
         |sc AS (SELECT doc_id,
         |  ${cnt("the")} + ${cnt("and")} + ${cnt("of")} AS en,
         |  ${cnt("der")} + ${cnt("und")} + ${cnt("die")} AS de,
         |  ${cnt("le")} + ${cnt("et")} + ${cnt("la")} AS fr,
         |  ${cnt("el")} + ${cnt("y")} + ${cnt("los")} AS es
         |FROM d)
         |SELECT doc_id, CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
         |  WHEN de >= fr AND de >= es THEN 'de' WHEN fr >= es THEN 'fr' ELSE 'es' END AS predicted
         |FROM sc""".stripMargin
    },
    "td_bm25_features" ->
      """WITH tt AS MATERIALIZED (
        |  SELECT doc_id, t.term FROM documents,
        |    UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(term)
        |  WHERE length(t.term) > 0),
        |p AS MATERIALIZED (
        |  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM tt
        |  WHERE term IN ('spark', 'table', 'join', 'vector') GROUP BY 1, 2),
        |dfp AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM p GROUP BY 1),
        |lens AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS doclen FROM tt GROUP BY 1),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(doclen) AS BIGINT) AS len_sum FROM lens)
        |SELECT p.term, p.doc_id, p.tf, dfp.df, lens.doclen, c.n_docs, c.len_sum
        |FROM p JOIN dfp USING (term) JOIN lens USING (doc_id) CROSS JOIN c""".stripMargin,
    "td_quality" ->
      """WITH d AS (SELECT doc_id, text,
        |  CAST((length(text) - length(replace(text, ' ', ''))) / 1 AS BIGINT) + 1 AS n_tokens,
        |  CAST((length(text) - length(replace(text, '.', ''))) / 1 AS BIGINT)
        |    + CAST((length(text) - length(replace(text, ',', ''))) / 1 AS BIGINT)
        |    + CAST((length(text) - length(replace(text, '!', ''))) / 1 AS BIGINT) AS punct,
        |  CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' the ', ''))) / 5 AS BIGINT)
        |    + CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' a ', ''))) / 3 AS BIGINT)
        |    + CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' of ', ''))) / 4 AS BIGINT) AS stop
        |FROM documents)
        |SELECT doc_id, n_tokens,
        |  ROUND(CAST(punct AS DOUBLE) / n_tokens, 5) AS punct_ratio,
        |  ROUND(CAST(stop AS DOUBLE) / n_tokens, 5) AS stop_ratio,
        |  ROUND(LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
        |        * (1.0 - LEAST(CAST(punct AS DOUBLE) / n_tokens, 1.0))
        |        * LEAST(CAST(stop AS DOUBLE) * 10.0 / n_tokens + 0.1, 1.0), 5) AS quality
        |FROM d""".stripMargin,
    "td_fingerprint" -> "SELECT doc_id, md5(lower(text)) AS fp FROM documents",
    "td_token_count" -> {
      // the RE2 pattern, single quotes doubled for the SQL literal
      val pat = TextOps.BpeishPattern.replace("'", "''")
      s"""SELECT doc_id,
         |  CAST((length(text) - length(replace(text, ' ', ''))) + 1 AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS bpe_tokens
         |FROM documents""".stripMargin
    },
    "td_rrf_hybrid" ->
      s"""WITH g2 AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, gram
         |  FROM (${graft.text.Curation.wordNgramsSql("documents", 2)}) t),
         |sizes AS MATERIALIZED (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM g2 GROUP BY 1),
         |ix AS (SELECT q.doc_id AS q, d.doc_id AS doc,
         |         CAST(COUNT(*) AS BIGINT) AS ix
         |       FROM g2 q JOIN g2 d USING (gram)
         |       WHERE q.doc_id < 10 AND d.doc_id <> q.doc_id GROUP BY 1, 2),
         |lex AS (SELECT q, doc, CAST(row_number() OVER (PARTITION BY q
         |          ORDER BY (1000000 * ix // (sq.n + sd.n - ix)) DESC, doc) AS INT) AS rnk
         |        FROM ix JOIN sizes sq ON sq.doc_id = q
         |        JOIN sizes sd ON sd.doc_id = doc),
         |${evCte("embeddings")},
         |norms AS MATERIALIZED (
         |  SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ev GROUP BY vec_id),
         |dots AS (
         |  SELECT a.vec_id AS q, b.vec_id AS doc, SUM(a.x * b.x) AS dot
         |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
         |  GROUP BY 1, 2),
         |dense AS (SELECT q, doc, CAST(row_number() OVER (PARTITION BY q
         |            ORDER BY ROUND(dot / (nq.nrm * nn.nrm), 6) DESC, doc) AS INT) AS rnk
         |          FROM dots JOIN norms nq ON nq.vec_id = q
         |          JOIN norms nn ON nn.vec_id = doc),
         |uni AS (SELECT q, doc, 1000000000 // (60 + rnk) AS c
         |        FROM lex WHERE rnk <= 20
         |        UNION ALL
         |        SELECT q, doc, 1000000000 // (60 + rnk) FROM dense WHERE rnk <= 20),
         |sc AS (SELECT q, doc, CAST(SUM(c) AS BIGINT) AS rrf_score
         |       FROM uni GROUP BY 1, 2)
         |SELECT q, doc, rrf_score, rrf_rank FROM (
         |  SELECT q, doc, rrf_score, CAST(row_number() OVER (PARTITION BY q
         |    ORDER BY rrf_score DESC, doc) AS INT) AS rrf_rank FROM sc) r
         |WHERE rrf_rank <= 10""".stripMargin,
    "td_ann_topk" ->
      s"""WITH ${evCte("embeddings")},
         |norms AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ev GROUP BY vec_id),
         |dots AS (
         |  SELECT a.vec_id AS q, b.vec_id AS neighbor, SUM(a.x * b.x) AS dot
         |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
         |  GROUP BY a.vec_id, b.vec_id)
         |SELECT q, rank, neighbor FROM (
         |  SELECT q, neighbor, CAST(row_number() OVER (
         |    PARTITION BY q ORDER BY ROUND(dot / (nq.nrm * nn.nrm), 6) DESC, neighbor) AS INT) AS rank
         |  FROM dots JOIN norms nq ON nq.vec_id = q JOIN norms nn ON nn.vec_id = neighbor) r
         |WHERE rank <= 5""".stripMargin,
    "td_ann_lsh_bucket" -> s"WITH ${evCte("embeddings")}\n$bucketSql",
    // IVF: deterministic LCG-seeded centroids, max-cosine assignment,
    // nprobe=4 of nlist=16 lists probed per query. The indexed variant is
    // the SAME search through a TableIO-persisted index — byte-equal by
    // contract, so one oracle serves both rows.
    "td_ann_ivf" -> ivfOracleSql,
    "td_ann_ivf_indexed" -> ivfOracleSql,
    "td_pq_codes" -> s"WITH ${pqCtes(8)}\nSELECT vec_id, sub, code FROM codes",
    "td_pq_adc" ->
      s"""WITH ${pqCtes(8)},
         |$pqAdcCtes
         |SELECT q, adc_rank, neighbor FROM adc WHERE adc_rank <= 5""".stripMargin,
    // ADC shortlist-50 + exact-cosine re-rank at m=16 — the recall lever
    // (codes propose, raw embeddings score only |Q|·50 rows)
    "td_pq_rerank" ->
      s"""WITH ${pqCtes(16)},
         |$pqAdcCtes,
         |short AS MATERIALIZED (SELECT q, neighbor FROM adc WHERE adc_rank <= 50),
         |norms AS MATERIALIZED (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ev GROUP BY vec_id),
         |rd AS (
         |  SELECT s.q, s.neighbor, SUM(ea.x * eb.x) AS dot FROM short s
         |  JOIN ev ea ON ea.vec_id = s.q
         |  JOIN ev eb ON eb.vec_id = s.neighbor AND eb.i = ea.i
         |  GROUP BY 1, 2)
         |SELECT q, rerank, neighbor FROM (
         |  SELECT rd.q, neighbor, CAST(row_number() OVER (PARTITION BY rd.q
         |    ORDER BY ROUND(dot / (nq.nrm * nn.nrm), 6) DESC, neighbor) AS INT) AS rerank
         |  FROM rd JOIN norms nq ON nq.vec_id = rd.q
         |  JOIN norms nn ON nn.vec_id = rd.neighbor) t
         |WHERE rerank <= 5""".stripMargin,
    // sessionization: new session iff ts > prev_ts + gap — Spark's
    // session_window merges TOUCHING windows (an event at exactly
    // prev + gap joins the session; verified empirically in
    // StreamingSpec); DECIMAL sum = order-independent
    "td_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // as-of: identical union-tag total order (ts, tag, event_id) — view
    // rows sort before clicks at an equal instant, so at-or-before
    // includes ties exactly like the engine's window
    "td_asof" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tag
        |  FROM events WHERE event_type IN ('view', 'click')),
        |m AS (
        |  SELECT user_id, ts, event_id, tag,
        |         last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS) OVER w AS view_id,
        |         last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS) OVER w AS view_value,
        |         last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS) OVER w AS view_ts
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id ROWS UNBOUNDED PRECEDING))
        |SELECT event_id AS click_id, user_id, view_id, view_value,
        |       CAST(epoch_us(ts) - epoch_us(view_ts) AS BIGINT) AS lag_us
        |FROM m WHERE tag = 1""".stripMargin,
    "td_rolling" ->
      """SELECT event_id, user_id,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS trail_cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)""".stripMargin,
    "td_quantiles" ->
      """WITH ranked AS MATERIALIZED (
        |  SELECT lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT lang, CAST(p.pct AS INT) AS pct, n_chars AS q_value
        |FROM ranked, (VALUES (25), (50), (75), (95)) p(pct)
        |WHERE rn = (CAST(p.pct AS BIGINT) * n + 99) // 100""".stripMargin,
    "td_profile" -> Seq("doc_id", "lang", "source", "n_chars").map { c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_v, CAST(MAX($c) AS VARCHAR) AS max_v
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL "),
    "td_corpus_overlap" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents), $shCte, $mhCte,
         |cs AS (
         |  SELECT d.lang AS key_a, m.j, MIN(m.mh) AS cmh
         |  FROM mh m JOIN documents d ON d.doc_id = m.doc_id
         |  GROUP BY 1, 2)
         |SELECT a.key_a, b.key_a AS key_b,
         |       CAST(COUNT(*) AS BIGINT) AS k,
         |       CAST(SUM(CASE WHEN a.cmh = b.cmh THEN 1 ELSE 0 END) AS BIGINT) AS agree_cnt
         |FROM cs a JOIN cs b ON a.j = b.j AND a.key_a < b.key_a
         |GROUP BY 1, 2""".stripMargin,
    "td_scd2" ->
      """WITH c AS (
        |  SELECT user_id, event_type, ts, event_id FROM (
        |    SELECT user_id, event_type, ts, event_id,
        |           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |    FROM events) t
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type AS state,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |                '%Y-%m-%d %H:%M:%S.%f') AS valid_to
        |FROM c""".stripMargin,
    "td_funnel" -> funnelOracle,
    // the streaming funnel replays the same events in event-time order
    // (one AvailableNow batch), so the batch oracle applies verbatim
    "td_funnel_stream" -> funnelOracle,
    // winnowing: same k-gram polynomial (Σ cp·31^j mod P, direct form of
    // the Spark side's rolling mod) + same h·2³²+(2³²−1−i) window-min key
    "td_winnow_fp" -> {
      val k = 8
      val pows = (0 until k).map(j => BigInt(31).pow(k - 1 - j).toLong)
      val terms = pows.zipWithIndex
        .map { case (p, j) => s"CAST(ascii(substr(t, i + $j, 1)) AS BIGINT) * $p" }
        .mkString(" + ")
      s"""WITH kg AS (
         |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS i,
         |    CAST(($terms) % 2147483647 AS BIGINT) AS h
         |  FROM (SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= $k) d
         |  CROSS JOIN generate_series(1, ${TextOps.OracleMaxDocLen}) g(i)
         |  WHERE i <= length(t) - ${k - 1}),
         |sel AS (
         |  SELECT doc_id, i,
         |    MIN(h * 4294967296 + (4294967295 - i)) OVER (
         |      PARTITION BY doc_id ORDER BY i ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s
         |  FROM kg)
         |SELECT DISTINCT doc_id, 4294967295 - (s % 4294967296) AS pos, s // 4294967296 AS h
         |FROM sel WHERE i >= 3""".stripMargin
    },
    "td_dedup_embedding" ->
      s"""WITH $embCte, ${evCte("ec")},
         |$embPairsCtes
         |SELECT a, b FROM epairs""".stripMargin,
    // same closure shape as td_dedup_clusters over the embedding pairs
    "td_dedup_emb_clusters" ->
      s"""WITH RECURSIVE $embCte, ${evCte("ec")},
         |$embPairsCtes,
         |und AS MATERIALIZED (SELECT a AS u, b AS v FROM epairs UNION SELECT b, a FROM epairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
         |SELECT c.vec_id,
         |  CAST(COALESCE(LEAST(c.vec_id, MIN(r.v)), c.vec_id) AS BIGINT) AS keeper
         |FROM ec c LEFT JOIN reach r ON r.u = c.vec_id
         |GROUP BY c.vec_id""".stripMargin,
    // SemDeDup replay: the ivf assignment CTE chain over the PLANTED
    // corpus, then the pairwise drop rule (drop x iff a cluster-mate y
    // with cos ≥ τ sits farther from the centroid, ties to lower id)
    "td_semdedup" ->
      s"""WITH $embCte, ${evCte("ec")},
         |cent AS (SELECT vec_id AS cid FROM ec
         |  ORDER BY ${graft.core.Determinism.lcgDuck("vec_id", 97L)}, vec_id LIMIT 16),
         |norms AS MATERIALIZED (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ev GROUP BY vec_id),
         |cdots AS (
         |  SELECT a.vec_id, b.vec_id AS cid, SUM(a.x * b.x) AS dot
         |  FROM ev a JOIN ev b ON b.i = a.i
         |  WHERE b.vec_id IN (SELECT cid FROM cent)
         |  GROUP BY a.vec_id, b.vec_id),
         |csims AS (
         |  SELECT c.vec_id, c.cid, ROUND(c.dot / (na.nrm * nc.nrm), 6) AS csim
         |  FROM cdots c JOIN norms na ON na.vec_id = c.vec_id
         |  JOIN norms nc ON nc.vec_id = c.cid),
         |assign AS MATERIALIZED (SELECT vec_id, cid, csim FROM (
         |  SELECT vec_id, cid, csim, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
         |  FROM csims) a WHERE rn = 1),
         |cand AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM assign x JOIN assign y ON x.cid = y.cid AND x.vec_id <> y.vec_id
         |  WHERE y.csim < x.csim OR (y.csim = x.csim AND y.vec_id < x.vec_id)),
         |pdots AS (
         |  SELECT c.a, c.b, SUM(ea.x * eb.x) AS dot FROM cand c
         |  JOIN ev ea ON ea.vec_id = c.a JOIN ev eb ON eb.vec_id = c.b AND eb.i = ea.i
         |  GROUP BY c.a, c.b),
         |dropped AS (
         |  SELECT DISTINCT p.a AS vec_id FROM pdots p
         |  JOIN norms na ON na.vec_id = p.a JOIN norms nb ON nb.vec_id = p.b
         |  WHERE ROUND(p.dot / (na.nrm * nb.nrm), 6) >= 0.99)
         |SELECT a.vec_id, a.cid, a.csim,
         |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
         |FROM assign a LEFT JOIN dropped d ON d.vec_id = a.vec_id""".stripMargin,
    // DSIR feature replay: same single-space unigram+bigram grams, same
    // md5 48-bit bucket (md5Int is non-negative, plain % suffices)
    "td_dsir_features" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
         |grams AS (
         |  SELECT doc_id, unnest(ts) AS gram FROM toks
         |  UNION ALL
         |  SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS gram FROM toks
         |  CROSS JOIN generate_series(1, 128) g(i) WHERE i <= len(ts) - 1),
         |feats AS MATERIALIZED (
         |  SELECT doc_id,
         |    CAST((${graft.core.Determinism.md5IntDuck("gram")}) % 512 AS INT) AS bucket,
         |    COUNT(*) AS cnt
         |  FROM grams GROUP BY 1, 2),
         |tot AS MATERIALIZED (
         |  SELECT bucket,
         |    SUM(CASE WHEN doc_id % 5 = 0 THEN cnt ELSE 0 END) AS tgt_cnt,
         |    SUM(cnt) AS raw_cnt
         |  FROM feats GROUP BY bucket)
         |SELECT f.doc_id, f.bucket, CAST(f.cnt AS BIGINT) AS cnt,
         |  CAST(t.tgt_cnt AS BIGINT) AS tgt_cnt, CAST(t.raw_cnt AS BIGINT) AS raw_cnt
         |FROM feats f JOIN tot t ON t.bucket = f.bucket""".stripMargin)

  private lazy val embPairsCtes =
    s"""proj AS (
       |  SELECT vec_id, CAST(j AS INT) AS j,
       |    SUM(CASE WHEN ${Ann.planeSignDuck()} THEN q ELSE -q END) AS s
       |  FROM (SELECT vec_id, i, CAST(ROUND(x * 1000000, 0) AS BIGINT) AS q FROM ev) evq
       |  CROSS JOIN generate_series(0, ${Ann.EmbBands * Ann.EmbBandBits - 1}) t(j)
       |  GROUP BY vec_id, j),
       |bands AS (
       |  SELECT vec_id, CAST(j // ${Ann.EmbBandBits} AS INT) AS band,
       |    CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << (j % ${Ann.EmbBandBits})) ELSE 0 END) AS BIGINT) AS key
       |  FROM proj GROUP BY vec_id, j // ${Ann.EmbBandBits}),
       |norms AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM ev GROUP BY vec_id),
       |cand AS (
       |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b FROM bands l
       |  JOIN bands r ON l.band = r.band AND l.key = r.key AND l.vec_id < r.vec_id),
       |dots AS (
       |  SELECT c.a, c.b, SUM(ea.x * eb.x) AS dot FROM cand c
       |  JOIN ev ea ON ea.vec_id = c.a JOIN ev eb ON eb.vec_id = c.b AND eb.i = ea.i
       |  GROUP BY c.a, c.b),
       |epairs AS (
       |  SELECT a, b FROM (
       |    SELECT d.a, d.b, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim FROM dots d
       |    JOIN norms na ON na.vec_id = d.a JOIN norms nb ON nb.vec_id = d.b) s
       |  WHERE sim >= 0.999)""".stripMargin
}
