package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-curation operators: URL normalization cases, PII redaction
  * idempotence, decontamination semantics, repetition signals against a
  * hand-computed example, and mixture-sampling determinism/rates. */
class CurationSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // ------------------------------------------------------ urlNormalize

  test("urlNormalize: lowercasing, default-port strip, utm drop, fragment drop") {
    val in = Seq(
      (1L, "https://Ex.ORG:443/a/doc1?utm_source=feed&id=1#sec"),
      (2L, "HTTP://ex.org:443/a/doc2"), // :443 NOT default for http — kept
      (3L, "HTTP://ex.org:80/a/doc3?utm_medium=x"), // :80 default — stripped
      (4L, "https://www.Ex.org:8080/x/y/z?id=4&utm_x=1&q=2"),
      (5L, "https://ex.org"), // empty path → "/"
      (6L, "not a url 6") // quarantine passthrough
    ).toDF("doc_id", "url")
    val out = Curation.urlNormalize(in).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) === (("https://ex.org/a/doc1?id=1", "ex.org", 2L)))
    assert(out(2L) === (("http://ex.org:443/a/doc2", "ex.org", 2L)))
    assert(out(3L) === (("http://ex.org/a/doc3", "ex.org", 2L)))
    assert(out(4L) === (("https://www.ex.org:8080/x/y/z?id=4&q=2", "www.ex.org", 3L)))
    assert(out(5L) === (("https://ex.org/", "ex.org", 1L)))
    assert(out(6L) === (("not a url 6", "", 0L)))
  }

  // --------------------------------------------------------------- pii

  test("pii: counts match plants; redaction is idempotent (no residual PII)") {
    val in = Seq(
      (1L, "write to alice@example.com or bob.c+x@sub.ex.org today"),
      (2L, "call 555-123-4567 and 555-000-1111 thanks"),
      (3L, "mixed a@b.io 555-999-8888"),
      (4L, "clean text with no contact info at all")
    ).toDF("doc_id", "text")
    val out = Curation.pii(in).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L)._1 === 2L && out(1L)._2 === 0L)
    assert(out(2L) === ((0L, 2L, "call <PHONE> and <PHONE> thanks")))
    assert(out(3L) === ((1L, 1L, "mixed <EMAIL> <PHONE>")))
    assert(out(4L) === ((0L, 0L, "clean text with no contact info at all")))
    // second pass over redacted output finds nothing
    val again = Curation.pii(
      Curation.pii(in).select(col("doc_id"), col("redacted").as("text")))
    assert(again.agg(sum(col("n_emails")), sum(col("n_phones")))
      .collect()(0).toSeq === Seq(0L, 0L))
  }

  // ----------------------------------------------------- decontaminate

  test("decontaminate: exact copies and tail-edited near-copies flagged, disjoint docs not") {
    val evalDoc = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val bench = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, evalDoc), // full copy → 3 shared 8-grams
      (2L, evalDoc + " tail"), // superset → still shares all 3
      (3L, "w3 w4 w5 w6 w7 w8 w9 w10"), // exactly one benchmark 8-gram
      (4L, "a b c d e f g h i j"), // disjoint
      (5L, "w1 w2 w3 w4 w5 w6 w7") // only 7 words — no 8-gram
    ).toDF("doc_id", "text")
    val hits = Curation.decontaminate(docs, bench, n = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits === Map(1L -> 3L, 2L -> 3L, 3L -> 1L))
  }

  // ------------------------------------------------- repetitionSignals

  test("repetitionSignals: hand-computed fractions, short-doc zeros") {
    val docs = Seq(
      (1L, "a b a b a b"), // top 2-gram "a b"×3, len 11 → 9/11; dup3 20/11 → cap 1.0
      (2L, "x y z w"), // all 2-grams unique; tie → max gram "z w"; no dup 3-grams
      (3L, "solo") // no 2-grams at all
    ).toDF("doc_id", "text")
    val out = Curation.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L) === ((0.81818, 1.0)))
    assert(out(2L) === ((0.42857, 0.0))) // "y z"×1 · 3 chars / 7
    assert(out(3L) === ((0.0, 0.0)))
  }

  // ------------------------------------------------------- mixSample

  test("mixSample: kept rows honor per-source rates, deterministic, unbiased-ish") {
    val docs = (0L until 4000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val rates = Seq(("src0", 0L), ("src1", 250L), ("src2", 500L), ("src3", 1000L))
      .toDF("source", "keep_per_mille")
    val kept = Curation.mixSample(docs, rates).cache()
    val bySrc = kept.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src0")) // rate 0 keeps nothing
    assert(bySrc("src3") === 1000L) // rate 1000 keeps everything
    // rates 25% / 50% of 1000 docs each, hash-uniform within ±15%
    assert(bySrc("src1") > 180 && bySrc("src1") < 320, s"src1=${bySrc("src1")}")
    assert(bySrc("src2") > 420 && bySrc("src2") < 580, s"src2=${bySrc("src2")}")
    // determinism: a second evaluation selects the identical id set
    val again = Curation.mixSample(docs, rates)
    assert(kept.select("doc_id").except(again.select("doc_id")).isEmpty &&
      again.select("doc_id").except(kept.select("doc_id")).isEmpty)
    // bucket range invariant
    val buckets = docs.select(Curation.hashBucket(col("doc_id")).as("b"))
      .agg(min(col("b")), max(col("b"))).collect()(0)
    assert(buckets.getLong(0) >= 0L && buckets.getLong(1) < 1000L)
    kept.unpersist()
  }

  // ------------------------------------------------------- splitAssign

  test("splitAssign: exhaustive partition, ~proportions, stable under corpus growth") {
    val docs = (0L until 2000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val splits = Curation.splitAssign(docs, valPerMille = 100, testPerMille = 100)
    val bySplit = splits.groupBy(col("split")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "validation", "test"))
    assert(bySplit.values.sum === 2000L)
    assert(bySplit("validation") > 140 && bySplit("validation") < 260)
    assert(bySplit("test") > 140 && bySplit("test") < 260)
    // growth stability: the first 500 docs keep their split when 1500 more exist
    val small = Curation.splitAssign(docs.filter(col("doc_id") < 500))
    val restricted = splits.filter(col("doc_id") < 500)
    assert(small.except(restricted).isEmpty && restricted.except(small).isEmpty)
  }

  // ------------------------------------------------------------- chunk

  test("chunk: overlapping windows cover every token; short docs one chunk") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // 10 tokens, max 4, ov 1 → 3 chunks
      (2L, "a b"), // shorter than window → single whole-doc chunk
      (3L, "x1 x2 x3 x4") // exactly one window
    ).toDF("doc_id", "text")
    val out = Curation.chunk(docs, maxTokens = 4, overlap = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out === Map(
      (1L, 0L) -> "w1 w2 w3 w4", (1L, 1L) -> "w4 w5 w6 w7", (1L, 2L) -> "w7 w8 w9 w10",
      (2L, 0L) -> "a b",
      (3L, 0L) -> "x1 x2 x3 x4"))
  }

  // ---------------------------------------------------------- dupSpans

  test("dupSpans: cross-doc and within-doc seeds merge into maximal spans") {
    val docs = Seq(
      (1L, "a b c d e f"), // shares "a b c","b c d" with doc 2
      (2L, "x x a b c d y"),
      (3L, "p q r s p q r s"), // within-doc repeat; coverage-adjacent merge
      (4L, "u v w z1 z2 z3"), // no duplicated 3-gram
      (5L, "a b") // shorter than k — no seeds
    ).toDF("doc_id", "text")
    val out = Curation.dupSpans(docs, k = 3).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toSet
    // doc1: seeds pos 1,2 → span 1..4; doc2: seeds pos 3,4 → span 3..6
    // doc3: "p q r"/"q r s" each ×2 → seeds 1,2,5,6; pos5 ≤ 2+3 merges → 1..8
    assert(out === Set(
      (1L, (1L, 4L, 4L)),
      (2L, (3L, 6L, 4L)),
      (3L, (1L, 8L, 8L))))
  }

  test("dupSpans: a gap beyond k splits islands; fraction covers every doc") {
    // doc 1 repeats doc 2's head AND tail with unique middle filler —
    // two separate spans (gap 5..6 > seed reach)
    val docs = Seq(
      (1L, "h1 h2 h3 m1 m2 m3 m4 t1 t2 t3"),
      (2L, "h1 h2 h3 q1 q2 q3 q4 t1 t2 t3"),
      (3L, "all unique words here entirely")
    ).toDF("doc_id", "text")
    val spans = Curation.dupSpans(docs, k = 3)
    val byDoc = spans.collect().groupBy(_.getLong(0))
    assert(byDoc(1L).map(r => (r.getLong(1), r.getLong(2))).toSet ===
      Set((1L, 3L), (8L, 10L)))
    assert(byDoc(2L).map(r => (r.getLong(1), r.getLong(2))).toSet ===
      Set((1L, 3L), (8L, 10L)))
    assert(!byDoc.contains(3L))
    val frac = Curation.dupSpanFraction(docs, k = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(frac === Map(1L -> 0.6, 2L -> 0.6, 3L -> 0.0)) // 6 of 10 tokens
  }

  // ----------------------------------------------------- packSequences

  test("packSequences: hand-computed bins/offsets, sources pack independently") {
    // token counts by construction: "w" ×k → k tokens
    def t(k: Int) = Seq.fill(k)("w").mkString(" ")
    val docs = Seq(
      (1L, "a", t(4)), (2L, "a", t(5)), (3L, "a", t(3)), (4L, "a", t(7)), (5L, "a", t(2)),
      (10L, "b", t(9)), (11L, "b", t(2))
    ).toDF("doc_id", "source", "text")
    val out = Curation.packSequences(docs, capacity = 10L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // source a offsets: 0,4,9,12,19 → bins 0,0,0,1,1; offsets within bin 0,4,9,2,9
    assert(out(1L) === ((4L, 0L, 0L)))
    assert(out(2L) === ((5L, 0L, 4L)))
    assert(out(3L) === ((3L, 0L, 9L)))
    assert(out(4L) === ((7L, 1L, 2L)))
    assert(out(5L) === ((2L, 1L, 9L)))
    // source b restarts at offset 0
    assert(out(10L) === ((9L, 0L, 0L)))
    assert(out(11L) === ((2L, 0L, 9L)))
  }

  // ------------------------------------------------------- capPerGroup

  test("capPerGroup: over-cap groups trimmed to exactly cap, under-cap intact, deterministic") {
    val docs = ((0L until 40L).map(i => (i, "big")) ++
      (100L until 103L).map(i => (i, "small"))).toDF("doc_id", "group")
    val kept = Curation.capPerGroup(docs, cap = 10, groupCol = "group")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byGroup = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGroup("big").size === 10)
    assert(byGroup("small") === Set(100L, 101L, 102L)) // under cap: untouched
    // selection = the 10 smallest (rankHash, id) keys — recompute driver-side
    val expectBig = (0L until 40L)
      .sortBy(i => (((i % 2147483647L) * 2654435761L) % 2147483647L, i)).take(10).toSet
    assert(byGroup("big") === expectBig)
    // deterministic across partitionings
    val again = Curation.capPerGroup(docs.repartition(7), cap = 10, groupCol = "group")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === kept.toSet)
  }

  test("capPerGroup: a group exactly AT the cap is passed through, not windowed") {
    val docs = (0L until 5L).map(i => (i, "g")).toDF("doc_id", "group")
    val kept = Curation.capPerGroup(docs, cap = 5, groupCol = "group")
    assert(kept.count() === 5L)
  }

  test("hash keys survive 10^12-range ids (no ANSI int64 overflow)") {
    // a raw id * 2654435761 multiply overflows int64 (and, under Spark's
    // default ANSI mode, THROWS) once ids pass ~3.5e9 — exactly the id
    // range of the 10^12-doc corpus these operators target. The pre-mod
    // form must (a) not throw and (b) agree with exact BigInt arithmetic.
    val ids = Seq(0L, 1L, 2147483646L, 2147483647L, 3500000000L,
      1000000000000L, Long.MaxValue / 2, Long.MaxValue)
    val out = ids.toDF("doc_id")
      .select(col("doc_id"), Curation.hashBucket(col("doc_id")).as("b"),
        Curation.rankHash(col("doc_id")).as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    ids.foreach { i =>
      val m = BigInt(2147483647L)
      val exp = (BigInt(i) % m) * BigInt(2654435761L) % m
      assert(out(i) === (((exp % 1000).toLong, exp.toLong)), s"id $i")
    }
    // and the split/mix operators built on it run end-to-end at that range
    val split = Curation.splitAssign(ids.toDF("doc_id")).collect()
    assert(split.length === ids.size)
  }
}
