package graft.dedup

import graft.SparkSpec
import graft.sim.Ann
import graft.text.TextOps
import graft.expr.RollingHash
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different content with zero overlap qqq")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per text") {
    val survivors = ids2(Dedup.exact(corpus))
    assert(survivors === Set(1L, 3L, 4L))
  }

  test("minhash-lsh finds exact and near dups, not disjoint docs") {
    val pairs = Dedup.minhashLsh(corpus, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)))
    val j12 = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(j12 === 1.0)
    assert(!keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("near-dup clusters: transitive grouping, min-id keeper, singletons self") {
    // 1≈2 (exact) and 1≈3 (near): {1,2,3} must cluster TRANSITIVELY even
    // if the (2,3) pair alone sat below threshold; 4 is a singleton
    val clusters = Dedup.nearDupClusters(corpus, 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
    // keeper === doc_id is the dedup filter: exactly one survivor per cluster
    assert(clusters.count { case (d, k) => d == k } === 2)
  }

  test("minhash-lsh recall vs brute-force ground truth on the real corpus") {
    // every TRUE near-dup pair (exact shingle Jaccard ≥ t over ALL pairs)
    // that the banded blocking must recover. Precision is exact by
    // construction (the verify stage recomputes exact Jaccard); recall is
    // the banding family's P(band collision) = 1 − (1 − J^r)^b per pair —
    // deterministic here (fixed hash family, fixed corpus), so the bound
    // is a hard regression gate, not a flaky stochastic one.
    val t = 0.8
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val idsOnly = docs.select("doc_id")
    val allPairs = idsOnly.withColumnRenamed("doc_id", "a")
      .crossJoin(idsOnly.withColumnRenamed("doc_id", "b"))
      .filter(col("a") < col("b"))
    val truth = Dedup.jaccardOf(docs, allPairs).filter(col("jaccard") >= t)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.minhashLsh(docs, t)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture corpus must contain true near-dups")
    assert(found.subsetOf(truth), "verify stage must make precision exact")
    val recall = found.size.toDouble / truth.size
    info(f"blocking recall $recall%.4f (${found.size}/${truth.size} true pairs)")
    assert(recall >= 0.85, f"blocking recall $recall%.3f below bound (found ${found.size}/${truth.size})")
  }

  test("simhash pigeonhole recall is EXACTLY total vs brute-force Hamming") {
    // the chunk join is not probabilistic: any pair within Hamming ≤ 3 of
    // a 16-bit simhash MUST agree on ≥ 1 of the 4 four-bit chunks, so the
    // candidate set provably covers the truth set — assert set EQUALITY
    // against brute-force all-pairs Hamming on the real corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val sh = Dedup.simhash(docs)
    val truth = sh.select(col("doc_id").as("a"), col("simhash").as("sa"))
      .crossJoin(sh.select(col("doc_id").as("b"), col("simhash").as("sb")))
      .filter(col("a") < col("b"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.simhashNearDup(docs, 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture corpus must contain simhash near-dups")
    assert(found === truth, s"pigeonhole cover must be exact: ${found.size} vs ${truth.size}")
  }

  test("jaccard is exact") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("a", "b")
    val j = Dedup.jaccardOf(corpus, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((1L, 4L)) < 0.2)
  }

  test("corpusOverlap: identical corpora agree everywhere, disjoint nowhere") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "a"),
      (2L, "a completely different second document body", "a"),
      (3L, "the quick brown fox jumps over the lazy dog", "b"), // b == a as a SET
      (4L, "a completely different second document body", "b"),
      (5L, "zzzz qqqq wwww kkkk vvvv xxxx yyyy uuuu rrrr", "c")) // disjoint alphabet
      .toDF("doc_id", "text", "src")
    val got = Dedup.corpusOverlap(docs, "src").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(("a", "b")) === (Dedup.NumHashes.toLong, Dedup.NumHashes.toLong))
    assert(got(("a", "c"))._2 === 0L)
    assert(got(("b", "c"))._2 === 0L)
  }

  test("corpusOverlap signature is the MIN-merge of the per-doc signatures") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "a"),
      (2L, "a completely different second document body", "a"))
      .toDF("doc_id", "text", "src")
    // merge property: min over the two docs' signature rows per index
    val perDoc = Dedup.minhash(docs.select($"doc_id", $"text")).collect()
      .groupBy(_.getInt(1)).map { case (j, rs) => j -> rs.map(_.getLong(2)).min }
    val merged = Dedup.corpusOverlap(
      docs.unionAll(Seq((9L, "unrelated probe text for the second key qq", "z"))
        .toDF("doc_id", "text", "src")), "src")
    // recompute the corpus signature through the operator's own internals
    // by comparing key a against itself via an identical copy
    val dup = docs.withColumn("src", lit("a2"))
    val self = Dedup.corpusOverlap(docs.unionAll(dup), "src").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(self(("a", "a2")) === Dedup.NumHashes.toLong)
    assert(perDoc.size === Dedup.NumHashes)
    assert(merged.count() > 0)
  }

  test("simhash: identical texts same hash; disjoint texts differ") {
    val sh = Dedup.simhash(corpus).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L) !== sh(4L))
  }

  test("cosine: identical → 1, orthogonal → 0; topk ranks identical first") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val sims = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
      .crossJoin(e)
      .select($"vec_id", round(Ann.cosine($"qe", $"embedding"), 6).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims(1L) === 1.0)
    assert(sims(2L) === 0.0)
    val top = Ann.bruteForceTopK(e, Seq(0L), 2).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(top(1) === 1L)
    assert(top(2) === 3L)
  }

  test("identical vectors share an LSH bucket; near-dup pairs found") {
    val e = Seq(
      (0L, Array.fill(8)(0.5f)),
      (100L, Array.fill(8)(0.5f)),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val buckets = Ann.lshBucket(e).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(0L) === buckets(100L))
    val pairs = Ann.nearDupPairs(e).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)))
  }

  test("rolling-hash expression matches the Scala reference and runs in codegen") {
    val df = Seq("abc", "hello world", "").toDF("s")
      .select($"s", RollingHash.rollingHash64($"s").as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ref(s: String): Long = {
      var h = 1125899906842597L
      s.getBytes("UTF-8").foreach(b => h = 31L * h + b)
      h
    }
    Seq("abc", "hello world", "").foreach(s => assert(got(s) === ref(s)))
  }

  test("text ops: token count, langid priority, md5 fingerprint") {
    val d = Seq((1L, "the cat and the dog of it"), (2L, "der hund und die katze und")).toDF("doc_id", "text")
    val lid = d.select($"doc_id", TextOps.langId($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lid(1L) === "en")
    assert(lid(2L) === "de")
    val tok = d.select(TextOps.tokenCount($"text")).collect().map(_.getLong(0))
    assert(tok.toSet === Set(7L, 6L))
    val fp = d.filter($"doc_id" === 1).select(TextOps.fingerprintMd5($"text")).head().getString(0)
    assert(fp === java.security.MessageDigest.getInstance("MD5")
      .digest("the cat and the dog of it".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  test("containment: subset doc scores cont_a = 1 while jaccard stays low") {
    // B is A plus a long suffix: every 3-gram of A occurs in B, so
    // c(A,B) = 1 exactly, while J = |A|/|B| < 1 — the asymmetry the
    // operator exists to expose. The reverse direction is |A|/|B| too.
    val a = "the quick brown fox"
    val b = a + " jumps over the lazy dog and keeps going for a while longer"
    val d = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val row = Dedup.containmentOf(d, pairs).head()
    val (j, ca, cb) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(ca === 1.0)
    assert(cb < 1.0 && cb > 0.0)
    assert(j === cb) // with A ⊆ B: J = |A|/|B| = c(B,A)
    assert(j < 0.5)
  }

  test("corpus containment estimate brackets the exact value on planted corpora") {
    // corpus 'sub' is one doc fully contained in corpus 'sup' (plus
    // sup-only docs): exact C(sub ⊆ sup) = 1. The MinHash estimate at
    // k = 16 is coarse; the gate asserts direction and a tolerance band,
    // both deterministic (fixed hash family, fixed corpora).
    val sup = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "sup"),
      (11L, "one two three four five six seven eight nine ten eleven", "sup"),
      (12L, "red orange yellow green blue indigo violet ultraviolet", "sup"))
    val sub = Seq((20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "sub"))
    val d = (sup ++ sub).toDF("doc_id", "text", "src")
    val est = Dedup.corpusContainment(d, "src").head()
    // key_a < key_b lexically: key_a = "sub", key_b = "sup"
    assert(est.getString(0) === "sub" && est.getString(1) === "sup")
    val contSub = est.getDouble(6) // cont_a_est = C(sub ⊆ sup)
    val contSup = est.getDouble(7)
    // exact: C(sub⊆sup) = 1.0; C(sup⊆sub) = |sub∩sup|/|sup| = |sub|/|sup|
    val nSub = est.getLong(2); val nSup = est.getLong(3)
    assert(contSub >= 0.6, s"estimate $contSub too far below exact 1.0 at k=16")
    assert(contSup <= nSub.toDouble / nSup * 1.7 + 0.05,
      s"reverse containment $contSup inconsistent with size ratio")
    assert(contSub > contSup, "direction: the smaller corpus is the contained one")
  }

  test("metaBlocking: CBS weights, minShared floor, WNP union top-k") {
    // blocks: (1,2) share 3 blocks, (1,3) share 2, (1,4)/(2,4) share 1
    val blocks = Seq(
      ("b1", 1L), ("b1", 2L), ("b2", 1L), ("b2", 2L), ("b3", 1L), ("b3", 2L),
      ("b4", 1L), ("b4", 3L), ("b5", 1L), ("b5", 3L),
      ("b6", 1L), ("b6", 4L), ("b7", 2L), ("b7", 4L)
    ).toDF("block", "id")
    val all = Dedup.metaBlocking(blocks, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(all === Map((1L, 2L) -> 3L, (1L, 3L) -> 2L, (1L, 4L) -> 1L, (2L, 4L) -> 1L))
    // minShared = 2 drops the weight-1 pairs
    val floored = Dedup.metaBlocking(blocks, minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(floored === Set((1L, 2L), (1L, 3L)))
    // WNP top-1: node 1 keeps (1,2); node 3 keeps (1,3); node 4 keeps
    // (1,4) (w tie with (2,4), partner-id tiebreak) — union semantics
    val wnp = Dedup.metaBlocking(blocks, minShared = 1, topKPerNode = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wnp === Set((1L, 2L), (1L, 3L), (1L, 4L)))
    // partitioning-invariant
    val re = Dedup.metaBlocking(blocks.repartition(7), minShared = 1, topKPerNode = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(re === wnp)
    intercept[IllegalArgumentException](Dedup.metaBlocking(blocks, minShared = 0))
  }

  private def ids2(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet
}
