package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge training: the classic Sennrich corpus hand-checked merge by
  * merge, fixpoint merge-application parity against a pure-Scala reference
  * (including boundary-sharing chains), tie-break totality, determinism
  * across partitionings, training filters, early exhaustion, and the
  * encode dictionary join. */
class BpeSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val S = Bpe.Sep

  /** pure-Scala reference of the operator's merge-application contract:
    * replace-all passes to the fixpoint */
  private def refApply(seg: String, x: String, y: String): String = {
    val pat = S + x + S + y + S
    val rep = S + x + y + S
    var cur = seg
    var prev = ""
    while (cur != prev) { prev = cur; cur = cur.replace(pat, rep) }
    cur
  }

  private def segOf(word: String): String = S + word.map(_ + S).mkString

  test("classic Sennrich corpus: merges follow hand-computed pair counts") {
    // word counts: low×5, lower×2, newest×6, widest×3 (one doc per word
    // group keeps the corpus tiny but the counts corpus-weighted)
    val docs = Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" "))
    ).toDF("doc_id", "text")
    val m = Bpe.train(docs, k = 4).merges
    // hand-computed: (e,s) 6+3=9 wins; then (es,t) 9; then (e,st)? no —
    // after es+t → est: newest = n·e·w·est, widest = w·i·d·est; next best
    // pair is (l,o) 5+2=7; then (lo,w) 7.
    assert(m(0) === Bpe.Merge(1, "e", "s", 9L))
    assert(m(1) === Bpe.Merge(2, "es", "t", 9L))
    assert(m(2) === Bpe.Merge(3, "l", "o", 7L))
    assert(m(3) === Bpe.Merge(4, "lo", "w", 7L))
  }

  test("merge application matches the pure reference on boundary-sharing chains") {
    // rows: (word, the pair to apply) — includes the x·y·x·y chain where a
    // single replace-all pass leaves occurrences behind, and (a,a) runs
    val cases = Seq(
      ("xyxyxyxy", "x", "y"), ("xyxyxyx", "x", "y"), ("aaaa", "a", "a"),
      ("aaaaaaa", "a", "a"), ("aba", "a", "b"), ("zzz", "a", "b"),
      ("xxyy", "x", "y"), ("yxyx", "x", "y"))
    for ((w, x, y) <- cases) {
      // drive through the real operator: a corpus where (x, y) is the
      // unique top pair is hard to plant generically, so call the private
      // path via train on a 1-word corpus only when (x,y) IS the top pair;
      // otherwise check refApply against a Spark expression evaluation.
      val out = Seq(segOf(w)).toDF("seg")
        .withColumn("seg2", {
          val pat = S + x + S + y + S
          val rep = S + x + y + S
          val folded = (1 to Bpe.FixpointPasses).foldLeft(col("seg"))((c, _) =>
            call_function("replace", c, lit(pat), lit(rep)))
          when(col("seg").contains(pat), folded).otherwise(col("seg"))
        })
        .select("seg2").as[String].collect()(0)
      assert(out === refApply(segOf(w), x, y), s"word=$w pair=($x,$y)")
    }
  }

  test("fixpoint bound: 32-symbol worst-case chain fully merges within FixpointPasses") {
    val w = "xy" * 16 // 32 symbols, 16 boundary-sharing occurrences of (x,y)
    val out = refApply(segOf(w), "x", "y")
    // the reference loops to the true fixpoint; the operator's 16 passes
    // must land on the same string
    var cur = segOf(w)
    (1 to Bpe.FixpointPasses).foreach(_ => cur = cur.replace(S + "x" + S + "y" + S, S + "xy" + S))
    assert(cur === out)
    assert(!cur.contains(S + "x" + S + "y" + S))
  }

  test("determinism: identical merges at any partitioning") {
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.train(docs.repartition(1), 5).merges
    val b = Bpe.train(docs.repartition(13), 5).merges
    assert(a === b)
    assert(a.length === 5)
  }

  test("driver-side merge loop ≡ distributed loop, gate-forced both ways") {
    // the r6 optimization: below the DriverTrainMaxWords gate the k merges
    // run driver-side (zero Spark jobs) — merges AND final segmentations
    // must be byte-equal to the distributed per-merge job chain
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val local = Bpe.train(docs, 6) // gate passes: vocab ≪ 4M
    val dist = Bpe.train(docs, 6, driverMaxWords = 0L) // gate forced off
    assert(local.merges === dist.merges)
    val lw = local.words.select("word", "cnt", "seg").as[(String, Long, String)]
      .collect().sortBy(_._1)
    val dw = dist.words.select("word", "cnt", "seg").as[(String, Long, String)]
      .collect().sortBy(_._1)
    assert(lw === dw)
  }

  test("driver-side merge loop: vocabulary-scale k runs in bounded wall time") {
    // the 2-jobs-per-merge chain is gone: k=400 merges over the sf0.001
    // vocabulary must complete in seconds (it was ~2 jobs × k sequential
    // job launches before — minutes), proving the loop no longer pays a
    // per-merge scheduling floor
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val t0 = System.nanoTime()
    val m = Bpe.train(docs, 400)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(m.merges.nonEmpty)
    assert(sec < 60.0, f"k=400 train took $sec%.1f s — driver loop regressed")
  }

  test("training filters: over-cap and separator-bearing words are excluded") {
    val long = "a" * (Bpe.MaxWordLen + 1)
    val docs = Seq((1L, s"$long ab${S}cd ab ab")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc === Map("ab" -> 2L))
  }

  test("early exhaustion: k beyond available pairs stops at full merge") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(docs, k = 10)
    assert(model.merges === Seq(Bpe.Merge(1, "a", "b", 3L)))
    val segs = model.words.select("seg").as[String].collect()
    assert(segs === Array(S + "ab" + S))
  }

  test("vocab and encode: symbol inventory and token counts after merges") {
    val docs = Seq((1L, "low low newest"), (2L, "lower")).toDF("doc_id", "text")
    val model = Bpe.train(docs, k = 2) // (e,s)? counts: word cnts low×2? —
    // don't hand-pin merges here; assert structural invariants instead:
    // vocab total chars weighted = Σ cnt·len(word) regardless of merges
    val totalChars = Seq("low" -> 2, "newest" -> 1, "lower" -> 1)
      .map { case (w, c) => w.length * c }.sum
    val vocabWeighted = Bpe.vocab(model)
      .select(sum(length(col("symbol")) * col("cnt"))).as[Long].collect()(0)
    assert(vocabWeighted === totalChars.toLong)
    // encode: n_tokens per doc = Σ per word symbols; with k merges each
    // merge reduces a word's symbol count by ≥ 1 only where applied —
    // bound check + exact recompute from the model's segs
    val segByWord = model.words.select("word", "seg").as[(String, String)]
      .collect().toMap
    def toks(w: String) = segByWord(w).split(S, -1).count(_.nonEmpty)
    val enc = Bpe.encodeTokenCounts(docs, model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc(1L) === (2 * toks("low") + toks("newest")).toLong)
    assert(enc(2L) === toks("lower").toLong)
  }
}
