package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM quality scoring: model counts and smoothed cross-entropy
  * against hand-computed Laplace probabilities, miss-branch semantics
  * (unseen bigram under a seen context vs unseen context), short-doc
  * convention, and partitioning determinism. */
class LmSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private lazy val ref = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
  // ref bigrams: "a b" ×1, "b a" ×2 → ctx a=1, b=2; V = |{a,b}| + 1 = 3
  private lazy val model = Lm.trainBigram(ref)

  test("trainBigram: counts, context totals, vocabulary size") {
    val rows = model.collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows === Map(
      ("a", "b") -> ((1L, 1L, 3L)),
      ("b", "a") -> ((2L, 2L, 3L))))
  }

  test("crossEntropy: hand-computed Laplace probabilities per miss branch") {
    val docs = Seq(
      (10L, "a b c"), // P(b|a)=(1+1)/(1+3)=1/2; P(c|b)=(0+1)/(2+3)=1/5 (seen ctx, unseen bigram)
      (11L, "z z z"), // unseen context: uniform 1/V = 1/3 per bigram
      (12L, "b a"),   // fully in-model: P(a|b)=(2+1)/(2+3)=3/5
      (13L, "a")      // too short for a bigram: n=0, xent=0.0 by convention
    ).toDF("doc_id", "text")
    val out = Lm.crossEntropy(docs, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out(10L) === ((2L, r4(-(math.log(0.5) + math.log(0.2)) / 2))))
    assert(out(11L) === ((2L, r4(math.log(3.0)))))
    assert(out(12L) === ((1L, r4(-math.log(0.6)))))
    assert(out(13L) === ((0L, 0.0)))
    assert(out.size === 4)
  }

  test("crossEntropy: deterministic across partitionings") {
    val docs = (0L until 40L).map(i => (i, s"a b w$i a b a")).toDF("doc_id", "text")
    val a = Lm.crossEntropy(docs, model).collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val b = Lm.crossEntropy(docs.repartition(7), Lm.trainBigram(ref.repartition(3)))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(a === b)
  }

  test("crossEntropy separates in-model text from out-of-model noise") {
    val docs = Seq((1L, "a b a b a"), (2L, "q w e r t")).toDF("doc_id", "text")
    val out = Lm.crossEntropy(docs, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(2L)) // the CCNet routing property
  }
}
