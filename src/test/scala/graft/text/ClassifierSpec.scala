package graft.text

import graft.SparkSpec

/** Hand-computed fixture for the NB evidence voter: cross-multiplied
  * integer vote signs (np=2 positives, nn=1 negative, so a gram seen once
  * in each class leans NEGATIVE: 1·1 < 1·2), the tie-vote case
  * (cp·nn = cn·np), unseen grams, gramless docs, and the score-0 tie
  * rule. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // train: docs 1,3 positive, doc 2 negative → np=2, nn=1
  private lazy val train = Seq(
    (1L, "a b c e f"), (2L, "a b d e f"), (3L, "c d e f")
  ).toDF("doc_id", "text")
  private lazy val labels = Seq(
    (1L, true), (2L, false), (3L, true)
  ).toDF("doc_id", "pos")

  // expected votes: "a b" cp1·nn1 < cn1·np2 → −1 ; "b c"/"c e"/"c d" pos-only
  // → +1 ; "b d" neg-only → −1 ; "d e" cp1 < cn1·2 → −1 ; "e f" cp2·1 = cn1·2
  // → 0 (tie)
  private val expectedVotes = Map(
    "a b" -> -1L, "b c" -> 1L, "c e" -> 1L, "e f" -> 0L,
    "b d" -> -1L, "d e" -> -1L, "c d" -> 1L)

  test("trainVotes: cross-multiplied sign per gram, including the tie vote") {
    val model = Classifier.trainVotes(train, labels).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(model === expectedVotes)
  }

  test("score: vote sums, unseen grams mute, gramless docs and ties predict negative") {
    val model = Classifier.trainVotes(train, labels)
    val toScore = Seq(
      (10L, "a b c"),   // −1 + 1 = 0 → tie rule: negative
      (11L, "c e f"),   // +1 + 0 = 1 → positive
      (12L, "zz"),      // no grams → 0, negative
      (13L, "c e x y")  // +1, "e x"/"x y" unseen → 1 → positive
    ).toDF("doc_id", "text")
    val out = Classifier.score(toScore, model).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out === Map(
      10L -> ((0L, false)), 11L -> ((1L, true)),
      12L -> ((0L, false)), 13L -> ((1L, true))))
  }

  test("self-consistency on the real corpus: training-set accuracy beats the base rate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val labels = docs.selectExpr("doc_id", "lang = 'en' AS pos")
    val scored = Classifier.score(docs, Classifier.trainVotes(docs, labels))
    val joined = scored.join(labels, "doc_id")
    val n = joined.count().toDouble
    val acc = joined.filter("predicted = pos").count() / n
    val baseRate = math.max(
      labels.filter("pos").count() / n, labels.filter("NOT pos").count() / n)
    assert(acc > baseRate, s"accuracy $acc must beat majority-class $baseRate")
    // the synthetic corpus shares most vocabulary across languages (shared
    // grams tie or lean with class imbalance), so the voter's edge is real
    // but bounded: deterministic 0.79 at sf0.001
    assert(acc > 0.75, s"expected the deterministic 0.79-accuracy band, got $acc")
  }
}
