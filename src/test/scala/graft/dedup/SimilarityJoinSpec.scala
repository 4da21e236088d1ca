package graft.dedup

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  /** driver brute force: every pair's exact Jaccard from the same
    * shingle sets, thresholded with the same integer inequality */
  private def brute(corpus: DataFrame, tauMicros: Long): Set[(Long, Long)] = {
    val sets = TextOps.shingleArrays(corpus).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size.toLong
      if i * 1000000L >= tauMicros * (sets(a).size + sets(b).size - i)
    } yield (a, b)).toSet
  }

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox jumps over the lazy cat"),
    (4L, "a completely different sentence with nothing shared"),
    (5L, "the quick brown fox leaps over the lazy dog"),
    (6L, "lorem ipsum dolor sit amet consectetur adipiscing"),
    (7L, "lorem ipsum dolor sit amet consectetur elit")
  ).toDF("doc_id", "text")

  test("exact parity with brute force at several thresholds") {
    for (tau <- Seq(900000L, 800000L, 500000L, 300000L)) {
      val got = Dedup.similarityJoin(corpus, tau).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute(corpus, tau), s"tau=$tau")
    }
  }

  test("recall 1 where LSH banding is probabilistic: random near-pairs") {
    val rnd = new scala.util.Random(31)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = (0L until 40L).map { i =>
      val base = Seq.fill(12)(words(rnd.nextInt(words.size)))
      (i, base.mkString(" "))
    }.toDF("doc_id", "text")
    val tau = 500000L
    val got = Dedup.similarityJoin(docs, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute(docs, tau))
  }

  test("verify columns are the exact integers; partitioning invariance") {
    val rows = Dedup.similarityJoin(corpus, 800000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // docs 1 and 2 are byte-identical: inter = na = nb
    val dup = rows.find(t => t._1 == 1L && t._2 == 2L).get
    assert(dup._3 === dup._4 && dup._4 === dup._5)
    val p1 = Dedup.similarityJoin(corpus.repartition(1), 800000L).collect().toSet
    val p7 = Dedup.similarityJoin(corpus.repartition(7), 800000L).collect().toSet
    assert(p1 === p7)
  }
}
