package graft.sample

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ranking-eval units: hand-computed ranks under the frequency baseline,
  * truncating reciprocal-rank arithmetic, tie determinism, and Hits@k. */
class KgeEvalSpec extends SparkSpec {
  import spark.implicits._

  test("metrics: hand-computed ranks, integer rr, hits") {
    // q1: positive scores 10, cands 12 and 7 -> rank 2 (rr 500000)
    // q2: positive scores 5, cands 9, 8, 6 -> rank 4 (rr 250000)
    // q3: positive alone -> rank 1 (rr 1000000)
    val scored = Seq(
      ("a", "p", "b", "a", "b", 1, 10L), ("a", "p", "b", "x", "b", 0, 12L),
      ("a", "p", "b", "y", "b", 0, 7L),
      ("c", "p", "d", "c", "d", 1, 5L), ("c", "p", "d", "x", "d", 0, 9L),
      ("c", "p", "d", "y", "d", 0, 8L), ("c", "p", "d", "z", "d", 0, 6L),
      ("e", "p", "f", "e", "f", 1, 3L)
    ).toDF("src", "pred", "dst", "cand_src", "cand_dst", "is_pos", "score")
    val m = KgeEval.metrics(scored, hitsAt = Seq(1, 3)).collect().head
    assert(m.getAs[Long]("n_queries") == 3L)
    assert(m.getAs[Long]("rank_sum") == 2L + 4L + 1L)
    assert(m.getAs[Long]("rr_sum_micros") == 500000L + 250000L + 1000000L)
    assert(m.getAs[Long]("hits1") == 1L)
    assert(m.getAs[Long]("hits3") == 2L)
  }

  test("ties rank the positive by candidate-id order, deterministically") {
    // positive (m,m) ties score 5 with corruption (a,m): 'a' < 'm' -> rank 2
    val scored = Seq(
      ("m", "p", "m2", "m", "m2", 1, 5L), ("m", "p", "m2", "a", "m2", 0, 5L)
    ).toDF("src", "pred", "dst", "cand_src", "cand_dst", "is_pos", "score")
    val m = KgeEval.metrics(scored).collect().head
    assert(m.getAs[Long]("rank_sum") == 2L)
  }

  test("freqScored: positives get their own (s,p)/(p,o) counts, unknowns 0") {
    val edges = Seq(("a", "p", "b"), ("a", "p", "c"), ("x", "p", "b"))
      .toDF("src", "pred", "dst")
    val negs = Seq(("a", "p", "b", "zz", "b"), ("a", "p", "b", "a", "qq"))
      .toDF("src", "pred", "dst", "neg_src", "neg_dst")
    val sc = KgeEval.freqScored(edges, negs).collect()
      .map(r => (r.getAs[String]("cand_src"), r.getAs[String]("cand_dst"),
        r.getAs[Int]("is_pos"), r.getAs[Long]("score"))).toSet
    // positive (a,b): n_sp(a,p)=2 + n_po(p,b)=2 = 4
    assert(sc.contains(("a", "b", 1, 4L)))
    // corrupted head zz: 0 + 2; corrupted tail qq: 2 + 0
    assert(sc.contains(("zz", "b", 0, 2L)))
    assert(sc.contains(("a", "qq", 0, 2L)))
    // duplicate positives dedup: 3 positives + 2 negatives
    assert(sc.count(_._3 == 1) == 3)
  }

  test("rankingEval is invariant under edge partitioning") {
    val kb = graft.sources.TpchKg.load(spark, "/root/testdata/sf0.001")
    val a = KgeEval.rankingEval(kb, k = 2).collect().head.toSeq
    val kb2 = kb.copy(nodes = kb.nodes.repartition(7),
      edges = kb.edges.repartition(5))
    val b = KgeEval.rankingEval(kb2, k = 2).collect().head.toSeq
    assert(a == b)
  }
}
