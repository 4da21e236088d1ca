package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("wordGraph: adjacent pairs, canonical order, counts, self-pairs dropped") {
    val docs = Seq((1L, "a b a b b"), (2L, "b a the the")).toDF("doc_id", "text")
    val g = TextRank.wordGraph(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // doc1: (a,b)(b,a)(a,b)(b,b drop? "b b" adjacent = self pair → drop)
    // doc1 pairs: a-b, b-a, a-b, b-b(drop) → 3; doc2: b-a, a-the, the-the(drop)
    assert(g === Set(("a", "b", 4L), ("a", "the", 1L)))
  }

  test("keywords: hub word outranks leaf words; parity with naive reference") {
    // star corpus: "hub x1", "hub x2", ... hub co-occurs with every leaf
    val docs = (1 to 6).map(i => (i.toLong, s"hub x$i")).toDF("doc_id", "text")
    val pr = TextRank.keywords(docs, iterations = 40).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr.size === 7)
    (1 to 6).foreach(i => assert(pr("hub") > pr(s"x$i")))
    // naive Jacobi reference on the star (the engine's convention per
    // PageRankSpec: start 1.0, pr' = d/n + (1−d)·in-mass): the hub
    // gathers each leaf's whole rank, a leaf gets 1/6 of the hub's
    val d = 0.15
    var rh = 1.0; var rx = 1.0
    for (_ <- 1 to 40) {
      val nrh = d / 7 + (1 - d) * 6 * rx
      val nrx = d / 7 + (1 - d) * rh / 6
      rh = nrh; rx = nrx
    }
    assert(math.abs(pr("hub") - rh) < 1e-9, s"${pr("hub")} vs $rh")
    assert(math.abs(pr("x1") - rx) < 1e-9, s"${pr("x1")} vs $rx")
  }

  test("wordGraph: partitioning invariance") {
    val docs = (1L to 40L).map(i => (i, s"w${i % 5} w${i % 7} w${i % 5}"))
      .toDF("doc_id", "text")
    val a = TextRank.wordGraph(docs.repartition(1)).collect().toSet
    val b = TextRank.wordGraph(docs.repartition(7)).collect().toSet
    assert(a === b)
  }
}
