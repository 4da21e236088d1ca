package graft.pipeline

import graft.SparkSpec

/** Evidence-join instance alignment: RA weighting, the shared-fact
  * threshold, the popular-fact cap, and deterministic per-a ranking. */
class AlignSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // a1 ≡ b1 (two rare shared facts), a2 shares only the popular fact
  private lazy val t1 = Seq(
    ("a1", "bornIn", "cityX"), ("a1", "worksFor", "orgY"), ("a1", "type", "person"),
    ("a2", "type", "person"),
    ("a3", "bornIn", "cityZ"))
    .toDF("subj", "pred", "obj")
  private lazy val t2 = Seq(
    ("b1", "bornIn", "cityX"), ("b1", "worksFor", "orgY"), ("b1", "type", "person"),
    ("b2", "type", "person"), ("b2", "bornIn", "cityX"))
    .toDF("subj", "pred", "obj")

  private def rows(minShared: Long = 2L, cap: Long = 1L << 20, topK: Int = 3) =
    Align.alignByEvidence(t1, t2, minShared, cap, topK).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet

  test("RA weights and shared-count threshold hand-traced") {
    // fact subject counts: (bornIn,cityX): c1=1,c2=2 → w=333333;
    // (worksFor,orgY): 1+1 → 500000; (type,person): 2+2 → 250000
    assert(rows() === Set(
      ("a1", "b1", 3L, 333333L + 500000L + 250000L, 1),
      ("a1", "b2", 2L, 333333L + 250000L, 2)))
    // a2/a3: at most one shared fact → below minShared
  }

  test("popular-fact cap drops the type fact; pairs below threshold vanish") {
    // cap 3 < c1·c2 = 4 for (type,person); (bornIn,cityX) at 1·2 passes —
    // only (a1,b1) keeps two facts; (a1,b2) drops to one and vanishes
    assert(rows(cap = 3L) === Set(("a1", "b1", 2L, 833333L, 1)))
  }

  test("topK cuts per-a candidates deterministically") {
    assert(rows(topK = 1).map(t => (t._1, t._2)) === Set(("a1", "b1")))
  }
}
