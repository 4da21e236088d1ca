package graft.lp

import graft.SparkSpec

/** T1 get_top_n parity (reference search.py:620-638). */
class HypothesesSpec extends SparkSpec {

  test("get_top_n by quality/heuristic/length, deterministic tiebreak, bad key raises") {
    import spark.implicits._
    val df = Seq(
      ("A", 0.9, 0.1, 3L), ("B", 0.9, 0.5, 2L),
      ("C", 0.5, 0.9, 7L), ("D", 0.1, 0.2, 1L))
      .toDF("concept", "quality", "heuristic", "len")
    // quality ties (A, B at 0.9) break on concept
    assert(Hypotheses.topN(df, 2).collect().map(_.getString(0)).toSeq === Seq("A", "B"))
    assert(Hypotheses.topN(df, 1, "heuristic").collect().head.getString(0) === "C")
    assert(Hypotheses.topN(df, 2, "length").collect().map(_.getString(0)).toSeq === Seq("C", "A"))
    intercept[IllegalArgumentException](Hypotheses.topN(df, 1, "bogus"))
  }
}
