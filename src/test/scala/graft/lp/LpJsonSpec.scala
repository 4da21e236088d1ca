package graft.lp

import graft.SparkSpec
import graft.fixtures.FamilyKb

/** LP JSON loading (the reference's examples/learning_problems format) and
  * the eval harness's sample-trim semantics. */
class LpJsonSpec extends SparkSpec {

  test("loads the reference's family_lp.json (fragments, counts, order)") {
    val (dataPath, lps) = LpJson.load(
      "/root/reference/examples/learning_problems/family_lp.json")
    assert(dataPath.endsWith(".owl"))
    assert(lps.nonEmpty)
    val (name, lp) = lps.head
    assert(name.nonEmpty)
    assert(lp.pos.nonEmpty && lp.neg.nonEmpty)
    // fragments, not full IRIs
    assert(lp.pos.forall(!_.contains("#")) && lp.pos.forall(!_.startsWith("http")))
  }

  test("EvalTable: reference experiment shape, deterministic per seed") {
    val kb = FamilyKb.kb(spark)
    val lps = Seq(("males", Lp(FamilyKb.males, FamilyKb.females),
      graft.expr.Named("male"): graft.expr.ClassExpr))
    def table = EvalTable.run(kb, lps, Seq("RandomNodeSampler"),
      fraction = 0.5, iterations = 2, seed = 11L)
    val rows = table.collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "RandomNodeSampler" && r.getString(1) === "males")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    assert(r.getDouble(3) >= 0.0)
    assert(r.getInt(4) === 2)
    // same seed ⇒ identical table
    assert(table.collect().toSeq === rows.toSeq)
  }

  test("restrictToSample drops removed examples; empty-pos falls back to half") {
    val kb = FamilyKb.kb(spark)
    val sampled = new graft.sample.RandomNodeSampler(kb, seed = 5).sample(8)
    val kept = ids(sampled.nodes)
    val lp = Lp(pos = FamilyKb.males, neg = FamilyKb.females)
    val trimmed = LpJson.restrictToSample(lp, sampled)
    assert(trimmed.pos.toSet === FamilyKb.males.filter(kept).toSet)
    assert(trimmed.neg.toSet === FamilyKb.females.filter(kept).toSet)
    // no positive survives → half of the sampled individuals, no negatives
    val lpGone = Lp(pos = Seq("zz1", "zz2"), neg = FamilyKb.females)
    val fb = LpJson.restrictToSample(lpGone, sampled)
    assert(fb.pos.size === 4 && fb.neg.isEmpty)
    assert(fb.pos.forall(kept))
    // the trimmed LP encodes and scores end-to-end
    val elp = LearningProblem.encode(sampled, trimmed)
    val (_, score) = LearningProblem.evaluateConcept(sampled,
      graft.expr.Named("male"), F1, elp)
    assert(score >= 0.0 && score <= 1.0)
  }
}
