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
    val pool = Seq(
      "female" -> (graft.expr.Named("female"): graft.expr.ClassExpr),
      "male" -> (graft.expr.Named("male"): graft.expr.ClassExpr))
    val lps = Seq(("males", Lp(FamilyKb.males, FamilyKb.females), pool))
    def table = EvalTable.run(kb, lps, Seq("RandomNodeSampler"),
      fraction = 0.5, iterations = 2, seed = 11L)
    val rows = table.collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "RandomNodeSampler" && r.getString(1) === "males")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    assert(r.getDouble(3) >= 0.0)
    assert(r.getInt(6) === 2)
    // 'male' must win the fit and score perfectly on the ORIGINAL graph
    // (full-graph scoring — a trimmed/sampled score could differ)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(4) === 1.0)
    // same seed ⇒ identical table
    assert(table.collect().toSeq === rows.toSeq)
  }

  test("EvalTable with the native learner as the fit stage") {
    val kb = FamilyKb.kb(spark)
    val winners = scala.collection.mutable.Buffer.empty[String]
    val f = EvalTable.learnerFit()
    val recording: EvalTable.FitFn = (k, e) => { val w = f(k, e); winners += w._1; w }
    val lps = Seq(("males", Lp(FamilyKb.males, FamilyKb.females), Nil))
    val rows = EvalTable.run(kb, lps, Seq("RandomNodeSampler"),
      fraction = 0.5, iterations = 2, seed = 11L,
      fit = Some(recording)).collect()
    // the learner reaches `male` on every sampled graph (its sampled
    // retrieval is exactly the trimmed pos), and the winner scores
    // perfectly on the ORIGINAL graph
    assert(winners.toSeq === Seq("male", "male"))
    assert(rows.head.getDouble(2) === 1.0)
    assert(rows.head.getDouble(4) === 1.0)
  }

  test("EvalTable scores on the ORIGINAL graph, not the sampled one") {
    // evaluation_table_generator.py:170-185 reloads the original KB and the
    // FULL untrimmed LP before scoring. On the sampled graph removed
    // positives can never be false negatives, so a hypothesis that misses
    // them scores an inflated F1 there.
    val kb = FamilyKb.kb(spark)
    val lp = Lp(FamilyKb.males, FamilyKb.females)
    val sampled = new graft.sample.RandomNodeSampler(kb, seed = 5).sample(8)
    val trimmed = LpJson.restrictToSample(lp, sampled)
    // only run the contrast when sampling actually removed a positive
    assume(trimmed.pos.size < lp.pos.size && trimmed.pos.nonEmpty)
    val ce: graft.expr.ClassExpr = graft.expr.Named("male")
    val sampledScore = LearningProblem.evaluateConcept(sampled, ce, F1,
      LearningProblem.encode(sampled, trimmed))._2
    val originalScore = LearningProblem.evaluateConcept(kb, ce, F1,
      LearningProblem.encode(kb, lp))._2
    // 'male' retrieves every positive on BOTH graphs → both perfect...
    assert(sampledScore === 1.0 && originalScore === 1.0)
    // ...but a hypothesis retrieving only the SAMPLED males has recall < 1
    // on the original graph while staying perfect on the sampled graph
    val keptMales = trimmed.pos
    val partial: graft.expr.ClassExpr = graft.expr.OneOf(keptMales)
    val sPartial = LearningProblem.evaluateConcept(sampled, partial, F1,
      LearningProblem.encode(sampled, trimmed))._2
    val oPartial = LearningProblem.evaluateConcept(kb, partial, F1,
      LearningProblem.encode(kb, lp))._2
    assert(sPartial === 1.0)
    assert(oPartial < 1.0, s"original-graph F1 $oPartial should expose missing positives")
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
