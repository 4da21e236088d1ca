package graft.lp

import graft.SparkSpec
import graft.expr._
import graft.fixtures.FamilyKb

/** Refinement operator ρ + best-first Learner.fit on the family fixture. */
class LearnerSpec extends SparkSpec {

  private val rho = new Refine(FamilyKb.tbox)

  test("rho(⊤) = hierarchy roots + most-general existential restrictions") {
    assert(rho(Top) === Seq(
      Named("person"), Exists("hasChild", Top), Exists("married", Top)))
  }

  test("rho(named) descends the hierarchy and conjoins atomics") {
    val refs = rho(Named("person"))
    assert(refs.contains(Named("female")) && refs.contains(Named("male")))
    assert(refs.contains(And(Seq(Named("person"), Exists("hasChild", Top)))))
  }

  test("conjunctions canonicalize: permutations collapse, nesting flattens") {
    val a = And(Seq(Named("male"), Exists("hasChild", Top)))
    val b = And(Seq(Exists("hasChild", Top), Named("male")))
    assert(rho(a) === rho(b))
    // refining a conjunct keeps the ⊓ flat (no nested And)
    assert(rho(a).collect { case And(cs) => cs }.forall(
      _.forall { case And(_) => false; case _ => true }))
  }

  test("rho respects the length cap") {
    val tight = new Refine(FamilyKb.tbox, maxLen = 1)
    assert(tight(Top) === Seq(Named("person"))) // ∃r.⊤ has length 3
  }

  test("fit finds the goal concept through hierarchy descent") {
    val kb = FamilyKb.kb(spark)
    val elp = LearningProblem.encode(kb, Lp(FamilyKb.males, FamilyKb.females))
    val fit = Learner.fit(kb, elp)
    // iter 1 expands ⊤ (best is `person`, F1 = 2/3); iter 2 expands person
    // → direct subclass `male` is the goal
    assert(fit.goalFound)
    assert(fit.iterations === 2)
    assert(fit.best.head.render === "male")
    assert(fit.best.head.quality === 1.0)
    // determinism: a second run returns the identical hypothesis list
    val again = Learner.fit(kb, elp)
    assert(again.best.map(_.render) === fit.best.map(_.render))
    assert(again.explored === fit.explored)
  }

  test("fit stops at maxIterations when no goal is reachable") {
    val kb = FamilyKb.kb(spark)
    // pos mixes genders → no concept in the dialect reaches F1 = 1
    val elp = LearningProblem.encode(kb,
      Lp(Seq("m1", "f1", "m2"), Seq("f3", "m5")))
    val fit = Learner.fit(kb, elp, maxIterations = 3)
    assert(!fit.goalFound)
    assert(fit.iterations === 3)
    assert(fit.best.nonEmpty && fit.best.head.quality < 1.0)
  }

  test("frontier exhaustion reports the TRUE expansion count, not the budget") {
    val kb = FamilyKb.kb(spark)
    // pos is an ungendered person: male/female are weak (never registered),
    // so with maxLen = 1 the tree exhausts after expanding ⊤ and person
    val elp = LearningProblem.encode(kb, Lp(Seq("x1"), Seq("m1")))
    val fit = Learner.fit(kb, elp, maxIterations = 20, maxLen = 1)
    assert(!fit.goalFound)
    assert(fit.iterations === 2)
    assert(fit.iterations < 20)
  }

  test("fit reaches a data-restriction goal by walking the split ladder") {
    val kb = FamilyKb.kb(spark)
    // pos = everyone aged ≥ 34, neg = the two teenagers. ∃age.(>= 14.0)
    // and person both score F1 = 0.8; the ladder's next rung
    // ∃age.(>= 34.0) retrieves exactly pos.
    val elp = LearningProblem.encode(kb,
      Lp(Seq("m1", "f1", "m2", "f2"), Seq("m3", "f3")))
    val cfg = RefineConfig(dataSplits = Map("age" -> Seq(14.0, 34.0)))
    val fit = Learner.fit(kb, elp, config = cfg)
    // iter 1: ⊤ → atoms; iter 2 expands `person` ('p' < '∃' tiebreak at
    // 0.8), registering (person ⊓ ∃age.(>= 14.0)); iter 3 expands that
    // conjunction ('(' sorts first) and its ∃age rung-up conjunct
    // refinement is the goal
    assert(fit.goalFound)
    assert(fit.iterations === 3)
    assert(fit.best.head.render === "(person ⊓ ∃age.(>= 34.0))")
    assert(fit.best.head.quality === 1.0)
  }

  test("splitsFor: exact rank-based rungs, reproducible in plain SQL") {
    val kb = FamilyKb.kb(spark)
    // distinct ages ascending: 14, 15, 34, 35, 60, 61 (m = 6);
    // k = 3 → indices floor(6/3) = 2 and floor(12/3) = 4 → values 34, 60
    assert(Refine.splitsFor(kb, "age", 3) === Seq(34.0, 60.0))
    // k = 2 → index 3 → the upper median distinct value
    assert(Refine.splitsFor(kb, "age", 2) === Seq(35.0))
  }

  test("approxSplitsFor: rank drift vs the exact ladder within the sketch bound") {
    // the 100-TB ladder replaces k TakeOrdered jobs with one sketch pass;
    // its contract is BOUNDED RANK DRIFT, measured here on the real
    // acctbal distribution at fixture scale (sf0.001: agents with distinct
    // balances). rank(v) = #distinct values ≤ v; exact rung i sits at rank
    // i·m/k; the GK sketch guarantees ≤ m/accuracy drift per rung.
    val kb = graft.sources.TpchKg.load(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val distinctVals = kb.attrs.filter(col("prop") === "acctbal")
      .select(col("lexical").cast("double").as("v"))
      .filter(col("v").isNotNull).distinct()
      .collect().map(_.getDouble(0)).sorted
    val m = distinctVals.length
    def rank(v: Double): Int = distinctVals.count(_ <= v)
    val k = 8
    val accuracy = 100
    val approx = Refine.approxSplitsFor(kb, "acctbal", k, accuracy)
    assert(approx.nonEmpty && approx == approx.sorted && approx.distinct == approx)
    // every approx rung is a REAL data value (the sketch never interpolates)
    approx.foreach(v => assert(distinctVals.contains(v), s"rung $v not a data value"))
    val maxDrift = approx.zipWithIndex.map { case (v, j) =>
      // deduped output: align each rung to its nearest exact target rank
      (1 until k).map(i => math.abs(rank(v) - i * m / k)).min
    }.max
    val bound = m / accuracy + 1
    info(s"m=$m distinct values, max rank drift $maxDrift (bound $bound)")
    assert(maxDrift <= bound, s"rank drift $maxDrift exceeds sketch bound $bound")
    // at high accuracy only the rank CONVENTION differs (the sketch
    // targets ceil(p·m) where the exact ladder takes floor(i·m/k)+1 —
    // equal except when i·m/k is integral): per-rung rank drift ≤ 1
    val exactRanks = Refine.splitsFor(kb, "acctbal", 4).map(rank)
    val approxRanks = Refine.approxSplitsFor(kb, "acctbal", 4).map(rank)
    assert(exactRanks.size === approxRanks.size)
    exactRanks.zip(approxRanks).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 1, s"high-accuracy rung rank $a vs exact $e")
    }
  }

  test("both ladders return Nil for a property with no numeric values") {
    val kb = FamilyKb.kb(spark)
    // 'nickname' carries string lexicals — double-cast leaves zero rows
    // (the sketch aggregate returns NULL there, not an empty array)
    assert(Refine.splitsFor(kb, "nickname", 3) === Nil)
    assert(Refine.approxSplitsFor(kb, "nickname", 3) === Nil)
    assert(Refine.splitsFor(kb, "no_such_prop", 3) === Nil)
    assert(Refine.approxSplitsFor(kb, "no_such_prop", 3) === Nil)
  }
}
