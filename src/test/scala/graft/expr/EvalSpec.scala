package graft.expr

import graft.SparkSpec
import graft.fixtures.FamilyKb
import graft.lp._

class EvalSpec extends SparkSpec {
  lazy val kb = FamilyKb.kb(spark).cache()

  test("named class with subclass closure") {
    assert(ids(Eval(kb, Named("person"))) === FamilyKb.all.toSet)
    assert(ids(Eval(kb, Named("male"))) === FamilyKb.males.toSet)
  }

  test("top and bottom") {
    assert(ids(Eval(kb, Top)) === FamilyKb.all.toSet)
    assert(Eval(kb, Bottom).count() === 0)
  }

  test("and / or / not") {
    assert(ids(Eval(kb, And(Seq(Named("male"), Exists("hasChild", Top))))) ===
      Set("m1", "m2", "m3", "m5"))
    assert(ids(Eval(kb, Or(Seq(Named("male"), Named("female"))))) ===
      (FamilyKb.males ++ FamilyKb.females).toSet)
    assert(Eval(kb, Not(Named("person"))).count() === 0)
    assert(ids(Eval(kb, Not(Named("male")))) ===
      (FamilyKb.females ++ FamilyKb.others).toSet)
  }

  test("exists and hasValue") {
    assert(ids(Eval(kb, Exists("hasChild", Named("female")))) ===
      Set("m1", "f1", "f2", "m3", "f5"))
    assert(ids(Eval(kb, HasValue("hasChild", "m2"))) === Set("m1", "f1"))
  }

  test("forall (OWA: no edge ⇒ member)") {
    assert(ids(Eval(kb, ForAll("hasChild", Named("male")))) ===
      Set("m2", "m4", "m5", "m6", "f3", "f4", "f6", "x1", "x2", "x3", "x4"))
  }

  test("cardinalities") {
    assert(ids(Eval(kb, MinCard(2, "hasChild", Top))) === Set("m1", "f1", "m3"))
    assert(ids(Eval(kb, MaxCard(0, "hasChild", Top))) ===
      Set("m4", "m6", "f4", "f6", "x1", "x2", "x3", "x4"))
    assert(ids(Eval(kb, ExactCard(1, "hasChild", Top))) ===
      Set("m2", "f2", "f3", "m5", "f5"))
  }

  test("data restrictions") {
    assert(ids(Eval(kb, DataCompare("age", ">=", 34.0))) === Set("m1", "f1", "m2", "f2"))
    assert(ids(Eval(kb, DataHasValue("nickname", "gramps"))) === Set("m1"))
  }

  test("metrics formula parity (reference metrics.py)") {
    assert(F1.score2(3, 1, 2, 4) === ((true, 0.66667)))
    assert(Accuracy.score2(3, 1, 2, 4) === ((true, 0.7)))
    assert(Precision.score2(3, 1, 2, 4) === ((true, 0.6)))
    assert(Recall.score2(3, 1, 2, 4) === ((true, 0.75)))
    assert(WeightedAccuracy.score2(3, 1, 2, 4) === ((true, 0.70833)))
    assert(F1.score2(0, 1, 2, 4) === ((false, 0.0)))
    assert(Recall.score2(0, 0, 2, 4) === ((false, 0.0)))
  }

  test("learning problem encode + confusion") {
    val elp = LearningProblem.encode(kb, Lp(Seq("m1", "m2"), Seq("f1", "f2")))
    assert(elp.kbDiff.count() === FamilyKb.all.size - 4)
    val retrieved = Eval(kb, Named("male"))
    val (tp, fn, fp, tn) = LearningProblem.confusion(retrieved, elp)
    assert((tp, fn, fp, tn) === ((2L, 0L, 0L, 2L)))
  }

  test("negative sampling when neg empty: |neg| = |pos|, deterministic") {
    val elp = LearningProblem.encode(kb, Lp(Seq("m1", "m2", "m3"), Nil), seed = 7L)
    val neg1 = ids(elp.kbNeg)
    assert(neg1.size === 3)
    val neg2 = ids(LearningProblem.encode(kb, Lp(Seq("m1", "m2", "m3"), Nil), seed = 7L).kbNeg)
    assert(neg1 === neg2)
  }

  test("cached eval returns identical results and reuses the plan (F4)") {
    val cached = new Eval.Cached(kb, maxSize = 4)
    val ce = And(Seq(Named("male"), Exists("hasChild", Top)))
    val first = cached(ce)
    val second = cached(ce)
    assert(first eq second) // same cached DataFrame instance
    assert(ids(first) === ids(Eval(kb, ce)))
  }

  test("ignoring removes classes/properties everywhere (F10)") {
    val view = kb.ignoring(ignoredClasses = Set("female"), ignoredProps = Set("age"))
    assert(view.types.filter(org.apache.spark.sql.functions.col("cls") === "female").count() === 0)
    assert(view.attrs.filter(org.apache.spark.sql.functions.col("prop") === "age").count() === 0)
    assert(!view.tbox.classes.contains("female"))
    assert(!view.tbox.dataProps.map(_.prop).contains("age"))
    // nodes untouched; male side intact
    assert(ids(view.nodes) === FamilyKb.all.toSet)
    assert(ids(Eval(view, Named("male"))) === FamilyKb.males.toSet)
  }

  test("restrictedTo drops dangling assertions on both endpoints") {
    val keep = spark.createDataset(Seq("m1", "f1", "m2"))(
      org.apache.spark.sql.Encoders.STRING).toDF("id")
    val sub = kb.restrictedTo(keep)
    assert(sub.nodes.count() === 3)
    assert(sub.edges.collect().map(r => (r.getString(1), r.getString(0), r.getString(2))).toSet ===
      Set(("hasChild", "m1", "m2"), ("hasChild", "f1", "m2")))
    assert(sub.attrs.count() === 4) // m1 age+nickname, f1 age, m2 age
  }
}
