package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Encoders

/** RDFS materialization: driver-side ⊑ closure, each rule (rdfs2/3/7/9/11)
  * hand-traced on a literal KB, idempotence, and the empty-TBox
  * short-circuit. */
class EntailmentSpec extends SparkSpec {

  test("closure: chain, diamond, empty") {
    assert(Entailment.closure(Nil) === Nil)
    assert(Entailment.closure(Seq("A" -> "B", "B" -> "C", "C" -> "D")).toSet ===
      Set("A" -> "B", "A" -> "C", "A" -> "D", "B" -> "C", "B" -> "D", "C" -> "D"))
    // diamond: two paths to the same ancestor collapse (it's a set)
    assert(Entailment.closure(Seq("A" -> "B", "A" -> "C", "B" -> "D", "C" -> "D")).toSet ===
      Set("A" -> "B", "A" -> "C", "A" -> "D", "B" -> "D", "C" -> "D"))
  }

  /** n1 -p→ n2 with p ⊑ q, domain(q)=B, range(q)=D; n3 has data prop d with
    * d ⊑ e, domain(e)=A; n4 asserted A; hierarchy A ⊑ B ⊑ C. */
  private def fixture: Kb = {
    val s = spark
    Kb(
      nodes = s.createDataset(Seq("n1", "n2", "n3", "n4"))(Encoders.STRING).toDF("id"),
      edges = s.createDataset(Seq(Edge("n1", "p", "n2")))(Encoders.product[Edge]).toDF(),
      attrs = s.createDataset(Seq(Attr("n3", "d", "5", "xsd:int")))(
        Encoders.product[Attr]).toDF(),
      types = s.createDataset(Seq(TypeAssertion("n4", "A")))(
        Encoders.product[TypeAssertion]).toDF(),
      tbox = Tbox(
        classes = Seq("A", "B", "C", "D"),
        subClass = Seq("A" -> "B", "B" -> "C"),
        subProp = Seq("p" -> "q", "d" -> "e"),
        props = Seq(
          PropMeta("p", "object", "", ""),
          PropMeta("q", "object", "B", "D"),
          PropMeta("d", "data", "", "xsd:int"),
          PropMeta("e", "data", "A", "xsd:int"))))
  }

  private def typeSet(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("every rule fires: subProp → domain/range → subClass, hand-traced") {
    val got = typeSet(Entailment.entailedTypes(fixture))
    assert(got === Set(
      "n4" -> "A", "n4" -> "B", "n4" -> "C", // asserted + rdfs9/11 chain
      "n1" -> "B", "n1" -> "C",              // p ⊑ q (rdfs7) + domain(q) + B ⊑ C
      "n2" -> "D",                           // p ⊑ q + range(q); D has no parent
      "n3" -> "A", "n3" -> "B", "n3" -> "C")) // d ⊑ e + domain(e) + A ⊑ B ⊑ C
  }

  test("idempotent: entailing the entailed KB adds nothing") {
    val kb = fixture
    val once = Entailment.entailedTypes(kb)
    val twice = Entailment.entailedTypes(kb.copy(types = once))
    assert(typeSet(twice) === typeSet(once))
  }

  test("empty TBox relations short-circuit to the asserted types") {
    val kb = fixture
    val bare = kb.copy(tbox = Tbox(classes = Seq("A"), subClass = Nil,
      props = Seq(PropMeta("p", "object", "", ""))))
    assert(typeSet(Entailment.entailedTypes(bare)) === Set("n4" -> "A"))
  }

  test("entailedEdges: symmetric → inverse → subProp strata, each hand-traced") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "near", "b"), ("b", "owns", "c"), ("d", "ownedBy", "e"))
      .toDF("src", "pred", "dst")
    val got = Entailment.entailedEdges(edges,
      subPropertyOf = Seq(("owns", "controls")),
      inverseOf = Seq(("owns", "ownedBy")),
      symmetric = Seq("near"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("a", "near", "b"), ("b", "near", "a"),            // prp-symp
      ("b", "owns", "c"), ("c", "ownedBy", "b"),         // prp-inv1
      ("d", "ownedBy", "e"), ("e", "owns", "d"),         // prp-inv2
      ("b", "controls", "c"), ("e", "controls", "d")))   // prp-spo1, incl. on inverse-derived
    // idempotent at the fixpoint; set semantics dedupe re-derivations
    assert(Entailment.entailedEdges(got.toSeq.toDF("src", "pred", "dst"),
      Seq(("owns", "controls")), Seq(("owns", "ownedBy")), Seq("near"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet === got)
  }

  test("entailedEdges: schemas needing iteration are rejected up front") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "p", "b")).toDF("src", "pred", "dst")
    // symmetric superproperty: p ⊑ q with q symmetric
    intercept[IllegalArgumentException](Entailment.entailedEdges(edges,
      subPropertyOf = Seq(("p", "q")), symmetric = Seq("q")))
    // inverse of a superproperty
    intercept[IllegalArgumentException](Entailment.entailedEdges(edges,
      subPropertyOf = Seq(("p", "q")), inverseOf = Seq(("q", "r"))))
    // chained inverse pairs sharing a predicate
    intercept[IllegalArgumentException](Entailment.entailedEdges(edges,
      inverseOf = Seq(("p", "q"), ("q", "r"))))
    // symmetric pred inside an inverse axiom
    intercept[IllegalArgumentException](Entailment.entailedEdges(edges,
      inverseOf = Seq(("p", "q")), symmetric = Seq("p")))
  }
}
