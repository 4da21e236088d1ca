package graft.core

import graft.SparkSpec
import graft.expr._
import graft.fixtures.FamilyKb
import org.apache.spark.sql.Encoders

/** Hierarchy navigation, concept length and domain-filtered property
  * enumerators (reference knowledge_base.py:512-524, 626-655, 729-966). */
class HierarchySpec extends SparkSpec {

  private def fam = FamilyKb.kb(spark)

  test("hierarchy navigation: roots, leaves, direct subs/parents, proper subs") {
    val kb = fam
    // person is the only class without a named parent
    assert(kb.getMostGeneralClasses === Seq("person"))
    // leaves = classes with no subclass (reference: leaves())
    assert(kb.getLeastGeneralNamedConcepts === Seq("female", "male"))
    assert(kb.getLeafConcepts("person") === Seq("female", "male"))
    // a leaf is its own leaf (improper ⊑)
    assert(kb.getLeafConcepts("male") === Seq("male"))
    assert(kb.getDirectSubConcepts("person") === Seq("female", "male"))
    assert(kb.getDirectSubConcepts("male") === Nil)
    assert(kb.getDirectParents("male") === Seq("person"))
    assert(kb.getDirectParents("person") === Nil)
    // all PROPER subs exclude the class itself
    assert(kb.getAllSubConcepts("person") === Set("female", "male"))
    assert(kb.getAllSubConcepts("male") === Set.empty[String])
  }

  test("concept_len matches hand-counted owlapy default lengths") {
    assert(ClassExpr.length(Named("male")) === 1)
    assert(ClassExpr.length(Top) === 1)
    assert(ClassExpr.length(Not(Named("male"))) === 2)
    assert(ClassExpr.length(And(Seq(Named("male"), Named("person")))) === 3)
    assert(ClassExpr.length(Or(Seq(Named("male"), Named("person"), Top))) === 5)
    assert(ClassExpr.length(Exists("hasChild", Named("male"))) === 3)
    assert(ClassExpr.length(ForAll("hasChild", Top)) === 3)
    assert(ClassExpr.length(HasValue("hasChild", "m1")) === 3)
    assert(ClassExpr.length(MinCard(2, "hasChild", Named("male"))) === 4)
    assert(ClassExpr.length(ExistsInverse("hasChild", Top)) === 4)
    // ∃hasChild.(male ⊓ ∃hasChild.⊤): 2 + (1 + 3 + 1) = 7
    assert(ClassExpr.length(
      Exists("hasChild", And(Seq(Named("male"), Exists("hasChild", Top))))) === 7)
    assert(ClassExpr.length(DataCompare("age", ">", 30.0)) === 3)
    assert(ClassExpr.length(OneOf(Seq("m1", "m2"))) === 1)
  }

  test("inverse-role restrictions: ∃r⁻ and ∀r⁻ semantics") {
    val kb = fam
    // children of male parents
    val existsInv = ids(Eval(kb, ExistsInverse("hasChild", Named("male"))))
    assert(existsInv === Set("m2", "f2", "m3", "m4", "f4", "x1", "m6"))
    // every parent is male (nodes without parents pass vacuously)
    val forallInv = ids(Eval(kb, ForAllInverse("hasChild", Named("male"))))
    val violators = Set("m2", "f2", "f3", "m5", "f6") // have a non-male parent
    assert(forallInv === FamilyKb.all.toSet -- violators)
  }

  test("OneOf nominal and data-∀ with vacuous pass") {
    val kb = fam
    assert(ids(Eval(kb, OneOf(Seq("m1", "f1", "zz")))) === Set("m1", "f1"))
    // ∀age.(< 36): m1 (61) and f1 (60) violate; everyone without an age
    // assertion passes vacuously
    assert(ids(Eval(kb, DataForAll("age", "<", 36.0))) ===
      FamilyKb.all.toSet -- Set("m1", "f1"))
  }

  test("boolean / time typed compares consume the typed-cast columns") {
    val tb = Tbox(
      classes = Seq("thing"),
      subClass = Nil,
      props = Seq(
        PropMeta("flag", "data", "thing", "xsd:boolean"),
        PropMeta("seen", "data", "thing", "xsd:dateTime")))
    val kb = Kb(
      nodes = spark.createDataset(Seq("a", "b", "c"))(Encoders.STRING).toDF("id"),
      edges = Kb.empty(spark).edges,
      attrs = spark.createDataset(Seq(
        Attr("a", "flag", "true", "xsd:boolean"),
        Attr("b", "flag", "false", "xsd:boolean"),
        Attr("a", "seen", "2021-05-01 10:00:00", "xsd:dateTime"),
        Attr("c", "seen", "2023-01-01 00:00:00", "xsd:dateTime")))(
        Encoders.product[Attr]).toDF(),
      types = Kb.empty(spark).types,
      tbox = tb)
    assert(ids(Eval(kb, DataBoolHasValue("flag", value = true))) === Set("a"))
    assert(ids(Eval(kb, DataBoolHasValue("flag", value = false))) === Set("b"))
    assert(ids(Eval(kb, DataTimeCompare("seen", "<", "2022-01-01"))) === Set("a"))
    assert(ids(Eval(kb, DataTimeCompare("seen", ">=", "2021-05-01 10:00:00"))) === Set("a", "c"))
  }

  test("domain-filtered property enumerators mirror the reference semantics") {
    val kb = fam
    // hasChild/married domains are person ⊇ male
    assert(kb.mostGeneralObjectProperties(Named("male")) === Seq("hasChild", "married"))
    assert(kb.mostGeneralObjectProperties(Top) === Seq("hasChild", "married"))
    // inverse → check RANGES (also person here)
    assert(kb.mostGeneralObjectProperties(Named("female"), inverse = true)
      === Seq("hasChild", "married"))
    assert(kb.mostGeneralDataProperties(Named("male")) === Seq("age", "nickname"))
    assert(kb.mostGeneralBooleanDataProperties(Named("male")) === Nil)
    // restriction generators wrap the qualifying roles
    assert(kb.mostGeneralExistentialRestrictions(Named("male"))
      === Seq(Exists("hasChild", Top), Exists("married", Top)))
    assert(kb.mostGeneralUniversalRestrictionsInverse(Named("male"))
      === Seq(ForAllInverse("hasChild", Top), ForAllInverse("married", Top)))
    // a domain NOT covered: restrict hasChild's domain to male only
    val narrowTbox = kb.tbox.copy(props = kb.tbox.props.map(p =>
      if (p.prop == "hasChild") p.copy(domain = "male") else p))
    val kb2 = kb.copy(tbox = narrowTbox)
    assert(kb2.mostGeneralObjectProperties(Named("female")) === Seq("married"))
  }
}
