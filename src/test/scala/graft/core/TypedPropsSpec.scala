package graft.core

import graft.SparkSpec
import graft.fixtures.FamilyKb

/** Typed data-property accessors (reference knowledge_base.py:1042-1072)
  * on the family fixture + the TPC-H KG schema. */
class TypedPropsSpec extends SparkSpec {

  test("datatype-group accessors on the family fixture") {
    val kb = FamilyKb.kb(spark)
    assert(kb.numericDataProperties === Seq("age"))
    assert(kb.doubleDataProperties === Nil)
    assert(kb.booleanDataProperties === Nil)
    assert(kb.timeDataProperties === Nil)
    assert(kb.dataPropertiesInSignature.toSet === Set("age", "nickname"))
  }

  test("typedDataValues materializes cast columns for the group") {
    val kb = FamilyKb.kb(spark)
    val vals = kb.typedDataValues(DatatypeGroups.Numeric, "double").collect()
    assert(vals.forall(_.getString(1) == "age"))
    val byNode = vals.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(byNode("m1") === 61.0 && byNode("f3") === 14.0)
    // empty group → empty result, not an error
    assert(kb.typedDataValues(DatatypeGroups.Time, "date").isEmpty)
  }

  test("tbox iri-mode skips data-property ranges (knowledge_base.py:328)") {
    val rows = FamilyKb.tbox.tripleRows()
    val ranges = rows.filter(_.pred == Schemas.Range)
    assert(ranges.map(_.subj).toSet === Set("hasChild", "married"))
    // full mode carries them
    val full = FamilyKb.tbox.tripleRows(includeDataRanges = true)
    assert(full.filter(_.pred == Schemas.Range).map(_.subj).toSet ===
      Set("hasChild", "married", "age", "nickname"))
    // domains are unaffected by the quirk
    assert(rows.count(_.pred == Schemas.Domain) === 4)
  }
}
