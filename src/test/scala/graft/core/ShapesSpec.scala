package graft.core

import graft.SparkSpec

class ShapesSpec extends SparkSpec {
  import spark.implicits._

  private val types = Seq(
    ("o1", "Order"), ("o2", "Order"), ("o3", "Order"),
    ("p1", "Part"), ("p2", "Part"), ("p3", "Part"),
    ("c1", "Customer"), ("c2", "Customer"), ("c3", "Customer"))
    .toDF("node", "cls")

  private val edges = Seq(
    ("o1", "contains", "p1"), ("o1", "contains", "p2"),
    ("o2", "placedBy", "c1"), ("o2", "placedBy", "c2"), // maxCount 1 breach
    ("o1", "placedBy", "c1"),
    ("o3", "placedBy", "zz")) // zz not typed Customer -> class breach
    .toDF("src", "pred", "dst")

  private val attrs = Seq(
    ("c1", "acctbal", "-5.00", "xsd:double"), // minInclusive breach
    ("c2", "acctbal", "abc", "xsd:double"),   // cast failure -> datatype breach
    ("c3", "acctbal", "7.10", "xsd:string"),  // wrong dtype tag -> datatype breach
    ("o1", "acctbal", "-9.99", "xsd:double")) // wrong class: must NOT surface
    .toDF("node", "prop", "lexical", "dtype")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet

  test("min/max cardinality with zero-count focus nodes surfacing") {
    val got = rows(Shapes.validate(edges, types, attrs, propShapes = Seq(
      PropertyShape("OP", "Order", "contains", minCount = 1, maxCount = Some(1)))))
    assert(got === Set(
      ("o2", "OP", "minCount", "0"),
      ("o3", "OP", "minCount", "0"),
      ("o1", "OP", "maxCount", "2")))
  }

  test("inverse path counts on the object side") {
    val got = rows(Shapes.validate(edges, types, attrs, propShapes = Seq(
      PropertyShape("PO", "Part", "^contains", minCount = 1))))
    assert(got === Set(("p3", "PO", "minCount", "0")))
  }

  test("value-class flags untyped values, per offending edge") {
    val got = rows(Shapes.validate(edges, types, attrs, propShapes = Seq(
      PropertyShape("OC", "Order", "placedBy", valueClass = Some("Customer")))))
    assert(got === Set(("o3", "OC", "class", "zz")))
  }

  test("datatype: wrong tag and failed cast both flag; range checks casted value") {
    val got = rows(Shapes.validate(edges, types, attrs, attrShapes = Seq(
      AttrShape("CB", "Customer", "acctbal",
        datatype = Some("xsd:double"), minInclusive = Some(0.0)))))
    assert(got === Set(
      ("c2", "CB", "datatype", "abc"),
      ("c3", "CB", "datatype", "7.10"),
      ("c1", "CB", "minInclusive", "-5.00")))
  }

  test("target class scopes attr shapes (o1's negative acctbal is not a Customer)") {
    val got = Shapes.validate(edges, types, attrs, attrShapes = Seq(
      AttrShape("CB", "Customer", "acctbal", minInclusive = Some(0.0))))
    assert(!rows(got).exists(_._1 == "o1"))
  }

  test("a conformant shape yields zero rows") {
    val got = Shapes.validate(edges, types, attrs, propShapes = Seq(
      PropertyShape("OK", "Order", "placedBy", minCount = 1, maxCount = Some(2),
        valueClass = None)))
    assert(got.count() === 0L)
  }
}
