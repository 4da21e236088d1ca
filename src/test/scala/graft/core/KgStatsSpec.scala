package graft.core

import graft.SparkSpec

class KgStatsSpec extends SparkSpec {
  import spark.implicits._

  test("characteristicSets: subjects partition by exact pred set, deg sums raw edges") {
    val edges = Seq(
      ("s1", "a", "x"), ("s1", "b", "x"),
      ("s2", "a", "x"),
      // s3 shares {a,b} with s1 but has a parallel 'a' edge — deg counts it
      ("s3", "a", "x"), ("s3", "a", "y"), ("s3", "b", "x"))
      .toDF("src", "pred", "dst")
    val got = KgStats.characteristicSets(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("a|b" -> ((2L, 5L)), "a" -> ((1L, 1L))))
  }

  test("inferDatatypes: tightest covering type, mixed degrades to string") {
    val attrs = Seq(
      ("n1", "age", "1", "?"), ("n2", "age", "42", "?"), ("n3", "age", "-7", "?"),
      ("n1", "price", "1.5", "?"), ("n2", "price", "2", "?"), ("n3", "price", "-1.5e3", "?"),
      ("n1", "flag", "true", "?"), ("n2", "flag", "false", "?"),
      ("n1", "day", "2021-01-01", "?"),
      ("n1", "mix", "1", "?"), ("n2", "mix", "x", "?"))
      .toDF("node", "prop", "lexical", "dtype")
    val got = KgStats.inferDatatypes(attrs).collect()
      .map(r => r.getString(0) -> r.getString(6)).toMap
    assert(got === Map(
      "age" -> "xsd:long",      // ints are also doubles — long wins by order
      "price" -> "xsd:double",  // one non-integer lexical is enough
      "flag" -> "xsd:boolean",
      "day" -> "xsd:date",
      "mix" -> "xsd:string"))   // 1/2 parse as long — full coverage required
  }

  test("inferDatatypes counts: every probe column is exact") {
    val attrs = Seq(
      ("n1", "p", "12", "?"), ("n2", "p", "1.5", "?"), ("n3", "p", "true", "?"),
      ("n4", "p", "2021-12-31", "?"), ("n5", "p", "word", "?"))
      .toDF("node", "prop", "lexical", "dtype")
    val r = KgStats.inferDatatypes(attrs).collect().head
    // (prop, n_values, n_long, n_double, n_date, n_bool, inferred)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((5L, 1L, 2L, 1L, 1L)))
    assert(r.getString(6) === "xsd:string")
  }

  test("inferDatatypes: all-null prop reports string with zero values") {
    val attrs = Seq(("n1", "p", Option.empty[String], "?"),
      ("n2", "p", None, "?")).toDF("node", "prop", "lexical", "dtype")
    val r = KgStats.inferDatatypes(attrs).collect().head
    assert(r.getLong(1) === 0L && r.getString(6) === "xsd:string")
  }

  test("characteristicSets on the TpchKg shape: sets match the entity kinds") {
    // miniature of the derived KG: orders emit {contains, placedBy,
    // suppliedBy}, customers/suppliers {inNation}, nations {inRegion}
    val edges = Seq(
      ("o:1", "placedBy", "c:1"), ("o:1", "contains", "p:1"),
      ("o:1", "suppliedBy", "s:1"), ("o:1", "contains", "p:2"),
      ("c:1", "inNation", "n:1"), ("s:1", "inNation", "n:1"),
      ("n:1", "inRegion", "r:1"))
      .toDF("src", "pred", "dst")
    val got = KgStats.characteristicSets(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "contains|placedBy|suppliedBy" -> 1L,
      "inNation" -> 2L,
      "inRegion" -> 1L))
  }
}
