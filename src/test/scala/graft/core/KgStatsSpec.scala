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

  test("schemaGraph: bag semantics over multi-typed endpoints, untyped dropped") {
    val edges = Seq(
      ("a", "p", "b"), ("a", "p", "b"), // parallel edge counts twice
      ("a", "q", "c"),                  // c untyped: dropped
      ("d", "p", "b"))
      .toDF("src", "pred", "dst")
    val types = Seq(("a", "A"), ("a", "A2"), ("b", "B"), ("d", "A"))
      .toDF("node", "cls")
    val got = KgStats.schemaGraph(edges, types).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got === Map(
      ("A", "p", "B") -> 3L,   // 2 parallel a→b + 1 d→b
      ("A2", "p", "B") -> 2L)) // a's second class sees the same 2 edges
  }

  import org.apache.spark.sql.functions.col

  // two disjoint isomorphic chains a→b→c / a2→b2→c2 plus one branch node
  private val wlEdges = Seq(
    ("a", "p", "b"), ("b", "p", "c"),
    ("a2", "p", "b2"), ("b2", "p", "c2"),
    ("hub", "p", "b"), ("hub", "p", "c2"))
    .toDF("src", "pred", "dst")
  private val wlTypes = Seq(("a", "T"), ("a2", "T"), ("hub", "T"))
    .toDF("node", "cls")

  private def colorMap(edges: org.apache.spark.sql.DataFrame, rounds: Int) =
    KgStats.wlColors(edges, wlTypes, rounds).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("wlColors round 0: color is a pure function of the class set") {
    val c = colorMap(wlEdges, 0)
    assert(c("a") === c("a2") && c("a") === c("hub")) // all class {T}
    assert(c("b") === c("c") && c("b") != c("a"))    // untyped vs typed
  }

  test("wlColors refinement separates structure, keeps isomorphic nodes equal") {
    val c = colorMap(wlEdges, 2)
    // the two chains are NOT isomorphic once hub edges exist (hub→b,
    // hub→c2): b gains an extra in-edge c2 lacks symmetric — but a/a2
    // stay equal only if their full 2-hop neighborhoods agree; they do
    // not (b has in-deg 2, b2 has in-deg 1). Check on a hub-free graph:
    val clean = colorMap(wlEdges.filter(col("src") =!= "hub"), 2)
    assert(clean("a") === clean("a2") && clean("b") === clean("b2") &&
      clean("c") === clean("c2"))
    assert(clean("a") != clean("b") && clean("b") != clean("c"))
    // with the hub, b (in-deg 2) must now differ from b2 (in-deg 1)
    assert(c("b") != c("b2"))
  }

  test("wlColors: edge direction is part of the signature") {
    // x→y with pred q vs y2→x2: same degree sequence, opposite direction
    val e = Seq(("x", "q", "y"), ("y2", "q", "x2")).toDF("src", "pred", "dst")
    val c = KgStats.wlColors(e, wlTypes.limit(0), 1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(c("x") === c("y2") && c("y") === c("x2")) // out-node ≡ out-node
    assert(c("x") != c("y"))                        // out-node ≠ in-node
  }

  test("wlColors is partition-invariant") {
    val a = colorMap(wlEdges, 2)
    val b = KgStats.wlColors(wlEdges.repartition(7), wlTypes.repartition(3), 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("functionality: hand-traced scores, micro division is floor") {
    val e = Seq(
      // f: functional (every src once) but NOT inverse-functional (x shared)
      ("a", "f", "x"), ("b", "f", "x"), ("c", "f", "y"),
      // g: one violator — a has two objects → fun = 2/3 floored in micros
      ("a", "g", "x"), ("a", "g", "y"), ("b", "g", "z"))
      .toDF("src", "pred", "dst")
    val got = KgStats.functionality(e).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("f") === ((3L, 3L, 2L, 1000000L, 666666L)))
    assert(got("g") === ((3L, 2L, 3L, 666666L, 1000000L)))
  }

  test("keyCollisions: composite equality, missing-key exclusion, canonical min") {
    val attrs = Seq(
      ("p1", "brand", "B1", "?"), ("p1", "size", "5", "?"),
      ("p3", "brand", "B1", "?"), ("p3", "size", "5", "?"),  // collides with p1
      ("p2", "brand", "B1", "?"), ("p2", "size", "6", "?"),  // size differs → alone
      ("p4", "brand", "B1", "?"),                            // size missing → excluded
      ("p5", "brand", "B2", "?"), ("p5", "size", "5", "?"),  // brand differs → alone
      ("p0", "brand", "B1", "?"), ("p0", "size", "5", "?"))  // collides; canon (min id)
      .toDF("node", "prop", "lexical", "dtype")
    val got = KgStats.keyCollisions(attrs, Seq("brand", "size")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("p0", "p0", 3L), ("p1", "p0", 3L), ("p3", "p0", 3L)))
    // partitioning cannot move the canonical pick
    val re = KgStats.keyCollisions(attrs.repartition(7), Seq("brand", "size"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(re === got)
    intercept[IllegalArgumentException](KgStats.keyCollisions(attrs, Nil))
  }

  test("wlQuotient: mass conservation, member counts, structure splits classes") {
    // two structurally DIFFERENT 'A' nodes: a1 points at B, a2 at nothing —
    // round-1 WL separates them even though schemaGraph would not
    val types = Seq(("a1", "A"), ("a2", "A"), ("b1", "B")).toDF("node", "cls")
    val edges = Seq(("a1", "p", "b1")).toDF("src", "pred", "dst")
    val q = KgStats.wlQuotient(edges, types, rounds = 1).collect()
    // one summary edge, a singleton source class (a1 split from a2)
    assert(q.length === 1)
    assert(q.head.getLong(3) === 1L && q.head.getLong(4) === 1L &&
      q.head.getLong(5) === 1L)
    // Σ n_edges over the summary = |edges|, on a denser fixture too
    val e2 = Seq(("a1", "p", "b1"), ("a2", "p", "b1"), ("a1", "q", "a2"),
      ("b1", "p", "a1")).toDF("src", "pred", "dst")
    val q2 = KgStats.wlQuotient(e2, types, rounds = 2)
    assert(q2.agg(org.apache.spark.sql.functions.sum("n_edges"))
      .first().getLong(0) === 4L)
    // quotient of the quotient key: identical colors ⇒ identical rows under
    // repartition (partitioning invariance of the whole chain)
    val a = q2.collect().map(_.toString).sorted.toSeq
    val b = KgStats.wlQuotient(e2.repartition(5), types, rounds = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("entitySummaries: rare pred + rare obj rank first, exact scores, top-k cut") {
    // pred freq: common ×3, rare ×1; obj freq: hub ×3, o1/o2 ×1 each
    val edges = Seq(
      ("a", "common", "hub"), ("b", "common", "hub"), ("c", "common", "hub"),
      ("a", "rare", "o1"), ("a", "common2", "o2"), ("a", "common2", "hub2"),
      ("b", "common2", "hub2")).toDF("src", "pred", "dst")
    val M = 1000000000L
    val got = KgStats.entitySummaries(edges, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4))).toSet
    // a's facts: rare/o1 = M/1+M/1 = 2M; common2/o2 = M/3+M/1; common2/hub2 =
    // M/3+M/2; common/hub = M/3+M/3 — top-2 keeps the first two
    assert(got.filter(_._1 == "a") === Set(
      ("a", "rare", "o1", 2 * M, 1),
      ("a", "common2", "o2", M / 3 + M, 2)))
    // b: common2/hub2 (M/3+M/2) beats common/hub (M/3+M/3)
    assert(got.filter(_._1 == "b") === Set(
      ("b", "common2", "hub2", M / 3 + M / 2, 1),
      ("b", "common", "hub", M / 3 + M / 3, 2)))
    // c has one fact; rank 1 only
    assert(got.count(_._1 == "c") === 1)
    // partitioning-invariant; k guard
    val re = KgStats.entitySummaries(edges.repartition(5), k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getInt(4))).toSet
    assert(re === got)
    intercept[IllegalArgumentException](KgStats.entitySummaries(edges, 0))
  }
}
