package graft.core

import graft.SparkSpec

/** AMIE chain-rule mining: hand-traced support / CWA / PCA counts,
  * multi-witness dedup, the wedge-product cap, and compose(). */
class RulesSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // (p,q) bodies: (a,u) head-hit; (b,v) x emits r elsewhere (PCA counter-
  // evidence, no hit); (c,t) x never emits r (invisible to PCA); (d,u)
  // reached via TWO z-witnesses (m and m4) — counted once
  private lazy val edges = Seq(
    ("a", "p", "m"), ("m", "q", "u"), ("a", "r", "u"),
    ("b", "p", "m2"), ("m2", "q", "v"), ("b", "r", "w"),
    ("c", "p", "m3"), ("m3", "q", "t"),
    ("d", "p", "m"), ("d", "p", "m4"), ("m4", "q", "u"))
    .toDF("src", "pred", "dst")

  test("support / conf / pca_conf hand-traced; zero-support rules dropped") {
    val got = Rules.mineChains(edges, minSupport = 1L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    // body_n 4: (a,u),(b,v),(c,t),(d,u); pca_n 2: a and b emit r; support 1
    assert(got === Map(("p", "q", "r") -> ((4L, 2L, 1L, 250000L, 500000L))))
    // d emits only p → (p,q ⇒ p) candidates all miss → support 0 → dropped
  }

  test("wedge-product cap excludes only true product hubs") {
    // hub h: din 2 · dout 2 = 4; chain z m5: 1·1
    val e = Seq(
      ("x1", "p", "h"), ("x2", "p", "h"), ("h", "q", "y1"), ("h", "q", "y2"),
      ("x1", "r", "y1"), ("x2", "r", "y1"),
      ("x1", "p", "m5"), ("m5", "q", "y1"))
      .toDF("src", "pred", "dst")
    val full = Rules.mineChains(e, maxWedge = 4L, minSupport = 1L).collect()
      .map(r => (r.getLong(3), r.getLong(5))).toSet
    // bodies (x1,y1)(x1,y2)(x2,y1)(x2,y2) — the m5 wedge re-derives
    // (x1,y1), distinct keeps 4; heads hit (x1,y1),(x2,y1) → support 2
    assert(full === Set((4L, 2L)))
    val capped = Rules.mineChains(e, maxWedge = 3L, minSupport = 1L).collect()
      .map(r => (r.getLong(3), r.getLong(5))).toSet
    assert(capped === Set((1L, 1L))) // only the m5 wedge survives
  }

  test("compose materializes distinct pairs under the derived predicate") {
    val got = Rules.compose(edges, "p", "q", "pq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(("a", "pq", "u"), ("b", "pq", "v"),
      ("c", "pq", "t"), ("d", "pq", "u")))
  }

  test("mining the graph ∪ its own composition rediscovers it at confidence 1") {
    val e = edges.unionAll(Rules.compose(edges, "p", "q", "pq"))
    val got = Rules.mineChains(e, minSupport = 2L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(6)))).toMap
    assert(got(("p", "q", "pq")) === ((4L, 1000000L)))
  }

  test("alignRelations: duplicate, inverse, and partial-subset plants hand-traced") {
    val s = spark
    import s.implicits._
    // r: {(a,x),(b,y),(c,z)}; r2 = r exactly; rInv = r swapped;
    // half = {(a,x)} ⊂ r; noise shares no pairs with anything
    val e = Seq(
      ("a", "r", "x"), ("b", "r", "y"), ("c", "r", "z"),
      ("a", "r2", "x"), ("b", "r2", "y"), ("c", "r2", "z"),
      ("x", "rInv", "a"), ("y", "rInv", "b"), ("z", "rInv", "c"),
      ("a", "half", "x"),
      ("a", "noise", "q")).toDF("src", "pred", "dst")
    val got = Rules.alignRelations(e).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // exact duplicate: support 3 = p_n, conf = pca_conf = 1, both orders
    assert(got(("r", "r2", "fwd")) === ((3L, 3L, 3L, 1000000L, 1000000L)))
    assert(got(("r2", "r", "fwd")) === ((3L, 3L, 3L, 1000000L, 1000000L)))
    // inverse alignment appears ONLY in the inv direction
    assert(got(("r", "rInv", "inv")) === ((3L, 3L, 3L, 1000000L, 1000000L)))
    assert(!got.contains(("r", "rInv", "fwd")))
    // partial subset: half ⇒ r at conf 1; r ⇒ half at CWA 1/3 but PCA 1
    // (only the subject known to `half` counts as counter-evidence)
    assert(got(("half", "r", "fwd")) === ((1L, 1L, 1L, 1000000L, 1000000L)))
    assert(got(("r", "half", "fwd")) === ((1L, 3L, 1L, 333333L, 1000000L)))
    // disjoint pair sets produce no row
    assert(!got.keys.exists(k => k._1 == "noise" || k._2 == "noise"))
  }

  test("alignClasses: equivalence, subclass, and disjoint classes hand-traced") {
    val s = spark
    import s.implicits._
    val t = Seq(
      ("n1", "A"), ("n2", "A"), ("n3", "A"),
      ("n1", "B"), ("n2", "B"), ("n3", "B"), // B ≡ A
      ("n1", "C"),                           // C ⊑ A (strict subset)
      ("n9", "D")                            // disjoint
    ).toDF("node", "cls")
    val got = Rules.alignClasses(t).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("A", "B")) === ((3L, 3L, 1000000L)))
    assert(got(("B", "A")) === ((3L, 3L, 1000000L)))
    assert(got(("C", "A")) === ((1L, 1L, 1000000L))) // subclass: 1 forward
    assert(got(("A", "C")) === ((1L, 3L, 333333L)))  // 1/3 back
    assert(!got.keys.exists(k => k._1 == "D" || k._2 == "D"))
  }
}
