package graft.core

import graft.SparkSpec

/** BGP matching: hand-traced joins on a literal edge set, variable
  * predicates, repeated variables inside one atom, bag semantics, and the
  * disconnected-pattern cartesian contract. */
class BgpSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private lazy val edges = Seq(
    ("a", "knows", "b"), ("b", "knows", "c"), ("a", "knows", "c"),
    ("c", "likes", "a"), ("c", "likes", "c"), ("d", "knows", "d")
  ).toDF("src", "pred", "dst")

  private def rows(atoms: (String, String, String)*): Set[Seq[String]] =
    Bgp.matchPattern(edges, atoms).collect()
      .map(r => (0 until r.length).map(r.getString)).toSet

  test("two-hop chain with shared variable") {
    // ?x knows ?y, ?y knows ?z → a-b-c only (d-d-d via self loop too)
    assert(rows(("?x", "knows", "?y"), ("?y", "knows", "?z")) ==
      Set(Seq("a", "b", "c"), Seq("d", "d", "d")))
  }

  test("constant positions filter; variable predicate binds a column") {
    assert(rows(("c", "?p", "?o")) == Set(Seq("likes", "a"), Seq("likes", "c")))
    assert(rows(("?x", "likes", "a")) == Set(Seq("c")))
  }

  test("repeated variable inside one atom is a same-row filter") {
    assert(rows(("?x", "knows", "?x")) == Set(Seq("d")))
    assert(rows(("?x", "likes", "?x")) == Set(Seq("c")))
  }

  test("triangle pattern: repeated variables across three atoms") {
    assert(rows(("?x", "knows", "?y"), ("?y", "knows", "?z"), ("?x", "knows", "?z")) ==
      Set(Seq("a", "b", "c"), Seq("d", "d", "d")))
  }

  test("bag semantics: duplicate edges duplicate solutions") {
    val dup = edges.unionAll(Seq(("a", "knows", "b")).toDF("src", "pred", "dst"))
    val got = Bgp.matchPattern(dup, Seq(("a", "knows", "?y"))).collect().map(_.getString(0))
    assert(got.sorted.toSeq == Seq("b", "b", "c"))
  }

  test("disconnected pattern is a cartesian product") {
    val n = Bgp.matchPattern(edges,
      Seq(("?x", "likes", "?y"), ("?u", "knows", "d"))).count()
    assert(n == 2L) // 2 likes-rows × 1 knows-d row
  }

  test("OPTIONAL: null fill, bag multiplicity, disconnected rejected") {
    // ?x knows ?y OPTIONAL { ?y likes ?z }: (a,b) has no b-likes → z NULL;
    // (a,c)/(b,c) each meet TWO c-likes rows → multiplicity 2 apiece
    val got = Bgp.matchOptional(edges,
      required = Seq(("?x", "knows", "?y")),
      optional = Seq(("?y", "likes", "?z")))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)).getOrElse("∅"))).toList.sorted
    assert(got === List(
      ("a", "b", "∅"),
      ("a", "c", "a"), ("a", "c", "c"),
      ("b", "c", "a"), ("b", "c", "c"),
      ("d", "d", "∅")))
    intercept[IllegalArgumentException](Bgp.matchOptional(edges,
      Seq(("?x", "knows", "?y")), Seq(("?u", "likes", "?v"))))
  }

  test("UNION: branch-local variables NULL-pad, bag multiplicity, column order") {
    // { ?x knows ?y } UNION { ?x likes ?z }: y unbound in branch 2, z in
    // branch 1; schema = union of vars in first-appearance order (x, y, z)
    val u = Bgp.matchUnion(edges, Seq(
      Seq(("?x", "knows", "?y")),
      Seq(("?x", "likes", "?z"))))
    assert(u.columns.toSeq === Seq("x", "y", "z"))
    val got = u.collect().map(r => (r.getString(0),
      Option(r.getString(1)).getOrElse("∅"),
      Option(r.getString(2)).getOrElse("∅"))).toList.sorted
    assert(got === List(
      ("a", "b", "∅"), ("a", "c", "∅"), ("b", "c", "∅"),
      ("c", "∅", "a"), ("c", "∅", "c"), ("d", "d", "∅")))
    // bag semantics: identical branches double every solution
    assert(Bgp.matchUnion(edges, Seq(
      Seq(("?x", "likes", "?z")), Seq(("?x", "likes", "?z")))).count() === 4L)
    intercept[IllegalArgumentException](Bgp.matchUnion(edges, Nil))
  }

  test("MINUS: shared-variable anti join, bag multiplicity, disjoint domains remove nothing") {
    // ?x knows ?y MINUS { ?x likes ?z }: only c likes → no knows-row has
    // src c, so nothing drops via x... use ?y shared instead:
    // ?x knows ?y MINUS { ?y likes ?z } drops every row whose y likes
    val got = Bgp.matchMinus(edges,
      Seq(("?x", "knows", "?y")), Seq(("?y", "likes", "?z")))
      .collect().map(r => (r.getString(0), r.getString(1))).toList.sorted
    assert(got === List(("a", "b"), ("d", "d"))) // (a,c)/(b,c) drop: c likes
    // bag multiplicity: duplicate left rows survive in duplicate
    val dup = edges.unionAll(edges)
    assert(Bgp.matchMinus(dup,
      Seq(("?x", "knows", "?y")), Seq(("?y", "likes", "?z"))).count() === 4L)
    // SPARQL 1.1 §18.5 asymmetry: NO shared variable → every pair is
    // vacuously disjoint-compatible and MINUS removes NOTHING
    assert(Bgp.matchMinus(edges,
      Seq(("?x", "knows", "?y")), Seq(("?u", "likes", "?v"))).count() === 4L)
  }

  test("NOT EXISTS: same anti join when shared; nonempty disconnected inner removes ALL") {
    val got = Bgp.matchNotExists(edges,
      Seq(("?x", "knows", "?y")), Seq(("?y", "likes", "?z")))
      .collect().map(r => (r.getString(0), r.getString(1))).toList.sorted
    assert(got === List(("a", "b"), ("d", "d")))
    // disconnected inner WITH matches: every left row eliminated (the
    // asymmetry vs MINUS above, on the identical patterns)
    assert(Bgp.matchNotExists(edges,
      Seq(("?x", "knows", "?y")), Seq(("?u", "likes", "?v"))).count() === 0L)
    // disconnected inner with NO matches: everything kept
    assert(Bgp.matchNotExists(edges,
      Seq(("?x", "knows", "?y")), Seq(("?u", "hates", "?v"))).count() === 4L)
  }

  test("aggregation: bag-fed counts, grouping, HAVING") {
    import org.apache.spark.sql.functions.{count, countDistinct, lit, col}
    // group ?x knows ?y by x: a→2, b→1, d→1; HAVING ≥ 2 keeps only a
    val g = Bgp.aggregatePattern(edges, Seq(("?x", "knows", "?y")),
      groupVars = Seq("x"),
      aggs = Seq(count(lit(1)).as("n"), countDistinct(col("y")).as("dy")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(g === Set(("a", 2L, 2L), ("b", 1L, 1L), ("d", 1L, 1L)))
    val h = Bgp.aggregatePattern(edges, Seq(("?x", "knows", "?y")),
      Seq("x"), Seq(count(lit(1)).as("n")), having = Some(col("n") >= 2))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(h === Set(("a", 2L)))
    // duplicate edges reach the aggregate as duplicate solutions (bags)
    assert(Bgp.aggregatePattern(edges.unionAll(edges),
      Seq(("?x", "knows", "?y")), Seq("x"), Seq(count(lit(1)).as("n")))
      .collect().map(_.getLong(1)).sum === 8L)
    intercept[IllegalArgumentException](
      Bgp.aggregatePattern(edges, Seq(("?x", "knows", "?y")), Nil, Nil))
  }

  test("CONSTRUCT: template instantiation, constants, set semantics, unbound rejected") {
    // reverse the knows edges under a new predicate; duplicates collapse
    val rev = Bgp.construct(edges.unionAll(edges), Seq(("?x", "knows", "?y")),
      template = Seq(("?y", "knownBy", "?x")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rev === Set(("b", "knownBy", "a"), ("c", "knownBy", "b"),
      ("c", "knownBy", "a"), ("d", "knownBy", "d")))
    // 2-triple template with a constant subject; ONE where evaluation
    val two = Bgp.construct(edges, Seq(("?x", "likes", "?z")),
      template = Seq(("root", "sawLiker", "?x"), ("root", "sawLiked", "?z")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(two === Set(("root", "sawLiker", "c"),
      ("root", "sawLiked", "a"), ("root", "sawLiked", "c")))
    intercept[IllegalArgumentException](Bgp.construct(edges,
      Seq(("?x", "knows", "?y")), Seq(("?x", "p", "?unbound"))))
    intercept[IllegalArgumentException](Bgp.construct(edges,
      Seq(("?x", "knows", "?y")), Nil))
  }

  test("EXISTS: semi join ignores inner multiplicity and complements NOT EXISTS") {
    // (a,c)/(b,c) each have TWO inner matches (c likes a, c likes c) but
    // EXISTS keeps left multiplicity exactly — 2 rows, not 4
    val got = Bgp.matchExists(edges,
      Seq(("?x", "knows", "?y")), Seq(("?y", "likes", "?z")))
      .collect().map(r => (r.getString(0), r.getString(1))).toList.sorted
    assert(got === List(("a", "c"), ("b", "c")))
    // EXISTS + NOT EXISTS partition the left solutions, shared or not
    for (inner <- Seq(Seq(("?y", "likes", "?z")), Seq(("?u", "likes", "?v")),
                      Seq(("?u", "hates", "?v")))) {
      val left = Seq(("?x", "knows", "?y"))
      assert(Bgp.matchExists(edges, left, inner).count() +
        Bgp.matchNotExists(edges, left, inner).count() === 4L)
    }
  }

  test("FILTER: row-local predicate over the solution relation") {
    import org.apache.spark.sql.functions.col
    val got = Bgp.matchFilter(edges, Seq(("?x", "knows", "?y")),
        col("x") =!= col("y"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"), ("b", "c"), ("a", "c"))) // d-d dropped
  }

  test("path atoms inside a BGP: sequence path joins plain atoms, bag semantics") {
    import PathExpr._
    // ?x knows/knows ?z joined with ?z likes ?w: chains a-b-c and a-c
    // (direct)... knows/knows from a: via b → c; likes from c: a and c.
    // d-d-d self loop: d likes nothing → dropped.
    val got = Bgp.matchPathPattern(edges, Seq(
      ("?x", PSeq(Pred("knows"), Pred("knows")), "?z"),
      ("?z", Pred("likes"), "?w"))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // bag: (a,c) reached once via b; likes fans to a and c
    assert(got.sorted.toSeq == Seq(("a", "c", "a"), ("a", "c", "c")))
  }

  test("path atom: repeated variable is a cycle query; constant endpoint filters") {
    import PathExpr._
    // knows/likes pairs: a→c→{a,c}, b→c→{a,c}; cycle (s = o) keeps only a
    val cyc = Bgp.matchPathPattern(edges, Seq(
      ("?x", PSeq(Pred("knows"), Pred("likes")), "?x"))).collect()
      .map(_.getString(0)).toSeq
    assert(cyc == Seq("a"))
    // constant object pushes into the path's leaf scans
    val toA = Bgp.matchPathPattern(edges, Seq(
      ("?x", PSeq(Pred("knows"), Pred("likes")), "a"))).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(toA == Seq("a", "b"))
    // ZeroOrOne inside a BGP keeps its DISTINCT identity semantics
    val zo = Bgp.matchPathPattern(edges, Seq(
      ("c", ZeroOrOne(Pred("likes")), "?y"))).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(zo == Seq("a", "c")) // identity (c,c) + likes a + likes c, distinct
  }

  test("VALUES: inline bindings restrict; UNDEF (null) joins everything") {
    val got = Bgp.matchValues(edges, Seq(("?x", "knows", "?y")),
        vars = Seq("y"), rows = Seq(Seq("b"), Seq("d")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"), ("d", "d")))
    // 2-var block with an UNDEF: (b, null) matches every x=b row
    val undef = Bgp.matchValues(edges, Seq(("?x", "knows", "?y")),
        vars = Seq("x", "y"), rows = Seq(Seq("a", "c"), Seq("b", null)))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(undef === Set(("a", "c"), ("b", "c")))
    intercept[IllegalArgumentException](
      Bgp.matchValues(edges, Seq(("?x", "knows", "?y")), Seq("z"), Seq(Seq("b"))))
    intercept[IllegalArgumentException](
      Bgp.matchValues(edges, Seq(("?x", "knows", "?y")), Seq("x"), Seq(Seq("a", "b"))))
  }

  test("ASK: satisfiable true, unsatisfiable false, one row each") {
    assert(Bgp.ask(edges, Seq(("?x", "likes", "?y"))).collect()
      .map(_.getBoolean(0)).toSeq === Seq(true))
    assert(Bgp.ask(edges, Seq(("?x", "hates", "?y"))).collect()
      .map(_.getBoolean(0)).toSeq === Seq(false))
  }

  test("solution modifiers: DISTINCT collapses projection bags; ORDER+LIMIT cuts on the total order") {
    val sol = Bgp.matchPattern(edges, Seq(("?x", "knows", "?y"))).select("x")
    assert(Bgp.solutions(sol).count() === 4L)          // bag: a,a,b,d
    assert(Bgp.solutions(sol, distinct = true).count() === 3L)
    val top = Bgp.solutions(
      Bgp.matchPattern(edges, Seq(("?x", "knows", "?y"))),
      orderBy = Seq("x", "y"), limit = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(top === Seq(("a", "b"), ("a", "c")))
    val desc = Bgp.solutions(
      Bgp.matchPattern(edges, Seq(("?x", "knows", "?y"))),
      orderBy = Seq("-x", "y"), limit = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc === Seq(("d", "d")))
  }

  test("orderAtoms: selective-constant first, connected-only expansion, cartesian last") {
    val stats = Map(
      "hub"  -> Bgp.PredStat(1000000L, 1000L, 1000L),
      "mid"  -> Bgp.PredStat(10000L, 5000L, 100L),
      "tiny" -> Bgp.PredStat(25L, 25L, 5L))
    // costs: hub(?a,?b)=10^6; mid(?b,?c)=10^4; tiny(?c, const)=25/5=5
    val got = Bgp.orderAtoms(Seq(
      ("?a", "hub", "?b"), ("?b", "mid", "?c"), ("?c", "tiny", "k")), stats)
    assert(got === Seq(
      ("?c", "tiny", "k"), ("?b", "mid", "?c"), ("?a", "hub", "?b")))
    // a cheap but DISCONNECTED atom waits until the connected pool drains
    val got2 = Bgp.orderAtoms(Seq(
      ("?a", "hub", "?b"), ("?x", "tiny", "?y"), ("?b", "mid", "?c")), stats)
    assert(got2 === Seq(
      ("?x", "tiny", "?y"), ("?b", "mid", "?c"), ("?a", "hub", "?b")))
    // ^ cheapest overall seeds; nothing connects to {x,y}, so the
    //   global-min fallback fires (mid 10^4 beats hub 10^6); hub then
    //   joins connected via ?b
    // deterministic tie-break on the original index
    val tie = Bgp.orderAtoms(Seq(
      ("?p", "tiny", "k"), ("?q", "tiny", "k")), stats)
    assert(tie === Seq(("?p", "tiny", "k"), ("?q", "tiny", "k")))
  }

  test("matchPatternOptimized: identical bag + column order to literal evaluation") {
    val pattern = Seq(
      ("?x", "knows", "?y"), ("?y", "likes", "?z"), ("?z", "knows", "?w"))
    val plain = Bgp.matchPattern(edges, pattern)
    val opt = Bgp.matchPatternOptimized(edges, pattern)
    assert(opt.columns.toSeq === plain.columns.toSeq)
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until r.length).map(r.getString)).groupBy(identity)
        .view.mapValues(_.length).toMap
    assert(bag(opt) === bag(plain))
    // disconnected pattern: the deliberate cartesian survives reordering
    val cart = Seq(("?x", "knows", "?y"), ("?p", "likes", "?q"))
    assert(Bgp.matchPatternOptimized(edges, cart).count() ===
      Bgp.matchPattern(edges, cart).count())
  }
}
