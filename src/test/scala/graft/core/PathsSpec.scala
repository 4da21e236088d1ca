package graft.core

import graft.SparkSpec
import graft.core.PathExpr._

class PathsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (String, String, String)*) =
    rows.toDF("src", "pred", "dst")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  private def pairBag(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
    df.collect().groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, v) => k -> v.length.toLong }

  test("Pred / Inv leaves") {
    val e = edges(("a", "p", "b"), ("b", "q", "c"))
    assert(pairSet(Paths.pairs(e, Pred("p"))) === Set(("a", "b")))
    assert(pairSet(Paths.pairs(e, Inv(Pred("p")))) === Set(("b", "a")))
  }

  test("sequence composes through the mid variable, bag semantics") {
    // two distinct mids a→m1→z, a→m2→z: (a,z) must appear TWICE
    val e = edges(("a", "p", "m1"), ("a", "p", "m2"), ("m1", "p", "z"), ("m2", "p", "z"))
    val got = pairBag(Paths.pairs(e, PSeq(Pred("p"), Pred("p"))))
    assert(got === Map(("a", "z") -> 2L))
  }

  test("alternation is bag union") {
    val e = edges(("a", "p", "b"), ("a", "q", "b"), ("a", "r", "c"))
    val got = pairBag(Paths.pairs(e, Alt(Pred("p"), Pred("q"))))
    assert(got === Map(("a", "b") -> 2L))
  }

  test("inverse pushes through sequence and alternation (^(a/b) = ^b/^a)") {
    val e = edges(("a", "p", "b"), ("b", "q", "c"), ("a", "r", "c"))
    val fwd = pairSet(Paths.pairs(e, PSeq(Pred("p"), Pred("q"))))
    val inv = pairSet(Paths.pairs(e, Inv(PSeq(Pred("p"), Pred("q")))))
    assert(inv === fwd.map(_.swap))
    val invAlt = pairSet(Paths.pairs(e, Inv(Alt(Pred("q"), Pred("r")))))
    assert(invAlt === Set(("c", "b"), ("c", "a")))
    assert(pairSet(Paths.pairs(e, Inv(Inv(Pred("p"))))) === Set(("a", "b")))
  }

  test("closureFrom: BFS first-reach levels on a chain") {
    val e = edges(("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"))
    val got = Paths.closureFrom(e, Pred("p"), Seq("a"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got === Map("b" -> 1, "c" -> 2, "d" -> 3))
  }

  test("closureFrom: depthLimit stops the crawl instead of raising") {
    // a 6-chain with maxRounds 3 would raise; depthLimit 3 returns the
    // first three levels (an unconverged crawl is the normal case)
    val e = edges(("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
      ("d", "p", "e"), ("e", "p", "f"), ("f", "p", "g"))
    val got = Paths.closureFrom(e, Pred("p"), Seq("a"),
      maxRounds = 3, depthLimit = Some(3))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got === Map("b" -> 1, "c" -> 2, "d" -> 3))
    // depthLimit past convergence changes nothing
    val conv = Paths.closureFrom(e, Pred("p"), Seq("a"), depthLimit = Some(20))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(conv === Map("b" -> 1, "c" -> 2, "d" -> 3, "e" -> 4, "f" -> 5, "g" -> 6))
    // depthLimit 1: just the out-neighborhood of the seeds
    val one = Paths.closureFrom(e, Pred("p"), Seq("a", "c"), depthLimit = Some(1))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(one === Map("b" -> 1, "d" -> 1))
  }

  test("closureFrom: cycle reaches the seed itself at the cycle length") {
    val e = edges(("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a"))
    val got = Paths.closureFrom(e, Pred("p"), Seq("a"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got === Map("b" -> 1, "c" -> 2, "a" -> 3))
  }

  test("closureFrom: multi-seed min level and step dedup") {
    // bag step (two parallel p edges a→b) must not duplicate reach rows
    val e = edges(("a", "p", "b"), ("a", "q", "b"), ("b", "p", "c"), ("x", "p", "c"))
    val df = Paths.closureFrom(e, Alt(Pred("p"), Pred("q")), Seq("a", "x"))
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1)))
    assert(rows.length === rows.distinct.length)
    assert(rows.toMap === Map("b" -> 1, "c" -> 1))
  }

  test("closureFrom raises past maxRounds instead of silently truncating") {
    val e = edges(("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"))
    intercept[IllegalArgumentException] {
      Paths.closureFrom(e, Pred("p"), Seq("a"), maxRounds = 2)
    }
  }

  test("ZeroOrOne: identity over the active domain, DISTINCT semantics") {
    val e = edges(("a", "p", "b"), ("b", "q", "c"), ("a", "p2", "a"))
    // every term relates to itself; (a,b) once even though the self-loop
    // p2 and the identity could both produce (a,a)
    val got = pairBag(Paths.pairs(e, ZeroOrOne(Pred("p"))))
    assert(got === Map(("a", "a") -> 1L, ("b", "b") -> 1L, ("c", "c") -> 1L,
      ("a", "b") -> 1L))
    // inverse of e? is (^e)? — identity unchanged, hop flipped
    val inv = pairBag(Paths.pairs(e, Inv(ZeroOrOne(Pred("p")))))
    assert(inv === Map(("a", "a") -> 1L, ("b", "b") -> 1L, ("c", "c") -> 1L,
      ("b", "a") -> 1L))
  }

  test("NegSet: forward and inverse negated property sets, bag semantics") {
    val e = edges(("a", "p", "b"), ("a", "q", "b"), ("a", "r", "c"))
    assert(pairBag(Paths.pairs(e, NegSet(Seq("p")))) ===
      Map(("a", "b") -> 1L, ("a", "c") -> 1L))
    assert(pairBag(Paths.pairs(e, NegSet(Seq("p", "q", "r")))) === Map.empty)
    // !(^p) = inverse hops over everything but p
    assert(pairBag(Paths.pairs(e, NegSet(Seq("p"), inv = true))) ===
      Map(("b", "a") -> 1L, ("c", "a") -> 1L))
    // Inv(!(x)) = !(^x)
    assert(pairBag(Paths.pairs(e, Inv(NegSet(Seq("p"))))) ===
      pairBag(Paths.pairs(e, NegSet(Seq("p"), inv = true))))
  }

  test("closureFrom includeZero: star semantics — seed at dist 0 beats its cycle") {
    val e = edges(("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a"))
    val star = Paths.closureFrom(e, Pred("p"), Seq("a"), includeZero = true)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(star === Map("a" -> 0, "b" -> 1, "c" -> 2))
    // a seed with no outgoing step is still reachable at 0
    val lone = Paths.closureFrom(e, Pred("p"), Seq("z"), includeZero = true)
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(lone === Map("z" -> 0))
  }

  test("closureFrom is invariant under input partitioning") {
    val e = edges(("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a"), ("c", "p", "d"))
    val one = Paths.closureFrom(e, Pred("p"), Seq("a"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val two = Paths.closureFrom(e.repartition(7), Pred("p"), Seq("a"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(one === two)
  }

  test("weightedSssp: cheap long route beats expensive short hop; multi-seed min") {
    // a→b costs 10 direct, but a→c→d→b costs 1+1+1 = 3; unreachable z stays
    // out; seed set {a, s} — s reaches b at 1, below every a-route
    val w = Seq(
      ("a", "b", 10L), ("a", "c", 1L), ("c", "d", 1L), ("d", "b", 1L),
      ("s", "b", 1L), ("z", "z2", 5L)
    ).toDF("src", "dst", "weight")
    def run(df: org.apache.spark.sql.DataFrame, seeds: Seq[String]) =
      Paths.weightedSssp(df, seeds)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(run(w, Seq("a")) ===
      Map("a" -> 0L, "c" -> 1L, "d" -> 2L, "b" -> 3L))
    assert(run(w, Seq("a", "s")) ===
      Map("a" -> 0L, "s" -> 0L, "c" -> 1L, "d" -> 2L, "b" -> 1L))
    // partitioning-invariant; zero-weight edges fine; empty seed rejected
    assert(run(w.repartition(7), Seq("a")) === run(w, Seq("a")))
    val zw = Seq(("a", "b", 0L), ("b", "c", 0L)).toDF("src", "dst", "weight")
    assert(run(zw, Seq("a")) === Map("a" -> 0L, "b" -> 0L, "c" -> 0L))
    intercept[IllegalArgumentException](Paths.weightedSssp(w, Nil))
    // a weight cycle saturates (non-negative weights): dist stabilizes
    val cyc = Seq(("a", "b", 2L), ("b", "a", 2L)).toDF("src", "dst", "weight")
    assert(run(cyc, Seq("a")) === Map("a" -> 0L, "b" -> 2L))
  }
}
