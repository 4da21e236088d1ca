package graft.pipeline

import graft.SparkSpec

/** Pointer-doubling chain resolution: hand-traced chains, exact hop
  * counts, cycle detection (self-loop, 2-cycle, chain feeding a cycle),
  * functionality validation, and partitioning determinism. */
class RedirectsSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def resolve(edges: (String, String)*) =
    Redirects.resolveChains(edges.toSeq.toDF("src", "dst")).collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)).getOrElse("∅"),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))).toMap

  test("chains resolve to the terminal with exact hops") {
    val got = resolve(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"))
    assert(got === Map(
      "a" -> (("d", 3L, false)), "b" -> (("d", 2L, false)),
      "c" -> (("d", 1L, false)), "x" -> (("y", 1L, false))))
    // a 9-node chain needs >3 doubling rounds — exercises the log budget
    val long = (0 until 9).map(i => s"n$i" -> s"n${i + 1}")
    assert(resolve(long: _*).apply("n0") === (("n9", 9L, false)))
  }

  test("cycles: self-loop, 2-cycle, and chains feeding them come back cyclic") {
    val got = resolve(("s", "s"), ("x", "y"), ("y", "x"), ("t", "x"),
      ("a", "b"), ("b", "c"))
    assert(got("s") === (("∅", -1L, true)))
    assert(got("x") === (("∅", -1L, true)))
    assert(got("y") === (("∅", -1L, true)))
    assert(got("t") === (("∅", -1L, true))) // feeds the cycle, never terminates
    assert(got("a") === (("c", 2L, false))) // independent chain unaffected
  }

  test("non-functional input rejected; empty input yields empty output") {
    intercept[IllegalArgumentException](resolve(("a", "b"), ("a", "c")))
    assert(Redirects.resolveChains(
      Seq.empty[(String, String)].toDF("src", "dst")).count() === 0L)
  }

  test("partitioning determinism") {
    val edges = (0 until 20).map(i => s"n$i" -> s"n${i + 1}") :+ ("z" -> "z")
    val a = Redirects.resolveChains(edges.toDF("src", "dst"))
      .collect().map(_.toString).sorted.toSeq
    val b = Redirects.resolveChains(edges.toDF("src", "dst").repartition(7))
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
