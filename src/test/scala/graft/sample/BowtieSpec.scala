package graft.sample

import graft.SparkSpec

class BowtieSpec extends SparkSpec {
  import spark.implicits._

  test("all six regions on a hand-built graph") {
    // CORE {a,b} (2-cycle); in1 → core; core → out1; tube1 on an IN→OUT
    // path avoiding core; t1 hangs off IN, t2 leads into OUT; d1→d2 apart
    val edges = Seq(
      ("a", "b"), ("b", "a"),
      ("in1", "a"),
      ("a", "out1"),
      ("in1", "tube1"), ("tube1", "out1"),
      ("in1", "t1"),
      ("t2", "out1"),
      ("d1", "d2")).toDF("src", "dst")
    val nodes = edges.select($"src".as("id"))
      .unionAll(edges.select($"dst".as("id"))).distinct()
    val got = Bowtie.regions(edges, nodes)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "a" -> "CORE", "b" -> "CORE",
      "in1" -> "IN", "out1" -> "OUT",
      "tube1" -> "TUBE",
      "t1" -> "TENDRIL", "t2" -> "TENDRIL",
      "d1" -> "DISC", "d2" -> "DISC"))
    assert(got.size === nodes.count())
  }

  test("degenerate shapes: pure cycle is all CORE; pure chain has a 1-node core") {
    val cyc = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    val cn = cyc.select($"src".as("id")).unionAll(cyc.select($"dst".as("id"))).distinct()
    assert(Bowtie.regions(cyc, cn).collect().forall(_.getString(1) == "CORE"))

    // chain p→q→r: every SCC is a singleton; the max-id tie-break makes
    // 'r' the core, p/q its IN, nothing else
    val ch = Seq(("p", "q"), ("q", "r")).toDF("src", "dst")
    val chn = ch.select($"src".as("id")).unionAll(ch.select($"dst".as("id"))).distinct()
    val got = Bowtie.regions(ch, chn)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("r" -> "CORE", "q" -> "IN", "p" -> "IN"))
  }
}
