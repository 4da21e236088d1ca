package graft.sample

import graft.SparkSpec
import graft.core.Kb
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Metropolis-Hastings RW: acceptance law on a star (center→leaf always
  * accepts, leaf→center accepts w.p. 1/deg(center)), original-orientation
  * edge log, exact-count contract, and partitioning determinism. */
class MhrwSpec extends SparkSpec {

  private def kbOf(edges: Seq[(String, String, String)]): Kb = {
    val s = spark
    import s.implicits._
    val e = edges.toDF("src", "pred", "dst")
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    Kb(nodes = nodes, edges = e,
      attrs = Seq.empty[(String, String, String, String)]
        .toDF("node", "prop", "lexical", "dtype"),
      types = Seq.empty[(String, String)].toDF("node", "cls"),
      tbox = graft.core.Tbox(Nil, Nil, Nil, Nil))
  }

  test("star: walk escapes the hub, edges log in original orientation, count exact") {
    // directed star c→l1..l8; symmetrized deg(c)=8, deg(li)=1
    val kb = kbOf((1 to 8).map(i => ("c", "p", s"l$i")))
    val drawn = new MhrwSampler(kb, seed = 3, walkers = 2, maxSteps = 400).draw(6)
    assert(drawn.sampledNodes.count() === 6)
    // every logged edge is an ORIGINAL edge (src must be the center)
    val logged = drawn.selectedEdges.get.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(logged.nonEmpty)
    logged.foreach { case (s0, p, d0) =>
      assert(s0 === "c" && p === "p" && d0.startsWith("l"))
    }
    // sample() materializes a first-class Kb with exactly n nodes
    val sampled = new MhrwSampler(kb, seed = 3, walkers = 2, maxSteps = 400).sample(5)
    assert(sampled.nodes.count() === 5)
  }

  test("acceptance: center→leaf proposals always accepted (ratio ≥ 1 law)") {
    // a 2-node path a→b: deg(a)=deg(b)=1, ratio 1 → EVERY proposal accepts;
    // the walk must alternate and visit both nodes in 1 step
    val kb = kbOf(Seq(("a", "p", "b")))
    val drawn = new MhrwSampler(kb, seed = 9, walkers = 1, maxSteps = 3).draw(2)
    assert(ids(drawn.sampledNodes) === Set("a", "b"))
  }

  test("partitioning-invariant: identical sample and edge log at any parallelism") {
    val edges = (0 until 60).map(i => (s"v${i % 17}", "p", s"v${(i * 5 + 2) % 17}"))
      .filter(e => e._1 != e._3)
    def run(parts: Int): (Set[String], Set[(String, String, String)]) = {
      val s = spark
      import s.implicits._
      val kb0 = kbOf(edges)
      val kb = kb0.copy(edges = kb0.edges.repartition(parts))
      val d = new MhrwSampler(kb, seed = 5, walkers = 3, maxSteps = 200).draw(10)
      (ids(d.sampledNodes), d.selectedEdges.get.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet)
    }
    assert(run(1) === run(13))
  }
}
