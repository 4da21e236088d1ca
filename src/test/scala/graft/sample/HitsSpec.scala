package graft.sample

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the identical power iteration (same init, same
    * deferred every-5-sweeps L2 rescale schedule, same #iterations) over an
    * edge list. */
  private def refHits(edges: Seq[(String, String)], iterations: Int)
  : Map[String, (Double, Double)] = {
    val srcs = edges.map(_._1).distinct
    var hub = srcs.map(_ -> 1.0).toMap
    var auth = Map.empty[String, Double]
    def norm(m: Map[String, Double]) = {
      val n2 = m.values.map(v => v * v).sum
      if (n2 > 0) m.view.mapValues(_ / math.sqrt(n2)).toMap else m
    }
    for (i <- 1 to iterations) {
      val boundary = i % 5 == 0 || i == iterations
      auth = edges.groupBy(_._2).view.mapValues(
        _.map(e => hub.getOrElse(e._1, 0.0)).sum).toMap
      if (boundary) auth = norm(auth)
      hub = edges.groupBy(_._1).view.mapValues(
        _.map(e => auth.getOrElse(e._2, 0.0)).sum).toMap
      if (boundary) hub = norm(hub)
    }
    (edges.map(_._1) ++ edges.map(_._2)).distinct
      .map(id => id -> ((hub.getOrElse(id, 0.0), auth.getOrElse(id, 0.0)))).toMap
  }

  private def run(edges: Seq[(String, String)], iterations: Int = 20)
  : Map[String, (Double, Double)] =
    Hits.compute(edges.toDF("src", "dst"), iterations).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

  private def close(a: Map[String, (Double, Double)],
                    b: Map[String, (Double, Double)]): Unit = {
    assert(a.keySet === b.keySet)
    a.foreach { case (k, (h, t)) =>
      assert(math.abs(h - b(k)._1) < 1e-9, s"hub($k): $h vs ${b(k)._1}")
      assert(math.abs(t - b(k)._2) < 1e-9, s"auth($k): $t vs ${b(k)._2}")
    }
  }

  test("star: the centre is the sole authority, leaves are uniform hubs") {
    val edges = Seq(("l1", "c"), ("l2", "c"), ("l3", "c"))
    val got = run(edges, 10)
    assert(math.abs(got("c")._2 - 1.0) < 1e-12)       // ‖auth‖ concentrated
    assert(got("c")._1 === 0.0)                        // no out-links → hub 0
    Seq("l1", "l2", "l3").foreach { l =>
      assert(math.abs(got(l)._1 - 1.0 / math.sqrt(3)) < 1e-12)
      assert(got(l)._2 === 0.0)                        // no in-links → auth 0
    }
  }

  test("duplicate edges contribute multiply (bag semantics)") {
    // u links v twice, w links v once: after one sweep auth ∝ (2, 1)-ish
    // weighting flows through to hubs — checked against the reference with
    // the duplicate edge materialized twice
    val edges = Seq(("u", "v"), ("u", "v"), ("w", "v"))
    close(run(edges, 5), refHits(edges, 5))
    val got = run(edges, 5)
    assert(got("u")._1 > got("w")._1, "the double-linker must out-hub the single")
  }

  test("seeded random digraph: exact parity with the driver reference") {
    val rnd = new scala.util.Random(97)
    val n = 40
    val edges = Seq.fill(220)((s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      .filter(e => e._1 != e._2).distinct
    close(run(edges, 20), refHits(edges, 20))
  }

  test("partitioning does not change scores") {
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(120)((s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
      .filter(e => e._1 != e._2).distinct
    val base = run(edges, 12)
    val repart = Hits.compute(edges.toDF("src", "dst").repartition(7), 12)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // distributed float sums reorder under repartitioning — tolerance, not
    // bit equality, is the contract here
    assert(base.keySet === repart.keySet)
    base.foreach { case (k, (h, t)) =>
      assert(math.abs(h - repart(k)._1) < 1e-9 && math.abs(t - repart(k)._2) < 1e-9)
    }
  }
}
