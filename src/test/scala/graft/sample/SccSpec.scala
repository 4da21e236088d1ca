package graft.sample

import graft.SparkSpec

class SccSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side Tarjan (iterative, explicit stack) as ground truth;
    * components labeled by their max member to match the engine. */
  private def tarjan(nodes: Seq[String], edges: Seq[(String, String)])
  : Map[String, String] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val index = scala.collection.mutable.Map.empty[String, Int]
    val low = scala.collection.mutable.Map.empty[String, Int]
    val onStack = scala.collection.mutable.Set.empty[String]
    val stack = scala.collection.mutable.Stack.empty[String]
    val out = scala.collection.mutable.Map.empty[String, String]
    var counter = 0
    def strongConnect(v0: String): Unit = {
      // iterative DFS: frames of (node, remaining successors)
      val work = scala.collection.mutable.Stack((v0, adj.getOrElse(v0, Seq.empty).iterator))
      index(v0) = counter; low(v0) = counter; counter += 1
      stack.push(v0); onStack += v0
      while (work.nonEmpty) {
        val (v, it) = work.top
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack.push(w); onStack += w
            work.push((w, adj.getOrElse(w, Seq.empty).iterator))
          } else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          work.pop()
          if (work.nonEmpty) {
            val (p, _) = work.top
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.Buffer.empty[String]
            var w = ""
            while ({ w = stack.pop(); onStack -= w; comp += w; w != v }) ()
            val label = comp.max
            comp.foreach(m => out(m) = label)
          }
        }
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strongConnect(v))
    out.toMap
  }

  private def run(nodes: Seq[String], edges: Seq[(String, String)])
  : Map[String, String] = {
    val n = nodes.toDF("id")
    val e = if (edges.isEmpty)
      Seq.empty[(String, String)].toDF("src", "dst") else edges.toDF("src", "dst")
    Scc.compute(e, n).collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("hand case: two cycles bridged one-way stay separate components") {
    // a→b→c→a and x→y→x, bridge c→x (one-way: no merge)
    val nodes = Seq("a", "b", "c", "x", "y")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "x"), ("c", "x"))
    val got = run(nodes, edges)
    assert(got === Map("a" -> "c", "b" -> "c", "c" -> "c", "x" -> "y", "y" -> "y"))
  }

  test("DAG: every node is its own singleton component") {
    val nodes = Seq("r", "s", "t", "u")
    val edges = Seq(("r", "s"), ("r", "t"), ("s", "u"), ("t", "u"))
    val got = run(nodes, edges)
    assert(got === nodes.map(n => n -> n).toMap)
  }

  test("descending chain (the coloring worst case) still peels correctly") {
    // v5→v4→…→v1: every node colors to v5, one singleton peels per round
    val nodes = (1 to 5).map(i => s"v$i")
    val edges = (2 to 5).map(i => (s"v$i", s"v${i - 1}"))
    assert(run(nodes, edges) === nodes.map(n => n -> n).toMap)
  }

  test("permutation graph: cycles recovered exactly") {
    // i → (i+6) mod 48: gcd(6,48)=6 cycles of length 8
    val nodes = (0 until 48).map(_.toString)
    val edges = (0 until 48).map(i => (i.toString, ((i + 6) % 48).toString))
    val got = run(nodes, edges)
    assert(got === tarjan(nodes, edges))
    assert(got.values.toSet.size === 6)
  }

  test("seeded random digraphs: exact parity with driver Tarjan") {
    for (seed <- Seq(7, 41, 97)) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val nodes = (0 until n).map(i => f"n$i%02d")
      val edges = Seq.fill(80)((nodes(rnd.nextInt(n)), nodes(rnd.nextInt(n))))
        .filter(e => e._1 != e._2).distinct
      assert(run(nodes, edges) === tarjan(nodes, edges), s"seed $seed")
    }
  }

  test("isolated nodes and empty edge set") {
    assert(run(Seq("a", "b"), Seq.empty) === Map("a" -> "a", "b" -> "b"))
  }

  private def layers(nodes: Seq[String], edges: Seq[(String, String)])
  : Map[String, (String, Long)] = {
    val n = nodes.toDF("id")
    val e = if (edges.isEmpty)
      Seq.empty[(String, String)].toDF("src", "dst") else edges.toDF("src", "dst")
    Scc.dagLayers(e, n).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
  }

  test("dagLayers: LONGEST path wins, not BFS — chain plus shortcut") {
    // a→b→c→d and a→d: layer(d) = 3 (via the chain), never 1
    val got = layers(Seq("a", "b", "c", "d"),
      Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")))
    assert(got.view.mapValues(_._2).toMap ===
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
  }

  test("dagLayers: diamond depths; isolated node layer 0") {
    val got = layers(Seq("a", "b", "c", "d", "z"),
      Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")))
    assert(got.view.mapValues(_._2).toMap ===
      Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L, "z" -> 0L))
  }

  test("dagLayers: a cycle condenses to ONE layer-coordinate for its members") {
    // a⇄b (one SCC, label max = b) feeding c: both a and b sit at layer 0
    // under scc b; c at layer 1
    val got = layers(Seq("a", "b", "c"),
      Seq(("a", "b"), ("b", "a"), ("b", "c")))
    assert(got === Map("a" -> (("b", 0L)), "b" -> (("b", 0L)),
      "c" -> (("c", 1L))))
  }

  test("dagLayers: partitioning invariance") {
    val n = Seq("a", "b", "c", "d").toDF("id")
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")).toDF("src", "dst")
    val p1 = Scc.dagLayers(e.repartition(1), n.repartition(1)).collect().toSet
    val p7 = Scc.dagLayers(e.repartition(7), n.repartition(5)).collect().toSet
    assert(p1 === p7)
  }

  test("partitioning does not change the decomposition") {
    val rnd = new scala.util.Random(5)
    val nodes = (0 until 20).map(i => f"n$i%02d")
    val edges = Seq.fill(50)((nodes(rnd.nextInt(20)), nodes(rnd.nextInt(20))))
      .filter(e => e._1 != e._2).distinct
    val base = run(nodes, edges)
    val repart = Scc.compute(
      edges.toDF("src", "dst").repartition(7), nodes.toDF("id").repartition(3))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(base === repart)
  }
}
