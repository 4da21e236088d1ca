package graft.sample

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoruvkaSpec extends SparkSpec {
  import spark.implicits._

  private def run(es: Seq[(String, String, Long)]): Set[(String, String, Long)] =
    Boruvka.minimumSpanningForest(es.toDF("u", "v", "w")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  /** driver Kruskal under the same (w, u, v) total order — the unique
    * greedy forest the parallel rounds must reproduce */
  private def kruskal(es: Seq[(String, String, Long)]): Set[(String, String, Long)] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(String, String, Long)]
    for (e <- es.sortBy(t => (t._3, t._1, t._2))) {
      val (ru, rv) = (find(e._1), find(e._2))
      if (ru != rv) { parent(ru) = rv; out += e }
    }
    out.toSet
  }

  test("cycle: MSF = all edges minus the heaviest") {
    val cyc = Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "d", 9L), ("a", "d", 4L))
    assert(run(cyc) === cyc.toSet - (("c", "d", 9L)))
  }

  test("two components stay two trees; duplicate edge keeps min weight") {
    val es = Seq(("a", "b", 5L), ("b", "c", 2L), ("a", "c", 7L),
      ("x", "y", 1L), ("a", "b", 9L))
    assert(run(es) === Set(("a", "b", 5L), ("b", "c", 2L), ("x", "y", 1L)))
  }

  test("seeded random graphs: exact Kruskal parity, forest size = n − comps") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val es = (0 until 250).map { _ =>
        val i = rnd.nextInt(50); val j = rnd.nextInt(50)
        (s"n$i", s"n$j", rnd.nextInt(100).toLong)
      }.filter(p => p._1 != p._2)
        .map(p => if (p._1 < p._2) p else (p._2, p._1, p._3))
        .groupBy(p => (p._1, p._2)).map(_._2.minBy(_._3)).toSeq
      val got = run(es)
      assert(got === kruskal(es), s"trial $trial")
      // |forest| = n − number of components (spanning, acyclic)
      val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct
      val parent = scala.collection.mutable.Map.empty[String, String]
      def find(x: String): String = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach(e => if (find(e._1) != find(e._2)) parent(find(e._1)) = find(e._2))
      val comps = nodes.map(find).distinct.size
      assert(got.size === nodes.size - comps, s"trial $trial size")
    }
  }

  test("ties on weight broken by (u, v); partitioning invariance") {
    // triangle, all weights equal: greedy keeps (a,b) then (a,c)
    val tri = Seq(("a", "b", 5L), ("a", "c", 5L), ("b", "c", 5L))
    assert(run(tri) === Set(("a", "b", 5L), ("a", "c", 5L)))
    val df = (0 until 120).map { i =>
      (s"m${i % 17}", s"m${(i * 7 + 3) % 17}", (i % 13).toLong)
    }.filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else (p._2, p._1, p._3))
      .groupBy(p => (p._1, p._2)).map(_._2.minBy(_._3)).toSeq.toDF("u", "v", "w")
    val p1 = Boruvka.minimumSpanningForest(df.repartition(1)).collect().toSet
    val p7 = Boruvka.minimumSpanningForest(df.repartition(7)).collect().toSet
    assert(p1 === p7)
  }
}
