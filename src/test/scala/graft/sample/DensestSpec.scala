package graft.sample

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DensestSpec extends SparkSpec {
  import spark.implicits._

  private def run(df: DataFrame): Map[String, (Int, Boolean)] =
    Densest.densestSubgraph(df).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2))).toMap

  // K10 diluted by a 30-vertex pendant path: ρ(G) = 75/40 = 1.875, so the
  // round-0 rule deg·n ≤ 4e keeps exactly the K10 (deg ≥ 9 > 7.5); the
  // surviving K10 peels at round 1 with density 4.5 — the best round
  private lazy val k10path = {
    val k10 = for { i <- 0 until 10; j <- i + 1 until 10 } yield (f"k$i%02d", f"k$j%02d")
    val path = (0 until 30).map(i =>
      (if (i == 0) "k00" else f"p${i - 1}%02d", f"p$i%02d"))
    (k10 ++ path).toDF("u", "v")
  }

  test("K10 + pendant path: the clique is the densest core, hand-traced rounds") {
    val m = run(k10path)
    assert(m.size === 40)
    (0 until 10).foreach { i =>
      assert(m(f"k$i%02d") === ((1, true)), s"k$i")
    }
    (0 until 30).foreach { i =>
      assert(m(f"p$i%02d") === ((0, false)), s"p$i")
    }
  }

  test("single edge: both endpoints peel at round 0 and ARE the densest set") {
    val m = run(Seq(("x", "y")).toDF("u", "v"))
    assert(m === Map("x" -> ((0, true)), "y" -> ((0, true))))
  }

  test("returned set is at least as dense as the whole graph (seeded random)") {
    val rnd = new scala.util.Random(42)
    val es = (0 until 300).map(_ => (s"n${rnd.nextInt(60)}", s"n${rnd.nextInt(60)}"))
      .filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else p.swap).distinct
    val g = es.toDF("u", "v")
    val out = Densest.densestSubgraph(g)
    val core = out.filter(col("in_densest")).select(col("id")).collect()
      .map(_.getString(0)).toSet
    val eCore = es.count(p => core(p._1) && core(p._2)).toLong
    val eAll = es.size.toLong
    val nAll = es.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong
    // density(core) ≥ density(G): round 0's candidate set IS the whole graph
    assert(eCore * nAll >= eAll * core.size,
      s"core $eCore/${core.size} vs graph $eAll/$nAll")
    // every vertex appears exactly once in the peel log
    assert(out.count() === nAll)
  }

  test("partitioning invariance") {
    val a = Densest.densestSubgraph(k10path.repartition(1)).collect().toSet
    val b = Densest.densestSubgraph(k10path.repartition(7)).collect().toSet
    assert(a === b)
  }

  test("maxRounds guard raises") {
    intercept[IllegalArgumentException](
      Densest.densestSubgraph(k10path, maxRounds = 1))
  }
}
