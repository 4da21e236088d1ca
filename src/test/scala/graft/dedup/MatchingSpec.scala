package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MatchingSpec extends SparkSpec {
  import spark.implicits._

  private def run(ps: (String, String, Long)*): Set[(String, String, Long)] =
    Dedup.maximalMatching(ps.toSeq.toDF("a", "b", "w")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  /** the sequential greedy the parallel rounds must reproduce */
  private def greedy(ps: Seq[(String, String, Long)]): Set[(String, String, Long)] = {
    val taken = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.Set.empty[(String, String, Long)]
    for (p <- ps.sortBy(t => (-t._3, t._1, t._2))
         if !taken(p._1) && !taken(p._2)) {
      taken += p._1; taken += p._2; out += p
    }
    out.toSet
  }

  test("hand chain: best pair blocks its neighbor, next one recovers") {
    assert(run(("a", "b", 5L), ("b", "c", 4L), ("c", "d", 3L)) ===
      Set(("a", "b", 5L), ("c", "d", 3L)))
  }

  test("weight tie broken by (a, b) order; dup pair keeps max weight") {
    assert(run(("a", "c", 5L), ("a", "b", 5L)) === Set(("a", "b", 5L)))
    assert(run(("a", "b", 2L), ("a", "b", 7L)) === Set(("a", "b", 7L)))
  }

  test("decreasing chain (adversarial round count) still matches greedily") {
    assert(run(("a", "b", 10L), ("b", "c", 9L), ("c", "d", 8L), ("d", "e", 7L)) ===
      Set(("a", "b", 10L), ("c", "d", 8L)))
  }

  test("seeded random pairs: exact parity with sequential greedy; maximal; 1:1") {
    val rnd = new scala.util.Random(13)
    val ps = (0 until 150).map { _ =>
      val x = s"n${rnd.nextInt(40)}"; val y = s"n${rnd.nextInt(40)}"
      (x, y, rnd.nextInt(20).toLong)
    }.filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else (p._2, p._1, p._3))
      .groupBy(p => (p._1, p._2)).map(_._2.maxBy(_._3)).toSeq
    val got = run(ps: _*)
    assert(got === greedy(ps))
    // 1:1 — no endpoint twice
    val ends = got.toSeq.flatMap(p => Seq(p._1, p._2))
    assert(ends.distinct.size === ends.size)
    // maximal — every unmatched pair conflicts with a winner
    val taken = ends.toSet
    ps.filterNot(got.contains).foreach { p =>
      assert(taken(p._1) || taken(p._2), s"pair $p addable — not maximal")
    }
  }

  test("partitioning invariance; empty input") {
    val df = Seq(("a", "b", 5L), ("b", "c", 4L), ("x", "y", 9L)).toDF("a", "b", "w")
    val p1 = Dedup.maximalMatching(df.repartition(1)).collect().toSet
    val p7 = Dedup.maximalMatching(df.repartition(7)).collect().toSet
    assert(p1 === p7)
    assert(Dedup.maximalMatching(df.limit(0)).collect().isEmpty)
  }
}
