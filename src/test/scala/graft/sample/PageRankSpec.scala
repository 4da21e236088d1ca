package graft.sample

import graft.SparkSpec
import graft.fixtures.HepatitisLikeKb
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  /** generic Jacobi reference implementation (no source-only shortcut) */
  private def naive(kb: graft.core.Kb, d: Double, iters: Int): Map[String, Double] = {
    val n = kb.nodes.count().toDouble
    val outdeg = kb.edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = kb.edges.select("src", "dst").join(outdeg, Seq("src"))
    var ranks: DataFrame = kb.nodes.select(col("id"), lit(1.0).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = adj.join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("mass"))
      ranks = kb.nodes.join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left_outer")
        .select(col("id"), (lit(d / n) + lit(1 - d) * coalesce(col("mass"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
    }
    ranks.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("source-only shortcut matches the generic Jacobi iteration") {
    val kb = HepatitisLikeKb.kb(spark).cache()
    for (iters <- Seq(1, 2, 7)) {
      val fast = PageRank.compute(kb, iterations = iters)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val slow = naive(kb, 0.15, iters)
      assert(fast.keySet === slow.keySet)
      fast.foreach { case (id, v) =>
        assert(math.abs(v - slow(id)) < 1e-12, s"$id at iters=$iters: $v vs ${slow(id)}")
      }
    }
  }
}
