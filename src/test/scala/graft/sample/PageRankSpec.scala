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

  test("AQE scoping never touches the caller session's conf") {
    val kb = HepatitisLikeKb.kb(spark).cache()
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key, "true")
    spark.conf.set(key, "true")
    try {
      // the loop runs with AQE off in a CLONED session; the caller's value
      // must hold even DURING compute — probe it from a concurrent thread
      @volatile var seen = List.empty[String]
      val probe = new Thread(() => {
        (1 to 20).foreach { _ =>
          seen ::= spark.conf.get(key); Thread.sleep(5)
        }
      })
      probe.start()
      val out = PageRank.compute(kb, iterations = 3, adaptive = false)
      assert(out.count() === kb.nodes.count())
      probe.join()
      assert(seen.nonEmpty && seen.forall(_ == "true"),
        s"caller conf flickered during compute: ${seen.distinct}")
      assert(spark.conf.get(key) === "true")
    } finally spark.conf.set(key, before)
  }
}
