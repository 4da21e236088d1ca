package graft.sample

import graft.core.Kb
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank as the reference computes it (ontosample/_base.py:41-51 +
  * classic_samplers.py:239-259): ranks start at 1.0, and each sweep sets
  *   pr(v) = d/n + (1−d) · Σ_{u→v} pr(u)/outdeg(u)   with d = 0.15.
  * Dangling mass leaks (no redistribution), duplicate assertions contribute
  * multiply — both preserved here.
  *
  * The reference sweeps in-place (Gauss–Seidel); Spark iterations are
  * synchronous (Jacobi) joins + groupBy-sum converging to the same fixed
  * point — at 100 iterations both sit at the fixed point, and downstream use
  * is a *weighted random* choice, so trajectory differences are immaterial
  * (SURVEY §7.3 #2).
  *
  * Scale: each iteration is one shuffle on `dst`; lineage is truncated with
  * localCheckpoint every `checkpointEvery` iterations (north-rule iterative
  * self-join discipline).
  */
object PageRank {

  def compute(kb: Kb, d: Double = 0.15, iterations: Int = 100,
              checkpointEvery: Int = 10): DataFrame = {
    val n = kb.nodes.count().toDouble
    val outdeg = kb.edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — reused every iteration, cache once
    val adj = kb.edges.select("src", "dst").join(outdeg, Seq("src")).cache()
    adj.count() // materialize

    var ranks = kb.nodes.select(col("id"), lit(1.0).as("pr"))
    var i = 0
    while (i < iterations) {
      val contrib = adj
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("mass"))
      val next = kb.nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left_outer")
        .select(col("id"),
          (lit(d / n) + lit(1 - d) * coalesce(col("mass"), lit(0.0))).as("pr"))
      ranks = if ((i + 1) % checkpointEvery == 0) next.localCheckpoint(true) else next
      i += 1
    }
    val out = ranks.localCheckpoint(true)
    adj.unpersist()
    out
  }
}
