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

  test("computeFrom: cold start converges to compute's fixed point; warm start saves sweeps") {
    // a 6-cycle with a chord and a dangler — cyclic, so Jacobi needs real
    // contraction rounds and a warm start has something to save
    import spark.implicits._
    val edges = ((0 until 6).map(i => (s"v$i", "l", s"v${(i + 1) % 6}")) ++
      Seq(("v0", "l", "v3"), ("v2", "l", "d0"))).toDF("src", "pred", "dst")
    val nodes = ((0 until 6).map(i => s"v$i") :+ "d0").toDF("id")
    val kb = HepatitisLikeKb.kb(spark).copy(nodes = nodes, edges = edges)
    val empty = nodes.select(col("id"), lit(1.0).as("pr")).limit(0)
    val (cold, sCold) = PageRank.computeFrom(kb, empty, tol = 1e-12, maxSweeps = 500)
    val fixed = PageRank.compute(kb, iterations = 300)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cold.collect().foreach(r =>
      assert(math.abs(r.getDouble(1) - fixed(r.getString(0))) < 1e-9))
    // warm start from the fixed point itself: one verification sweep
    val (warm, sWarm) = PageRank.computeFrom(kb, cold, tol = 1e-12, maxSweeps = 500)
    assert(sWarm < sCold && sWarm <= 2, s"warm=$sWarm cold=$sCold")
    warm.collect().foreach(r =>
      assert(math.abs(r.getDouble(1) - fixed(r.getString(0))) < 1e-9))
    // nodes missing from init start at 1.0 — empty init IS the cold start
    assert(sCold > 5)
  }

  test("weighted pagerank equals edge-replicated multigraph ranks") {
    import spark.implicits._
    // integer multiplicities replicated row-by-row must give the same
    // fixed-point trajectory as the weighted form (w/Σw == k copies of
    // 1/outdeg over the same groups)
    val mult = Seq(("a", "b", 3), ("b", "c", 2), ("c", "a", 1), ("a", "c", 2),
      ("d", "a", 4)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "c", "d").toDF("id")
    val replicated = mult.as[(String, String, Int)].flatMap {
      case (s, d, k) => Seq.fill(k)((s, "p", d)) }.toDF("src", "pred", "dst")
    val kb = graft.core.Kb(nodes, replicated,
      attrs = graft.core.Kb.empty(spark).attrs,
      types = graft.core.Kb.empty(spark).types,
      tbox = graft.core.Tbox.empty)
    for (iters <- Seq(1, 5, 20)) {
      val w = PageRank.computeWeighted(nodes, mult, iterations = iters)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val rep = PageRank.compute(kb, iterations = iters)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(w.keySet === rep.keySet)
      w.foreach { case (id, v) =>
        assert(math.abs(v - rep(id)) < 1e-12, s"$id at iters=$iters: $v vs ${rep(id)}") }
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

  /** naive personalized Jacobi reference: pr = d·s + (1−d)·in-mass */
  private def naivePpr(kb: graft.core.Kb, seeds: Seq[String], d: Double,
                       iters: Int): Map[String, Double] = {
    val outdeg = kb.edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = kb.edges.select("src", "dst").join(outdeg, Seq("src"))
    val s = when(col("id").isin(seeds: _*), lit(1.0 / seeds.size)).otherwise(lit(0.0))
    var ranks: DataFrame = kb.nodes.select(col("id"), s.as("pr"))
    for (_ <- 1 to iters) {
      val contrib = adj.join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("mass"))
      ranks = kb.nodes.join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left_outer")
        .select(col("id"), (lit(d) * s + lit(1 - d) * coalesce(col("mass"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
    }
    ranks.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("personalized PageRank matches the naive Jacobi reference") {
    val kb = HepatitisLikeKb.kb(spark).cache()
    val seeds = Seq("p1", "p2")
    for (iters <- Seq(1, 3)) {
      val fast = PageRank.personalized(kb, seeds, iterations = iters)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val slow = naivePpr(kb, seeds, 0.15, iters)
      assert(fast.keySet === slow.keySet)
      fast.foreach { case (id, v) =>
        assert(math.abs(v - slow(id)) < 1e-12, s"$id at iters=$iters: $v vs ${slow(id)}")
      }
    }
  }

  test("PPR locality: nodes the seed cannot reach hold exactly 0; mass leaks to ≤ 1") {
    val kb = graft.fixtures.FamilyKb.kb(spark).cache()
    val ppr = PageRank.personalized(kb, Seq("m1"), iterations = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // m1's forward closure: m1's children and their descendants; f1/f5/f6
    // and the isolated x2..x4 are unreachable
    Seq("f1", "f5", "f6", "x2", "x3", "x4").foreach { id =>
      assert(ppr(id) == 0.0, s"$id unreachable from m1 but pr=${ppr(id)}")
    }
    assert(ppr("m1") > 0.0 && ppr("m2") > 0.0 && ppr("f2") > 0.0)
    assert(ppr.values.sum <= 1.0 + 1e-12)
    // seed share strictly exceeds the uniform share — the locality property
    assert(ppr("m1") / ppr.values.sum > 1.0 / kb.nodes.count())
  }
}
