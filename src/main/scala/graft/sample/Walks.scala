package graft.sample

import graft.core.{Determinism, Kb}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The random-walk sampler family (reference classic_samplers.py:106-334 +
  * the LPF/LPC variants), one engine:
  *
  *  - RW   (jumpProb=None, prioritized=false)
  *  - RWJ  (jumpProb=Some(p)): Bernoulli(p) teleport each step
  *  - RWP  (prioritized=true): neighbor chosen with prob ∝ PageRank
  *    (reference get_prioritized_neighbor is a *weighted random* choice,
  *    _base.py:105 — not argmax)
  *  - RWJP (both)
  *  - LPFirst: walkers start on the LP nodes (lpf_samplers.py:68-85)
  *  - LPCentralized: teleports restricted to the LP tier set, escalating
  *    LP → 1-hop → 2-hop → all when stalled 0.05·|V| steps
  *    (lpc_samplers.py:89-116,158-169)
  *
  * Spark-native form: B parallel walkers advanced level-synchronously; each
  * step is one frontier⋈edges join + per-walker seeded pick (window rank) +
  * teleport join against a cached node index. The reference's single walker
  * is sequential by nature; the parity contract is its tests' invariants —
  * exact node counts, LP retention — enforced by the deterministic
  * arrival-order trim (SURVEY §7.3 #1). All randomness is keyed by
  * (walker, step, data) under the seed: identical output at any parallelism.
  *
  * Dead ends teleport uniformly and record no edge
  * (classic_samplers.py:121-127: Neighbor(None, random)).
  */
final class WalkSampler(
    kb: Kb, seed: Long = 42L, jumpProb: Option[Double] = None,
    prioritized: Boolean = false, lpSeeds: Seq[String] = Nil, lpc: Boolean = false,
    walkers: Int = 16, checkpointEvery: Int = 8, maxSteps: Int = 2000,
    prIterations: Int = 100)
  extends GraphSampler {

  def draw(n: Int): Drawn = {
    val spark = kb.spark
    val edges = kb.edges.cache()
    val nTotal = kb.nodes.count()

    // teleport index: tier-ordered for LPC (tier 0 first), random otherwise;
    // trn ∈ [1, N] dense — teleport = join on a drawn rank
    val tiers =
      if (lpc) Samplers.lpcTiers(kb, lpSeeds)
      else kb.nodes.select(col("id"), lit(0).as("tier"))
    val nodesIdx = tiers.select(col("id"), col("tier"),
        row_number().over(Window.orderBy(col("tier"),
          Determinism.detHash(seed ^ 0x77, col("id")), col("id"))).as("trn"))
      .cache()
    // tier boundaries for LPC escalation (4 rows, driver-side)
    val tierCum: Array[Long] =
      if (lpc) {
        val counts = nodesIdx.groupBy("tier").agg(count(lit(1)).as("c"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        (0 to 3).map(t => (0 to t).map(counts.getOrElse(_, 0L)).sum).toArray
      } else Array(nTotal, nTotal, nTotal, nTotal)

    val ranks =
      if (prioritized)
        PageRank.compute(kb, iterations = prIterations).select(col("id").as("dst"), col("pr").as("w"))
      else null

    // walkers: start on LP nodes when given (all of them), else the first
    // min(walkers, n) nodes of the deterministic permutation (the reference
    // starts at the arbitrary first node of set-iteration order,
    // classic_samplers.py:116)
    val starts: DataFrame =
      if (lpSeeds.nonEmpty)
        spark.createDataset(lpSeeds.zipWithIndex.map { case (id, i) => (i.toLong, id) })(
          Encoders.tuple(Encoders.scalaLong, Encoders.STRING)).toDF("walker", "cur")
      else {
        val w = math.max(1, math.min(walkers, n))
        nodesIdx.orderBy(col("trn")).limit(w)
          .select((col("trn") - 1).cast("long").as("walker"), col("id").as("cur"))
      }

    var frontier = starts.localCheckpoint(true)
    var visited = frontier.select(col("cur").as("id"), lit(0).as("step"),
      col("walker").as("word")).localCheckpoint(true)
    var edgeLog = spark.createDataset(Seq.empty[(String, String, String)])(
      Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING))
      .toDF("src", "pred", "dst")

    var step = 0
    var distinctCount = visited.select("id").distinct().count()
    var lastCount = distinctCount
    var stall = 0L
    var esc = if (lpc) 0 else 3
    val stallThreshold = math.max(1L, (0.05 * nTotal).toLong)

    while (distinctCount < n && step < maxSteps) {
      step += 1
      val f = broadcast(frontier)

      // jump decisions (RWJ/RWJP)
      val jumping = jumpProb match {
        case Some(p) => f.filter(
          Determinism.detRand(seed + 3 * step, col("walker")) < p)
        case None => f.limit(0)
      }
      val stepping = jumpProb match {
        case Some(p) => f.filter(
          Determinism.detRand(seed + 3 * step, col("walker")) >= p)
        case None => f
      }

      // neighbor candidates for stepping walkers
      val cand = stepping.join(edges, stepping("cur") === edges("src"))
        .select(col("walker"), col("src"), col("pred"), col("dst"))
      val pickHash = Determinism.detHash(seed + 5 * step, col("walker"), col("pred"), col("dst"))
      val picks =
        if (!prioritized) {
          val w = Window.partitionBy(col("walker")).orderBy(pickHash, col("pred"), col("dst"))
          cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        } else {
          // weighted choice ∝ pagerank of the neighbor (reference _base.py:96-106)
          val ww = Window.partitionBy(col("walker"))
          val wo = ww.orderBy(pickHash, col("pred"), col("dst"))
          val withW = cand.join(ranks, Seq("dst")).withColumn("cum",
              sum(col("w")).over(wo.rowsBetween(Window.unboundedPreceding, 0)))
            .withColumn("tot", sum(col("w")).over(ww))
            .withColumn("u", Determinism.detRand(seed + 7 * step, col("walker")))
          withW.filter(col("cum") >= col("u") * col("tot"))
            .withColumn("rn", row_number().over(Window.partitionBy(col("walker"))
              .orderBy(col("cum"), col("pred"), col("dst"))))
            .filter(col("rn") === 1)
            .select(col("walker"), col("src"), col("pred"), col("dst"))
        }

      // dead ends (no outgoing edges) teleport, recording no edge
      val deadEnds = stepping.join(picks.select("walker"), Seq("walker"), "left_anti")
      val teleporters = jumping.select("walker", "cur").unionAll(deadEnds.select("walker", "cur"))
      val allowed = tierCum(esc)
      val teleports = teleporters
        .withColumn("trn", (pmod(Determinism.detHash(seed + 11 * step, col("walker")),
          lit(allowed)) + 1).cast("int"))
        .join(nodesIdx.select("id", "trn"), Seq("trn"))
        .select(col("walker"), col("id").as("cur"))

      val newFrontier = picks.select(col("walker"), col("dst").as("cur"))
        .unionAll(teleports)

      edgeLog = edgeLog.unionAll(picks.select("src", "pred", "dst"))
      visited = visited.unionAll(newFrontier.select(col("cur").as("id"),
        lit(step).as("step"), col("walker").as("word")))
      frontier = newFrontier

      if (step % checkpointEvery == 0) {
        frontier = frontier.localCheckpoint(true)
        visited = visited.localCheckpoint(true)
        edgeLog = edgeLog.localCheckpoint(true)
      } else {
        frontier = frontier.localCheckpoint(true) // frontier is tiny; always cut
      }

      distinctCount = visited.select("id").distinct().count()
      // LPC stall escalation (lpc_samplers.py:166-169)
      if (lpc) {
        if (distinctCount == lastCount) stall += 1 else stall = 0
        if (stall >= stallThreshold && esc < 3) { esc += 1; stall = 0 }
        lastCount = distinctCount
      }
    }

    // arrival-order trim to exactly n distinct nodes
    val arrival = visited.groupBy("id")
      .agg(min(struct(col("step"), col("word"))).as("fv"))
      .select(col("id"), col("fv.step").as("step"), col("fv.word").as("word"))
    val sampled = arrival.orderBy(col("step"), col("word"), col("id"))
      .select("id").limit(n)
    nodesIdx.unpersist()
    Drawn(sampled, Some(edgeLog.distinct()))
  }

  def sample(n: Int, dpp: Double = 1.0): Kb = {
    Samplers.checkInput(kb.nodes.count(), n, dpp)
    Samplers.finalizeSample(kb, draw(n), dpp, seed)
  }
}
