package graft.sample

import graft.core.{Determinism, Kb}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metropolis-Hastings random walk sampler (Gjoka, Kurant, Butts,
  * Markopoulou: "Walking in Facebook: a case study of unbiased sampling of
  * OSNs", INFOCOM'10) — a BEYOND-REFERENCE member of the walk family: the
  * plain random walk's stationary distribution is ∝ degree, so RW node
  * samples over-represent hubs; the MH correction (propose a uniform
  * neighbor v, accept with probability min(1, deg(u)/deg(v)), else STAY)
  * makes the stationary distribution UNIFORM over nodes, which is what a
  * statistics-faithful node sample wants.
  *
  * The walk runs on the SYMMETRIZED neighbor relation (the setting the MH
  * correction is stated for); parallel edges keep their multiplicity in
  * both the proposal and the degree, which preserves detailed balance
  * because multiplicity is symmetric by construction. Traversed edges are
  * logged in their ORIGINAL orientation so the edge log stays a subset of
  * kb.edges (the invariant `finalizeSample` relies on).
  *
  * Same Spark split as [[WalkSampler]]: the graph stays distributed (per
  * step ONE broadcast-frontier ⋈ cached-neighbor join with windowed picks
  * and the in-plan acceptance filter); the O(walkers·steps) walk state
  * lives on the driver; rejected walkers are frontier ∖ accepted — derived
  * on the driver, no second job. All randomness is keyed by
  * (seed, step, walker, data) — identical output at any parallelism. */
final class MhrwSampler(kb: Kb, seed: Long = 42L, walkers: Int = 16,
                        maxSteps: Int = 3000) extends GraphSampler {

  def draw(n: Int): Drawn = {
    val spark = kb.spark
    val e = kb.edges.select(col("src"), col("pred"), col("dst"))
    val sym = e.select(col("src"), col("pred"), col("dst"), lit(true).as("fwd"))
      .unionAll(e.select(col("dst").as("src"), col("pred"),
        col("src").as("dst"), lit(false).as("fwd")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val nbrs = sym
      .join(deg.select(col("src").as("dst"), col("deg").as("deg_dst")), Seq("dst"))
      .join(deg, Seq("src"))
      .select(col("src"), col("pred"), col("dst"), col("fwd"),
        col("deg"), col("deg_dst"))
      .cache()

    // starts: md5-lowest edge-incident nodes (isolated nodes would strand a
    // walker forever — MHRW has no teleport)
    val starts: Seq[(Long, String)] = deg
      .orderBy(Determinism.md5Int(col("src")), col("src"))
      .limit(math.max(1, math.min(walkers, n)))
      .collect().zipWithIndex.map { case (r, i) => (i.toLong, r.getString(0)) }

    var frontier: Seq[(Long, String)] = starts
    val firstVisit = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    starts.sortBy(_._1).foreach { case (_, id) =>
      if (!firstVisit.contains(id)) firstVisit(id) = 0
    }
    val edgeLog = scala.collection.mutable.LinkedHashSet.empty[(String, String, String)]
    val tupleEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
      Encoders.STRING, Encoders.STRING, Encoders.STRING)

    var step = 0
    while (firstVisit.size < n && step < maxSteps) {
      step += 1
      val stepping = spark.createDataset(frontier)(tupleEnc).toDF("walker", "cur")
      val cand = broadcast(stepping).join(nbrs, stepping("cur") === nbrs("src"))
      val pickHash = Determinism.detHash(seed + 5 * step,
        col("walker"), col("pred"), col("dst"), col("fwd"))
      val w = Window.partitionBy(col("walker"))
        .orderBy(pickHash, col("pred"), col("dst"), col("fwd"))
      val accepted = cand
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        // MH acceptance: u < deg(cur)/deg(proposal); ratio ≥ 1 always passes
        .filter(Determinism.detRand(seed + 7 * step, col("walker")) *
          col("deg_dst") < col("deg"))
        .select(col("walker"), col("dst").as("next"),
          when(col("fwd"), col("src")).otherwise(col("dst")).as("osrc"),
          col("pred"),
          when(col("fwd"), col("dst")).otherwise(col("src")).as("odst"))
        .as[(Long, String, String, String, String)](outEnc).collect()

      val moved = accepted.map(a => a._1 -> a._2).toMap
      accepted.sortBy(_._1).foreach { case (_, next, osrc, pred, odst) =>
        edgeLog += ((osrc, pred, odst))
        if (firstVisit.size < n && !firstVisit.contains(next)) firstVisit(next) = step
      }
      // rejected proposals: the walker STAYS (the MH self-transition)
      frontier = frontier.map { case (wk, cur) => (wk, moved.getOrElse(wk, cur)) }
    }
    nbrs.unpersist()

    val sampled = firstVisit.keysIterator.take(n).toSeq
    Drawn(
      spark.createDataset(sampled)(Encoders.STRING).toDF("id"),
      Some(spark.createDataset(edgeLog.toSeq)(Encoders.tuple(
        Encoders.STRING, Encoders.STRING, Encoders.STRING)).toDF("src", "pred", "dst")))
  }

  def sample(n: Int, dpp: Double = 1.0): Kb = {
    Samplers.checkInput(kb.nodes.count(), n, dpp)
    Samplers.finalizeSample(kb, draw(n), dpp, seed)
  }
}
