package graft.sample

import graft.core.{Determinism, Kb}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ForestFireSampler (reference classic_samplers.py:337-420): ignite a
  * random node; burning a node records ALL its outgoing edges
  * (classic_samplers.py:377 stores the full neighbor set) and burns
  * min(geometric(p=0.4), |unvisited nbrs|) random neighbors next; when the
  * fire dies and the sample is still short, re-ignite at a random unburned
  * node (:392-398). Because every sampled node is burned with its full edge
  * list, the materialized edge set equals the induced subgraph on the
  * sample — so finalize uses the induced path.
  *
  * Spark-native form: level-synchronous burning — the whole frontier burns
  * per round (one join + per-source geometric cap via window rank); the
  * backlog deque (maxlen 100, hop 10) is a sequential artifact the batch
  * engine replaces with re-ignition — the reference's tested invariants
  * (exact n nodes, LP retention for the LPC variant) are preserved via the
  * deterministic (round, hash) trim.
  *
  * LPCentralized (lpc_samplers.py:270-316): the first fire's queue is the
  * LP node list.
  */
final class ForestFireSampler(
    kb: Kb, seed: Long = 42L, p: Double = 0.4, lpSeeds: Seq[String] = Nil,
    checkpointEvery: Int = 8, maxRounds: Int = 2000) extends GraphSampler {

  def draw(n: Int): Drawn = {
    val spark = kb.spark
    val edges = kb.edges.cache()

    def igniteFrom(pool: DataFrame, round: Int): DataFrame =
      pool.orderBy(Determinism.detHash(seed + 13 * round, col("id")), col("id"))
        .select("id").limit(1)

    var frontier =
      if (lpSeeds.nonEmpty)
        spark.createDataset(lpSeeds)(Encoders.STRING).toDF("id")
      else igniteFrom(kb.nodes, 0)
    frontier = frontier.localCheckpoint(true)

    var burned = frontier.select(col("id"), lit(0).as("step"),
      Determinism.detHash(seed ^ 0x99, col("id")).as("ord")).localCheckpoint(true)
    var burnedCount = burned.count()
    var round = 0

    while (burnedCount < n && round < maxRounds) {
      round += 1
      // neighbors of the burning frontier, minus already-burned
      val nbrs = broadcast(frontier).withColumnRenamed("id", "src")
        .join(edges, Seq("src"))
        .select(col("src"), col("dst"))
        .join(burned.select("id").withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .distinct()
      // per source: burn min(geometric(p), available) random neighbors
      val g = Determinism.detGeometric(p, seed + 17 * round, col("src"))
      val w = Window.partitionBy(col("src"))
        .orderBy(Determinism.detHash(seed + 19 * round, col("src"), col("dst")), col("dst"))
      var next = nbrs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= g)
        .select(col("dst").as("id")).distinct()
        .join(burned.select("id"), Seq("id"), "left_anti")

      if (next.isEmpty) {
        // fire died: re-ignite at a random unburned node (:392-398)
        val remaining = kb.nodes.join(burned.select("id"), Seq("id"), "left_anti")
        next = igniteFrom(remaining, round)
      }
      frontier = next.localCheckpoint(true)
      burned = burned.unionAll(frontier.select(col("id"), lit(round).as("step"),
        Determinism.detHash(seed ^ 0x99, col("id")).as("ord")))
      if (round % checkpointEvery == 0) burned = burned.localCheckpoint(true)
      burnedCount = burned.count() // ids are distinct by construction
    }

    val sampled = burned.orderBy(col("step"), col("ord"), col("id"))
      .select("id").limit(n)
    Drawn(sampled, selectedEdges = None) // induced: see class doc
  }

  def sample(n: Int, dpp: Double = 1.0): Kb = {
    Samplers.checkInput(kb.nodes.count(), n, dpp)
    Samplers.finalizeSample(kb, draw(n), dpp, seed)
  }
}
