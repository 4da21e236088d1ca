package graft.sample

import graft.core.{Determinism, Kb}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ForestFireSampler (reference classic_samplers.py:337-420): ignite a
  * random node; burning a node records ALL its outgoing edges
  * (classic_samplers.py:377 stores the full neighbor set) and burns
  * min(geometric(p=0.4), |unvisited nbrs|) random neighbors next; when the
  * fire dies and the sample is still short, re-ignite at a random unburned
  * node (:392-398). Because every sampled node is burned with its full edge
  * list, the materialized edge set equals the induced subgraph on the
  * sample — finalize uses the induced path.
  *
  * Spark-native split of state: the neighbor expansion is a distributed
  * broadcast-frontier ⋈ edges join with per-source geometric caps (window
  * rank); the burn bookkeeping is O(sample) and lives on the driver — the
  * sample is being collected anyway. Each round is one job over literal
  * frontier data: no lineage growth. The reference's backlog deque
  * (maxlen 100, hop 10) is a sequential artifact replaced by re-ignition;
  * the tested invariants (exact n, LP retention) are preserved by the
  * deterministic (round, hash) trim.
  *
  * LPCentralized (lpc_samplers.py:270-316): the first fire's queue is the
  * LP node list.
  */
final class ForestFireSampler(
    kb: Kb, seed: Long = 42L, p: Double = 0.4, lpSeeds: Seq[String] = Nil,
    maxRounds: Int = 10000) extends GraphSampler {

  // 16 buckets: pruning granularity vs per-round task count — every round
  // schedules one task per cached bucket partition (pruned ones finish in
  // ~ms but still schedule), so 64 buckets cost ~3× more scheduling than
  // they save in skipped bytes at any scale where the loop is job-latency
  // bound. At 100× data the per-bucket byte volume grows, not the task
  // count — the trade stays right.
  private val Buckets = 16

  def draw(n: Int): Drawn = {
    val spark = kb.spark
    val strEnc = Encoders.STRING
    def bkt(c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c), lit(Buckets)).cast("int")

    // (src, dst) neighbor pairs deduplicated ONCE outside the burn loop
    // (multi-predicate edges would otherwise force a distinct — a shuffle —
    // inside every round), BUCKETED by hash(src) and cached clustered by
    // bucket: each round filters to the frontier's buckets, so the cached
    // scan batch-prunes to ~|frontier buckets|/64 of the edge table instead
    // of re-scanning all of it every round — the 100×-scale fix for
    // level-synchronous burning. The filter is a superset of the join, so
    // results are unchanged.
    val neighbors = kb.edges.select(col("src"), col("dst")).distinct()
      .withColumn("bkt", bkt(col("src")))
      .repartition(Buckets, col("bkt"))
      .cache()
    // materialize the cache concurrently with the ignition-pool collect
    // below — the two startup jobs are independent and together dominate
    // the first round's latency
    val warmup = scala.concurrent.Future(neighbors.count())(
      scala.concurrent.ExecutionContext.global)

    // deterministic permutation for (re-)ignition picks, collected lazily in
    // blocks as needed (usually a handful of rows); buckets ride along
    lazy val ignitionPool: Array[(String, Int)] = kb.nodes
      .orderBy(Determinism.detHash(seed ^ 0x55, col("id")), col("id"))
      .limit(n + 1000) // burned ≤ n, so ≥1000 unburned candidates remain
      .select(col("id"), bkt(col("id")).as("bkt"))
      .collect().map(r => (r.getString(0), r.getInt(1)))

    // driver-side burn state: insertion order = (round, in-round hash) order
    val burned = scala.collection.mutable.LinkedHashSet.empty[String]
    // restart batch mirrors the reference's restart_hop_size=10 (it pops up
    // to 10 backlog nodes when the queue dies, classic_samplers.py:369-372)
    def ignite(k: Int = 10, excl: Set[String] = Set.empty): Seq[(String, Int)] =
      ignitionPool.iterator
        .filterNot(p => burned.contains(p._1) || excl(p._1)).take(k).toSeq

    var frontier: Seq[(String, Int)] =
      if (lpSeeds.nonEmpty)
        spark.createDataset(lpSeeds)(strEnc).toDF("id")
          .select(col("id"), bkt(col("id")).as("bkt"))
          .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      else ignite(1)
    var round = 0

    val dbg = sys.env.get("SPARK_GRAFT_FF_DEBUG").contains("1")
    var tPrev = System.nanoTime()
    while (burned.size < n && round < maxRounds && frontier.nonEmpty) {
      round += 1
      if (dbg) {
        val now = System.nanoTime()
        System.err.println(f"[ff] round=$round burned=${burned.size} frontier=${frontier.size} dt=${(now - tPrev) / 1e9}%.2f")
        tPrev = now
      }
      // burn the frontier (bounded by n — stop admitting once full)
      frontier.foreach(p => if (burned.size < n) burned += p._1)
      if (burned.size >= n) {
        frontier = Nil
      } else {
        val frontierBuckets = frontier.map(_._2).distinct
        // frontier (≤ n ids) and burned (≤ n ids) ride as codegen IN-lists
        // instead of two per-round broadcast joins: each round is then a
        // single bucket-pruned cached scan + one small window shuffle — no
        // broadcast build/cleanup jobs. Both sets are bounded by n, so the
        // literal lists stay driver-scale by construction.
        val g = Determinism.detGeometric(p, seed + 17 * round, col("src"))
        val w = Window.partitionBy(col("src"))
          .orderBy(Determinism.detHash(seed + 19 * round, col("src"), col("dst")), col("dst"))
        // burned-set filter: IN-list while small (single bucket-pruned scan,
        // no broadcast build/cleanup jobs — what keeps small draws
        // job-latency-bound), but an IN-list embeds an O(|burned|) literal
        // set in EVERY round's plan — O(rounds·n) cumulative driver /
        // plan-serialization work. Above the threshold (large draws, e.g.
        // a 10%-of-KB EvalTable sample) switch to a broadcast anti-join:
        // one broadcast of the burned ids per round, plan size O(1).
        val candidates = neighbors
          .filter(col("bkt").isInCollection(frontierBuckets) &&
            col("src").isInCollection(frontier.map(_._1)))
        val unburnt =
          if (burned.size <= ForestFireSampler.BurnedInListMax)
            candidates.filter(!col("dst").isInCollection(burned.toSeq))
          else
            candidates.join(
              broadcast(spark.createDataset(burned.toSeq)(strEnc).toDF("dst")),
              Seq("dst"), "left_anti")
        val next = unburnt
          // pre-partition the (tiny) candidate set on the window key with 8
          // partitions: the window reuses this distribution instead of a
          // 32-partition default exchange — 24 fewer sub-ms tasks per round
          .repartition(8, col("src"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= g)
          .select(col("dst"),
            Determinism.detHash(seed + 23 * round, col("dst")).as("h"),
            bkt(col("dst")).as("bkt"))
          .collect() // ≤ Σ geometric caps rows; dedup + order on the driver
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).distinct
          .sortBy { case (dst, h, _) => (h, dst) }
          .map { case (dst, _, b) => (dst, b) }.toSeq

        // Concurrent fires: the reference restarts a dying fire from its
        // visited-nodes backlog / a fresh random node, one fire at a time
        // (classic_samplers.py:365-398 — a sequential-runtime artifact).
        // The level-synchronous engine equivalent lights the replacement
        // ignition points IN THE SAME ROUND whenever the surviving frontier
        // drops below the target hop, instead of spending a whole
        // fixed-cost Spark job on a 1-node frontier. The hop scales with
        // the remaining budget (10..64): burn trajectory stays
        // fire-shaped, round count stays O(n / mean-burst) — this is what
        // keeps the loop job-latency-bound rather than round-bound at any
        // data scale. Invariants (exact n, LP retention, valid induced
        // edges, determinism per seed) are unchanged.
        val hop = math.max(16, math.min(96, (n - burned.size) / 6))
        frontier =
          if (next.size >= hop) next
          else next ++ ignite(hop - next.size, excl = next.map(_._1).toSet)
      }
    }

    scala.concurrent.Await.ready(warmup, scala.concurrent.duration.Duration.Inf)
    neighbors.unpersist()
    val sampledDf = spark.createDataset(burned.toSeq.take(n))(strEnc).toDF("id")
    Drawn(sampledDf, selectedEdges = None) // induced: see class doc
  }

  def sample(n: Int, dpp: Double = 1.0): Kb = {
    Samplers.checkInput(kb.nodes.count(), n, dpp)
    Samplers.finalizeSample(kb, draw(n), dpp, seed)
  }
}

object ForestFireSampler {
  /** Max burned-set size embedded as a per-round IN-list before switching
    * to a broadcast anti-join (see the burn loop). */
  val BurnedInListMax: Int = 4096
}
