package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web bowtie decomposition (Broder et al., "Graph structure in the web",
  * WWW'00 §3): partition a directed graph into
  *
  *   CORE     — the largest SCC
  *   IN       — reaches CORE, not reachable from it
  *   OUT      — reachable from CORE, does not reach it
  *   TUBE     — on an IN→OUT path avoiding CORE
  *   TENDRIL  — hangs off IN (reachable from IN) or leads into OUT
  *              (reaches OUT) without the other end
  *   DISC     — none of the above
  *
  * — the canonical macro-structure report of a crawl (the original paper
  * measured ~28% CORE / 21% IN / 21% OUT on the 1999 AltaVista crawl).
  *
  * Composition of the engine's existing primitives: [[Scc.compute]] for
  * the core (coloring/peel — keyed joins, O(condensation-depth) rounds),
  * then four multi-source semi-naive reachability sweeps (forward/backward
  * from CORE, forward from IN, backward from OUT). Each sweep is one
  * keyed join + anti per round, rounds bounded by the graph diameter,
  * frontier/visited state localCheckpointed so lineage never grows — the
  * same 100-TB shape as ConnectedComponents/Scc. Nothing is ever
  * collected to the driver; region labels fall out of anti-join algebra
  * over the five node sets.
  */
object Bowtie {

  /** edges(src, dst), nodes(id) → (id, region). Every node appears exactly
    * once. Ties for the largest SCC break on the max scc id (deterministic
    * at any parallelism). */
  def regions(edges0: DataFrame, nodes0: DataFrame, maxRounds: Int = 64): DataFrame = {
    val edges = edges0.select("src", "dst").distinct()
      .filter(col("src") =!= col("dst")).localCheckpoint(true)
    val nodes = nodes0.select(col("id")).distinct().localCheckpoint(true)

    val scc = Scc.compute(edges, nodes, maxRounds).localCheckpoint(true)
    // largest SCC, ties → max id: one aggregate, one driver row
    val coreRow = scc.groupBy(col("scc")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("scc").desc).limit(1).head()
    val coreId = coreRow.getString(0)
    val core = scc.filter(col("scc") === coreId).select(col("id")).localCheckpoint(true)

    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
    val fwdCore = reach(edges, core, maxRounds)
    val bwdCore = reach(rev, core, maxRounds)
    val outSet = fwdCore.join(core, Seq("id"), "anti").localCheckpoint(true)
    val inSet = bwdCore.join(core, Seq("id"), "anti").localCheckpoint(true)
    val rest = nodes.join(core, Seq("id"), "anti")
      .join(outSet, Seq("id"), "anti")
      .join(inSet, Seq("id"), "anti").localCheckpoint(true)
    val fromIn = reach(edges, inSet, maxRounds).join(rest, Seq("id"), "left_semi")
      .localCheckpoint(true)
    val toOut = reach(rev, outSet, maxRounds).join(rest, Seq("id"), "left_semi")
      .localCheckpoint(true)

    def tag(s: DataFrame, r: String) = s.select(col("id"), lit(r).as("region"))
    val tube = fromIn.join(toOut, Seq("id"), "left_semi")
    val tendril = fromIn.join(toOut, Seq("id"), "anti")
      .unionAll(toOut.join(fromIn, Seq("id"), "anti"))
    val disc = rest.join(fromIn, Seq("id"), "anti").join(toOut, Seq("id"), "anti")
    tag(core, "CORE")
      .unionAll(tag(inSet, "IN"))
      .unionAll(tag(outSet, "OUT"))
      .unionAll(tag(tube, "TUBE"))
      .unionAll(tag(tendril, "TENDRIL"))
      .unionAll(tag(disc, "DISC"))
  }

  /** Multi-source reachability (seeds INCLUDED): semi-naive — each round
    * expands only the previous frontier and anti-joins the visited set, so
    * per-round work is O(|frontier ⋈ edges|), not O(|reached|). */
  private def reach(edges: DataFrame, seeds: DataFrame, maxRounds: Int): DataFrame = {
    var visited = seeds.select(col("id")).localCheckpoint(true)
    var frontier = visited
    var round = 0
    while (!frontier.isEmpty) {
      round += 1
      require(round <= maxRounds, s"reachability did not converge in $maxRounds rounds")
      frontier = edges.join(frontier.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "anti")
        .localCheckpoint(true)
      if (!frontier.isEmpty)
        visited = visited.unionAll(frontier).localCheckpoint(true)
    }
    visited
  }
}
