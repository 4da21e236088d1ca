package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-source betweenness centrality (Brandes, "A faster algorithm for
  * betweenness centrality", J. Math. Sociology 2001, in the sampled
  * k-source form of Brandes & Pich 2007 / Riondato & Kornaropoulos
  * WSDM'14): run a multi-source BFS that counts shortest paths, then
  * accumulate pair dependencies backward level by level. Exact
  * betweenness is O(n·m) — never at web scale; the k-source estimator
  * (scaled by n/k) is the standard trade and the sampling error bound
  * is Riondato's VC one. The truncated radius `maxR` is the second
  * standard trade (ego-betweenness family): paths longer than maxR
  * contribute nothing, which at web diameters ≈ 16-20 loses little.
  *
  * The VERIFIED surface is [[spCounts]] — per (source, node) BFS
  * distance and shortest-path count σ, both EXACT INTEGERS, replayed
  * round for round by the DuckDB oracle. The float dependency
  * accumulation ([[accumulate]]) is strictly downstream and spec-pinned
  * against hand-computed Brandes values (same split as PageRank's
  * naive-reference spec vs the integer gates).
  *
  * Scale shape: the forward pass is one frontier⋈edges join + one
  * (src, node)-keyed sum per level — the [[Walks]] frontier-expansion
  * shape, k sources riding ONE plan as extra rows, not k jobs. The
  * backward pass is the same join against the settled table filtered to
  * one level, σ already materialized. σ magnitudes: ≤ (max deg)^maxR
  * per pair — int64 to deg ~10⁴ at maxR 4; move σ to decimal(38,0)
  * beyond (the [[Louvain]] note).
  */
object Betweenness {

  /** Multi-source truncated BFS with shortest-path counting:
    * `(src, node, dist, sigma)` for every node within `maxR` hops of a
    * source — dist the BFS level, σ the number of distinct shortest
    * src→node paths. Runs EXACTLY `maxR` rounds (truncation is part of
    * the estimator's definition, so the oracle unrolls the same fixed
    * count — no fixpoint argument needed). */
  def spCounts(und0: DataFrame, sources: DataFrame, maxR: Int): DataFrame = {
    require(maxR >= 0, s"maxR=$maxR")
    val und = und0.select(col("u"), col("v")).localCheckpoint(true)
    // sym stays a LAZY union over the materialized und: re-deriving the
    // swapped half is a map over checkpointed rows, cheaper than a second
    // materialization job (the round loop is job-launch-bound at small
    // scale; at large scale the bytes scanned are identical either way)
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
    var settled = sources.select(col("id").as("src"), col("id").as("node"),
      lit(0).as("dist"), lit(1L).as("sigma")).localCheckpoint(true)
    var frontier = settled
    // checkpointed frames carry the unknown-stats default size, so both
    // per-round joins planned as SMJ with full exchanges of the 2|E| sym
    // rows. The frontier/settled sides are (src, node)-scale; broadcast
    // them while their COUNTED row counts (metadata-cheap over
    // materialized partitions) fit the envelope — the loop then runs
    // map-side over the sym scan. A 100-TB k-source run outgrows the gate
    // after a round or two and falls back to the shuffled joins it needs.
    // Strategy-only: identical output (A/B in SpCountsAb, 7.3 → 2.8 s).
    var settledRows = settled.count()
    var frontierRows = settledRows
    def gated(df: DataFrame, rows: Long): DataFrame =
      if (rows <= BroadcastMaxRows) broadcast(df) else df
    for (r <- 1 to maxR) {
      val nxt = gated(frontier, frontierRows)
        .join(sym.withColumnRenamed("u", "node"), Seq("node"))
        .select(col("src"), col("v").as("node"), col("sigma"))
        .join(gated(settled.select(col("src"), col("node")), settledRows),
          Seq("src", "node"), "left_anti")
        .groupBy("src", "node").agg(sum(col("sigma")).as("sigma"))
        .select(col("src"), col("node"), lit(r).as("dist"), col("sigma"))
        .localCheckpoint(true)
      frontierRows = nxt.count()
      settledRows += frontierRows
      // settled is a lazy union of ALREADY-materialized level frames: the
      // per-round anti-join scans the same settled bytes either way, and
      // dropping the union re-checkpoint halves the round's job count
      settled = settled.unionAll(nxt)
      frontier = nxt
    }
    settled
  }

  /** row gate for broadcasting the frontier/settled sides of the σ-BFS
    * loop (~60 B per (src, node) row → ≤ ~250 MB broadcast). */
  val BroadcastMaxRows: Long = 4000000L

  /** Brandes backward accumulation over a [[spCounts]] table: pair
    * dependency δ(s,v) = Σ_{w ∈ succ(v)} σ(s,v)/σ(s,w) · (1 + δ(s,w)),
    * summed over sources per node, sources themselves excluded. Float —
    * spec-pinned, not an oracle surface. `scaleNumer/scaleDenom` apply
    * the n/k estimator scaling. */
  def accumulate(und0: DataFrame, sp0: DataFrame,
                 scaleNumer: Long = 1L, scaleDenom: Long = 1L): DataFrame = {
    require(scaleNumer >= 1 && scaleDenom >= 1, "bad scale")
    val und = und0.select(col("u"), col("v")).localCheckpoint(true)
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    val sp = sp0.localCheckpoint(true)
    // empty seed set / empty graph: max(dist) would be NULL and the getInt
    // below an opaque NPE — return the empty (id, bc) frame instead
    if (sp.isEmpty)
      return sp.select(col("node").as("id"), lit(0.0).as("bc")).limit(0)
    val maxR = sp.agg(max(col("dist"))).head().getInt(0)
    // δ rows start all-zero at the deepest level; walk levels upward
    var delta = sp.filter(col("dist") === maxR)
      .select(col("src"), col("node"), col("sigma"),
        lit(0.0).as("delta")).localCheckpoint(true)
    for (r <- (maxR - 1) to 0 by -1) {
      val lvl = sp.filter(col("dist") === r)
      // v at level r pulls from adjacent w at level r+1 (w's δ just final)
      val pulled = delta.filter(col("sigma") > 0)
        .select(col("src"), col("node").as("w"),
          col("sigma").as("wsig"), col("delta").as("wdelta"))
        .join(sym.select(col("u").as("node"), col("v").as("w")), Seq("w"))
        .join(lvl.select(col("src"), col("node"), col("sigma")),
          Seq("src", "node"))
        .groupBy("src", "node", "sigma")
        .agg(sum(col("sigma").cast("double") / col("wsig") *
          (lit(1.0) + col("wdelta"))).as("delta"))
        .select(col("src"), col("node"), col("sigma"), col("delta"))
      val zero = lvl.join(pulled.select(col("src"), col("node")),
          Seq("src", "node"), "left_anti")
        .select(col("src"), col("node"), col("sigma"), lit(0.0).as("delta"))
      delta = delta.unionAll(pulled).unionAll(zero).localCheckpoint(true)
    }
    delta.filter(col("src") =!= col("node"))
      .groupBy(col("node").as("id"))
      .agg((sum(col("delta")) * scaleNumer / scaleDenom).as("bc"))
  }

  /** k-source estimate end to end: σ-BFS forward, δ backward, scaled by
    * |V|/|sources| (Brandes & Pich 2007). */
  def estimate(und: DataFrame, sources: DataFrame, maxR: Int): DataFrame = {
    val n = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id"))).distinct().count()
    val k = sources.count()
    accumulate(und, spCounts(und, sources, maxR), n, k)
  }

  /** Truncated Katz prestige (Katz, "A new status index derived from
    * sociometric analysis", Psychometrika 1953) as an EXACT INTEGER:
    * katz(v) = Σ_{k=1..K} β^k · walks_k(v) with β = 1/2, where
    * walks_k(v) counts directed walks of length k ending at v over the
    * DISTINCT (src, dst) simple graph. Scaling by 2^K clears every
    * denominator — katz_scaled(v) = Σ_k walks_k(v) · 2^(K−k) — so no
    * division (and no libm) exists anywhere: the full ranking is
    * hash-replayable, unlike eigen-solver Katz. Truncation at K is the
    * standard distributed trade (β^k damps the tail the truncation
    * drops); K=4·β=1/2 keeps walk counts ≤ deg_max⁴ — int64 to
    * deg ~10⁴, decimal(38,0) beyond (the [[Louvain]] note). Per round:
    * one edges⋈counts join + one dst-keyed map-side-combinable sum —
    * the [[spCounts]] shape without the settled anti-join. */
  def katzScaled(edges0: DataFrame, nodes0: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1 && k <= 62, s"k=$k")
    val e = edges0.select(col("src"), col("dst")).distinct()
      .filter(col("src") =!= col("dst")).localCheckpoint(true)
    var t = nodes0.select(col("id")).distinct()
      .withColumn("t", lit(1L)).localCheckpoint(true)
    var acc: DataFrame = null
    for (r <- 1 to k) {
      t = e.join(t.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("t")).as("t"))
        .localCheckpoint(true)
      val w = t.select(col("id"), (col("t") * (1L << (k - r))).as("w"))
      acc = if (acc == null) w else acc.unionAll(w)
    }
    nodes0.select(col("id")).distinct()
      .join(acc.groupBy("id").agg(sum(col("w")).as("katz_scaled")),
        Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("katz_scaled"), lit(0L)).as("katz_scaled"))
  }
}
