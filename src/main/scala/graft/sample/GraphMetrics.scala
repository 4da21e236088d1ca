package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed triangle counting + clustering metrics — the standard
  * structure-preservation measures of the sampling literature (Leskovec &
  * Faloutsos KDD'06 grade samplers on clustering-coefficient agreement, the
  * property `smp_rn_degdist` covers for degrees).
  *
  * Algorithm: degree-ordered edge orientation, then wedge join + closing-edge
  * join (Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11). Orienting every edge from its lower (degree, id) endpoint
  * to its higher one bounds any node's out-degree by O(√m), so the wedge
  * fan-out — the quadratic hazard a naive neighbor self-join has on hub
  * nodes — is O(m^1.5) TOTAL regardless of skew: the web-scale shape. All
  * joins are key-equi (Catalyst shuffle-hash/SMJ with AQE skew handling);
  * nothing is windowed, nothing collects.
  *
  * Everything is exact integer arithmetic (counts, not coefficients), so the
  * DuckDB oracle can replay it hash-identically; callers derive the float
  * clustering coefficient `2·tri/(deg·(deg−1))` / transitivity `3·T/W`
  * downstream where cross-engine libm rounding can't bite the gate.
  */
object GraphMetrics {

  /** Shared-source co-occurrence projection: an undirected `(u, v)` edge
    * (u < v, distinct) between every pair of `dst` values sharing a `src`
    * in the given predicate's edge set — e.g. parts co-contained in an
    * order. Per-src cost is C(k,2); web-scale callers cap or sample
    * pathological baskets upstream (TPC-H orders hold ≤ 7 parts, so the
    * projection here is linear-ish in lineitem).
    */
  def cooccurrence(edges: DataFrame, pred: String): DataFrame = {
    val e = edges.filter(col("pred") === pred)
      .select(col("src"), col("dst")).distinct()
    val pairs = e.as("a").join(e.as("b"),
      col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.dst").as("u"), col("b.dst").as("v"))
    pairs.distinct()
  }

  /** Undirected degree per node of a `(u, v)` u<v edge set. */
  def degrees(und: DataFrame): DataFrame =
    und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

  /** Orient `(u, v)` from the lower (deg, id) endpoint to the higher; the
    * output carries the head's degree so the wedge join can order heads
    * without a third degree join. The (deg, id) order is total (id breaks
    * ties), so each undirected edge appears exactly once.
    */
  private def orient(und: DataFrame, deg: DataFrame): DataFrame = {
    val e = und
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), Seq("u"))
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), Seq("v"))
    val uLower = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    e.select(
      when(uLower, col("u")).otherwise(col("v")).as("a"),
      when(uLower, col("v")).otherwise(col("u")).as("b"),
      when(uLower, col("dv")).otherwise(col("du")).as("bd"))
  }

  /** One row `(x, y, z)` per triangle, each counted exactly once
    * (x = the (deg,id)-lowest corner; y, z its ordered partners).
    *
    * The edge list is consumed three times (degrees, orientation, wedge
    * close) and the oriented list three more (both wedge sides + the
    * closing probe), so both are materialized once (localCheckpoint —
    * same bounded-lineage trade as the CC rounds) instead of re-deriving
    * a possibly-expensive upstream projection per consumer. */
  def triangleRows(und0: DataFrame): DataFrame = {
    val und = und0.localCheckpoint(true)
    val o = orient(und, degrees(und)).localCheckpoint(true)
    // wedge at a: ordered out-neighbor pairs (b1 < b2 by (deg, id)); the
    // closing undirected edge {b1, b2} — if present — is oriented b1→b2 by
    // the same total order, so ONE equi-join against o closes the wedge
    val wedges = o.as("e1").join(o.as("e2"),
      col("e1.a") === col("e2.a") &&
        (col("e1.bd") < col("e2.bd") ||
          (col("e1.bd") === col("e2.bd") && col("e1.b") < col("e2.b"))))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    wedges.join(o.select(col("a").as("y"), col("b").as("z")), Seq("y", "z"))
      .select(col("x"), col("y"), col("z"))
  }

  /** Per-node triangle participation: `(id, tri_cnt)` for every node in at
    * least one triangle. */
  def triangleCounts(und: DataFrame): DataFrame =
    triangleRows(und)
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("tri_cnt"))

  /** Global structure metrics as exact integers: total triangles T and
    * wedges W = Σ deg·(deg−1)/2. Transitivity = 3T/W, derived by callers. */
  def globalMetrics(und0: DataFrame): DataFrame = {
    val und = und0.localCheckpoint(true)
    val t = triangleRows(und).agg(count(lit(1)).as("triangles"))
    val w = degrees(und)
      .agg(sum(expr("(deg * (deg - 1)) div 2")).as("wedges"))
    t.crossJoin(w)
  }

  /** Transitivity (global clustering coefficient) 3T/W as a Double — the
    * sampler-quality scalar compared original-vs-sample in specs. */
  def transitivity(und: DataFrame): Double = {
    val r = globalMetrics(und).collect()(0)
    val w = r.getLong(1)
    if (w == 0L) 0.0 else 3.0 * r.getLong(0) / w
  }

  /** Exact integer moments for degree assortativity (Newman, "Assortative
    * Mixing in Networks", PRL 89, 2002): over the 2m ORDERED endpoint
    * pairs of the undirected edge set, with j = deg(src), k = deg(dst),
    * emits (pairs, Σj, Σk, Σjk, Σjj, Σkk) — everything the Pearson
    * coefficient r = (mΣjk − ΣjΣk) / √((mΣjj − Σj²)(mΣkk − Σk²)) needs,
    * with the float division/sqrt strictly downstream of the gate. Σj = Σk
    * by symmetry; both are emitted so the oracle equality checks the
    * symmetry too. One degree join per endpoint + a single aggregate. */
  def degreeMomentRow(und0: DataFrame): DataFrame = {
    val und = und0.localCheckpoint(true)
    val deg = degrees(und)
    val sym = und.select(col("u"), col("v"))
      .unionAll(und.select(col("v").as("u"), col("u").as("v")))
    sym
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "j"), Seq("u"))
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "k"), Seq("v"))
      .agg(count(lit(1)).as("pairs"),
        sum(col("j")).as("sum_j"), sum(col("k")).as("sum_k"),
        sum(col("j") * col("k")).as("sum_jk"),
        sum(col("j") * col("j")).as("sum_jj"),
        sum(col("k") * col("k")).as("sum_kk"))
  }

  /** k-core: the maximal subgraph in which every node has degree ≥ k
    * (iterative peel — the distributed-round form of Batagelj & Zaveršnik's
    * algorithm; Seidman, "Network structure and minimum degree", Social
    * Networks 1983). Per round: one degree aggregate + two semi-join prunes
    * of the edge set; converged when no edge is removed (⟺ every incident
    * node already has deg ≥ k — peeling is idempotent at the fixpoint,
    * which is what lets the oracle replay it as a fixed unroll). Rounds are
    * O(peel depth); each is shuffle-linear in the surviving edges. Returns
    * `(id, deg)` — core members with their in-core degree. */
  def kCore(und0: DataFrame, k: Int, maxRounds: Int = 100): DataFrame = {
    require(k >= 1, s"k=$k")
    var und = und0.localCheckpoint(true)
    var n = und.count()
    var rounds = 0
    var done = n == 0L
    while (!done) {
      rounds += 1
      if (rounds > maxRounds)
        throw new IllegalStateException(s"k-core peel not converged after $maxRounds rounds")
      val keep = degrees(und).filter(col("deg") >= k).select("id")
      val pruned = und
        .join(keep.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("id", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v")).localCheckpoint(true)
      val m = pruned.count()
      done = m == n
      n = m
      und = pruned
    }
    degrees(und).filter(col("deg") >= k)
  }

  /** Degree assortativity r as a Double (spec-level; the oracle gates the
    * integer moments above). */
  def assortativity(und: DataFrame): Double = {
    val r = degreeMomentRow(und).collect()(0)
    val (m, sj, sk, sjk, sjj, skk) = (r.getLong(0).toDouble, r.getLong(1).toDouble,
      r.getLong(2).toDouble, r.getLong(3).toDouble, r.getLong(4).toDouble, r.getLong(5).toDouble)
    val den = math.sqrt((m * sjj - sj * sj) * (m * skk - sk * sk))
    if (den == 0.0) 0.0 else (m * sjk - sj * sk) / den
  }
}
