package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct sketch + Count-Min frequency sketch: driver-level kernel
  * algebra (bounded insert, dedup, sorted merge), the under-full exact
  * branch vs the estimator branch, estimator accuracy, CMS one-sided error
  * and mass conservation, and partitioning invariance throughout. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMinValues kernel: bounded, distinct, sorted; merge = union cut at k") {
    val a = new Sketches.KMinValues(4)
    var buf = a.zero
    for (v <- Seq(9L, 3L, 7L, 3L, 11L, 1L, 8L)) buf = a.reduce(buf, v)
    assert(buf.toSeq === Seq(1L, 3L, 7L, 8L)) // 9/11 pushed out, dup 3 once
    // value above the current kth is ignored outright
    assert(a.reduce(buf, 100L).toSeq === Seq(1L, 3L, 7L, 8L))
    val other = Array(2L, 3L, 5L)
    assert(a.merge(buf, other).toSeq === Seq(1L, 2L, 3L, 5L))
    assert(a.merge(other, buf).toSeq === Seq(1L, 2L, 3L, 5L))
    assert(a.merge(a.zero, other).toSeq === other.toSeq)
  }

  test("kmvDistinct: under-full group is exact; full group estimates within 2x") {
    // tiny group: 5 distinct items < k=64 → n_kept = exact = est
    val tiny = (1 to 5).flatMap(i => Seq(s"t$i", s"t$i"))
      .map(("small", _)).toDF("g", "item")
    // big group: 5000 distinct items ≫ k → estimator branch
    val big = (1 to 5000).map(i => ("big", s"item_$i")).toDF("g", "item")
    val out = Sketches.kmvDistinct(tiny.unionAll(big), "item", Seq("g"), k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(3), r.getLong(4))).toMap
    val (smallKept, smallEst, smallExact) = out("small")
    assert(smallKept === 5 && smallEst === 5L && smallExact === 5L)
    val (bigKept, bigEst, bigExact) = out("big")
    assert(bigKept === 64 && bigExact === 5000L)
    assert(bigEst > bigExact / 2 && bigEst < bigExact * 2,
      s"KMV estimate $bigEst too far from $bigExact")
    // partitioning-invariant (bit-exact, not just statistically)
    val re = Sketches.kmvDistinct(
        tiny.unionAll(big).repartition(13), "item", Seq("g"), k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(re("big") === bigEst && re("small") === smallEst)
  }

  test("countMin: one-sided error, mass conservation, broadcast-probe estimate") {
    // zipf-ish: item_i appears i times, 60 items, 1830 occurrences
    val occ = (1 to 60).flatMap(i => Seq.fill(i)(s"item_$i")).toDF("item")
    val sketch = Sketches.countMin(occ, "item", depth = 4, width = 64)
    // every row of the grid preserves total mass
    val mass = sketch.groupBy(col("cm_row")).agg(sum(col("cnt")).as("m"))
      .collect().map(_.getLong(1)).toSet
    assert(mass === Set(1830L))
    val est = Sketches.countMinEstimate(sketch, occ.distinct(), "item", 4, 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for (i <- 1 to 60)
      assert(est(s"item_$i") >= i.toLong,
        s"CMS under-estimated item_$i: ${est(s"item_$i")} < $i")
    // an item never inserted estimates only collision mass (may be 0)
    val miss = Sketches.countMinEstimate(sketch,
      Seq("never_seen").toDF("item"), "item", 4, 64)
      .collect().map(_.getLong(1)).head
    assert(miss >= 0L)
    // partitioning invariance of the whole cycle
    val est2 = Sketches.countMinEstimate(
      Sketches.countMin(occ.repartition(7), "item", 4, 64),
      occ.distinct(), "item", 4, 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est2 === est)
  }

  test("bloom: no false negatives ever; tiny width forces FPs but never FNs") {
    val in = (1 to 200).map(i => s"in_$i").toDF("item")
    val out = (1 to 200).map(i => s"out_$i").toDF("item")
    // comfortable width: every member true, outsiders (deterministically)
    // almost all false
    val bits = Sketches.bloomBits(in, "item", 4, 8192)
    assert(bits.count() <= 4L * 200)
    val mem = Sketches.bloomProbe(bits, in.unionAll(out), "item", 4, 8192)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    (1 to 200).foreach(i => assert(mem(s"in_$i"), s"false negative in_$i"))
    assert((1 to 200).count(i => mem(s"out_$i")) < 20)
    // saturating width=16: outsiders mostly collide true — STILL no FN
    val tiny = Sketches.bloomBits(in, "item", 4, 16)
    val mem2 = Sketches.bloomProbe(tiny, in.unionAll(out), "item", 4, 16)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    (1 to 200).foreach(i => assert(mem2(s"in_$i"), s"false negative at w=16"))
    // partitioning invariance, FP pattern included
    val mem3 = Sketches.bloomProbe(
      Sketches.bloomBits(in.repartition(7), "item", 4, 8192),
      in.unionAll(out).repartition(5), "item", 4, 8192)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(mem3 === mem)
  }
}
