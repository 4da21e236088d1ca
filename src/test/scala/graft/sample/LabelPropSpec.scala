package graft.sample

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous LPA: hand-traced rounds (community convergence, the
  * documented bipartite oscillation), histogram, determinism. */
class LabelPropSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def und(edges: (String, String)*): DataFrame =
    edges.toDF("u", "v")

  private def labelsOf(df: DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("two disjoint triangles each converge to their min label") {
    val g = und(("a","b"),("a","c"),("b","c"),("x","y"),("x","z"),("y","z"))
    val got = labelsOf(LabelProp.run(g, rounds = 4))
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "x"))
    val sizes = LabelProp.communitySizes(g, rounds = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("a" -> 3L, "x" -> 3L))
  }

  test("star graph: the documented synchronous oscillation, hand-traced") {
    val g = und(("h","l1"),("h","l2"),("h","l3"),("h","l4"))
    // r1: h←l1 (tie→min), leaves←h; r2: h←h, leaves←l1;
    // r3: h←l1, leaves←h; r4: h←h, leaves←l1
    assert(labelsOf(LabelProp.run(g, rounds = 4)) ==
      Map("h" -> "h", "l1" -> "l1", "l2" -> "l1", "l3" -> "l1", "l4" -> "l1"))
    assert(labelsOf(LabelProp.run(g, rounds = 3)) ==
      Map("h" -> "l1", "l1" -> "h", "l2" -> "h", "l3" -> "h", "l4" -> "h"))
  }

  test("zero rounds = identity labels; partitioning changes nothing") {
    val g = und(("a","b"),("b","c"),("c","d"),("d","a"),("a","c"))
    assert(labelsOf(LabelProp.run(g, rounds = 0)) ==
      Map("a" -> "a", "b" -> "b", "c" -> "c", "d" -> "d"))
    val wide = g.repartition(7, xxhash64(col("u")))
    assert(labelsOf(LabelProp.run(g, rounds = 4)) ==
      labelsOf(LabelProp.run(wide, rounds = 4)))
  }

  test("sampler-quality usage: communities on the knows projection") {
    val kb = graft.fixtures.HepatitisLikeKb.kb(s)
    val g = GraphMetrics.cooccurrence(kb.edges, "knows")
    val sizes = LabelProp.communitySizes(g, rounds = 4)
    val total = sizes.agg(sum("members")).collect()(0).getLong(0)
    assert(total == GraphMetrics.degrees(g).count()) // every incident node labeled
  }
}
