package graft.sample

import graft.SparkSpec
import graft.fixtures.FamilyKb
import org.apache.spark.sql.functions._

/** KGE negative sampling: the filtered-corruption contract re-checked
  * driver-side on the family fixture, determinism, and draw dispersion. */
class KgeNegativesSpec extends SparkSpec {

  private lazy val kb = FamilyKb.kb(spark)

  private lazy val rows = KgeNegatives.negatives(kb, k = 4).collect()
    .map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getInt(3), r.getString(4), r.getString(5)))

  test("every negative corrupts exactly one endpoint of its positive") {
    assert(rows.nonEmpty)
    rows.foreach { case (s, _, d, _, ns, nd) =>
      val headChanged = ns != s
      val tailChanged = nd != d
      assert(headChanged ^ tailChanged,
        s"($s,$d) -> ($ns,$nd): exactly one endpoint must change")
    }
  }

  test("no negative is a true triple (filtered setting) and positives are real") {
    val truth = FamilyKb.edgeList.map(e => (e.src, e.pred, e.dst)).toSet
    rows.foreach { case (s, p, d, _, ns, nd) =>
      assert(truth((s, p, d)), s"positive ($s,$p,$d) not in the KG")
      assert(!truth((ns, p, nd)), s"negative ($ns,$p,$nd) is a true triple")
    }
  }

  test("at most k negatives per positive; deterministic; draws disperse") {
    rows.groupBy(t => (t._1, t._2, t._3)).foreach { case (_, g) =>
      assert(g.length <= 4)
      assert(g.map(_._4).distinct.length == g.length) // one row per draw i
    }
    val again = KgeNegatives.negatives(kb, k = 4).collect()
      .map(r => (r.getString(0), r.getString(2), r.getInt(3), r.getString(4), r.getString(5)))
    assert(again.sortBy(_.toString).toSeq ==
      rows.map(t => (t._1, t._3, t._4, t._5, t._6)).sortBy(_.toString).toSeq)
    // uniform draws over 16 nodes: the replacement set must not collapse
    val reps = rows.map { case (s, _, _, _, ns, nd) => if (ns != s) ns else nd }
    assert(reps.distinct.length >= 8, s"only ${reps.distinct.length} distinct replacements")
  }
}
