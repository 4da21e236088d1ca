package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance weighting: gram extraction contract, the log-ratio
  * weight pinned against a driver-side re-computation from the
  * oracle-gated integer surface, the selection property (target-like
  * documents outrank off-domain ones), and resampling determinism. */
class DsirSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private val Buckets = 64

  private lazy val docs = Seq(
    0L -> "spark table join spark",
    1L -> "cat dog cat dog cat",
    2L -> "spark join vector table",
    3L -> "dog cat bird",
    4L -> "spark vector spark table",
    5L -> "bird dog bird"
  ).toDF("doc_id", "text")

  // target sample = the spark-flavored even docs
  private val tgt = col("doc_id") % 2 === 0

  test("grams: unigrams plus adjacent bigrams; single token has no bigram") {
    val g = Dsir.grams(Seq(9L -> "a b c").toDF("doc_id", "text"))
      .collect().map(_.getString(1)).sorted.toSeq
    assert(g == Seq("a", "a b", "b", "b c", "c"))
    val one = Dsir.grams(Seq(9L -> "solo").toDF("doc_id", "text"))
      .collect().map(_.getString(1)).toSeq
    assert(one == Seq("solo"))
  }

  test("weights match a driver-side recomputation from the feature surface") {
    val alpha = 1.0
    val surf = Dsir.featureSurface(docs, tgt, Buckets).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val tTot = surf.map(x => (x._2, x._4)).distinct.map(_._2).sum.toDouble
    val rTot = surf.map(x => (x._2, x._5)).distinct.map(_._2).sum.toDouble
    val expected = surf.groupBy(_._1).map { case (id, rows) =>
      id -> rows.map { case (_, _, cnt, tc, rc) =>
        cnt * (math.log((tc + alpha) / (tTot + alpha * Buckets)) -
          math.log((rc + alpha) / (rTot + alpha * Buckets)))
      }.sum
    }
    val got = Dsir.weights(docs, tgt, Buckets, alpha).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) < 1e-9, s"doc $id: got ${got(id)}, expected $w")
    }
  }

  test("target-like documents outrank off-domain ones") {
    val w = Dsir.weights(docs, tgt, Buckets).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 2 shares the target vocabulary, docs 1/3/5 are the cat-dog domain
    assert(w(2L) > w(1L) && w(2L) > w(3L) && w(2L) > w(5L))
  }

  test("resample keeps exactly the n highest-weight docs, deterministically") {
    val w = Dsir.weights(docs, tgt, Buckets).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val top3 = w.sortBy { case (id, wt) => (-wt, id) }.take(3).map(_._1).toSet
    val got = Dsir.resample(docs, tgt, 3, Buckets).collect().map(_.getLong(0)).toSet
    assert(got == top3)
    assert(Dsir.resample(docs, tgt, 3, Buckets).collect().map(_.getLong(0)).toSet == got)
  }
}
