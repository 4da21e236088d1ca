package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup (Ann.semDedup): planted-copy behavior on the real embeddings,
  * the keeper-rule invariant (a cluster's (csim, id)-minimum can never be
  * dropped — it has nobody "farther from the centroid" to lose to), and
  * determinism across runs and Lloyd refinement. */
class SemDedupSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  /** real embeddings + planted identical copies (the td_semdedup corpus) */
  private lazy val corpus = {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    base.unionAll(base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      .localCheckpoint(true)
  }

  private def run(lloyd: Int = 0) =
    Ann.semDedup(corpus, tau = 0.99, lloyd = lloyd)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getInt(3))))

  test("one flag row per vector; every planted identical copy is dropped") {
    val rows = run()
    assert(rows.length == corpus.count().toInt)
    assert(rows.map(_._1).distinct.length == rows.length)
    val byId = rows.toMap
    val planted = rows.map(_._1).filter(_ >= 100000L)
    assert(planted.nonEmpty)
    planted.foreach { p =>
      // identical embedding ⇒ same cluster, same csim; the tie breaks to
      // the lower id, so the +100000 copy always loses to its original
      assert(byId(p)._3 == 0, s"planted copy $p not dropped")
      assert(byId(p - 100000)._1 == byId(p)._1 && byId(p - 100000)._2 == byId(p)._2)
    }
  }

  test("the (csim, id)-minimum of every cluster is kept") {
    val rows = run()
    rows.groupBy(_._2._1).foreach { case (_, members) =>
      val min = members.minBy(m => (m._2._2, m._1))
      assert(min._2._3 == 1, s"cluster minimum ${min._1} was dropped")
    }
    assert(rows.count(_._2._3 == 1) >= 16) // ≥ one keeper per cluster
  }

  test("deterministic across runs; Lloyd refinement still drops planted copies") {
    assert(run().sortBy(_._1).toSeq == run().sortBy(_._1).toSeq)
    val refined = run(lloyd = 2).toMap
    refined.keys.filter(_ >= 100000L).foreach { p =>
      assert(refined(p)._3 == 0, s"planted copy $p survived under lloyd=2")
    }
  }
}
