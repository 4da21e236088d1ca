package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dup detection (`Dedup.incrementNearDup`): probing an
  * increment against a stored LSH index returns EXACTLY the full-corpus
  * `minhashLsh` pairs that touch at least one increment doc — proved on the
  * real sf0.001 corpus (with its planted exact/near dups as the increment),
  * through a TableIO persistence round trip of the index. */
class IncrementalDedupSpec extends SparkSpec {

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private lazy val full =
    graft.queries.TrainingDataQueries.corpus(spark, "/root/testdata/sf0.001")

  test("increment probe == full run restricted to increment-touching pairs") {
    val store = full.filter(col("doc_id") < 100000)
    val inc = full.filter(col("doc_id") >= 100000)

    val dir = java.nio.file.Files.createTempDirectory("inc_dedup_spec_").toString
    val io = new graft.core.ParquetTableIO(spark, dir)
    io.write(Dedup.lshIndex(store), "lsh_index")

    val incremental = pairSet(
      Dedup.incrementNearDup(store, io.read("lsh_index"), inc, 0.8))
    val fullRun = pairSet(Dedup.minhashLsh(full, 0.8))
    val expected = fullRun.filter(p => p._1 >= 100000 || p._2 >= 100000)

    assert(incremental.nonEmpty)
    assert(incremental === expected)
    // the increment must link back into the store, not just to itself
    assert(incremental.exists(p => p._1 < 100000))
  }

  test("empty increment finds nothing and store-store pairs never surface") {
    import spark.implicits._
    val store = full.filter(col("doc_id") < 100000)
    val idx = Dedup.lshIndex(store)
    val emptyInc = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.incrementNearDup(store, idx, emptyInc, 0.8).count() === 0L)
  }
}
