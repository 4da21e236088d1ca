package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Isolates the cost of the three lineage-metric strategies on one
  * checkpointed stage (the pages table — the widest row the pipeline
  * carries):
  *
  *   plain     — write only (the floor)
  *   observe   — write with CollectMetrics piggybacked (count + checksum)
  *   readback  — plain write, then ONE read-back aggregate for the metrics
  *   perfile   — the zero-data-column input_file_name() scan on its own
  *
  *   runMain graft.tools.LineageProbe <sfDir> <reps> <cores>
  *
  * Measured (sf0.1, 8 cores, this box): reps=64 — plain 1.33 s, observe
  * 1.52 s, readback 2.26 s, perfile 0.78 s; reps=512 (2.56M pages) —
  * plain 6.31 s, observe 7.66 s, readback 8.18 s, perfile 0.91 s. The
  * checksum costs +1.35 s ON the write pass vs +1.87 s as a second
  * read-back pass even with the stage output page-cached in tmpfs; on a
  * real cluster the read-back is a COLD full re-scan of the stage output
  * over storage, which is the case the observe design removes.
  */
object LineageProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, repsS, coresS) = args
    val (reps, cores) = (repsS.toInt, coresS.toInt)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val replicated = spark.range(0, reps, 1, reps).withColumnRenamed("id", "rep")
      .join(broadcast(docs))
      .select((col("doc_id") + col("rep") * lit(100000000L)).as("doc_id"),
        col("text"), col("lang"))
    def pages = graft.pipeline.Pages.fromDocuments(replicated)
    val cols = pages.columns.map(col)
    def checksum = coalesce(
      sum(pmod(xxhash64(cols.toIndexedSeq: _*), lit(1000000007L))), lit(0L))

    def time[A](tag: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[lineage-probe] $tag%-9s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = java.nio.file.Files.createTempDirectory("lineage_probe_").toString
    // warmup
    pages.write.mode("overwrite").parquet(s"$base/warm")

    time("plain") { pages.write.mode("overwrite").parquet(s"$base/plain") }
    time("observe") {
      val obs = Observation("probe_" + System.nanoTime())
      pages.observe(obs, count(lit(1)).as("rows"), checksum.as("checksum"))
        .write.mode("overwrite").parquet(s"$base/obs")
      obs.get
    }
    time("readback") {
      pages.write.mode("overwrite").parquet(s"$base/rb")
      spark.read.parquet(s"$base/rb")
        .agg(count(lit(1)), checksum).collect()
    }
    time("perfile") {
      spark.read.parquet(s"$base/plain")
        .select(input_file_name().as("file"))
        .groupBy("file").agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
