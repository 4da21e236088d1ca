package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Per-stage checkpoint + lineage metrics (north_rule resumability):
  * every pipeline stage persists its output as a parquet checkpoint and
  * appends per-file row counts + an order-independent content checksum to a
  * lineage table. A completed stage (marker + checkpoint present) is
  * never recomputed on resume — `stage()` short-circuits to a scan.
  *
  * The checksum is Σ xxhash64(row) over all columns — independent of
  * partitioning and row order, so it is stable across parallelism levels
  * and makes cross-run output drift detectable.
  */
object Lineage {

  def stagePath(baseDir: String, name: String) = s"$baseDir/stage=$name"
  def lineagePath(baseDir: String) = s"$baseDir/lineage"
  private def marker(baseDir: String, name: String) =
    Paths.get(s"${stagePath(baseDir, name)}/_GRAFT_DONE")

  def isDone(baseDir: String, name: String): Boolean = Files.exists(marker(baseDir, name))

  /** Run (or resume) a checkpointed stage. */
  def stage(spark: SparkSession, baseDir: String, name: String)
           (build: => DataFrame): DataFrame = {
    val path = stagePath(baseDir, name)
    if (isDone(baseDir, name)) {
      spark.read.parquet(path)
    } else {
      build.write.mode("overwrite").parquet(path)
      val out = spark.read.parquet(path)
      record(spark, baseDir, name, out)
      Files.createDirectories(Paths.get(path))
      Files.write(marker(baseDir, name), Array.emptyByteArray)
      out
    }
  }

  /** Append per-file (≈ per written partition) lineage metrics. */
  def record(spark: SparkSession, baseDir: String, name: String, out: DataFrame): Unit = {
    val cols = out.columns.map(col)
    out.withColumn("__file", input_file_name())
      .groupBy(col("__file"))
      .agg(count(lit(1)).as("rows"),
        // per-row term bounded < 1e9 so the ANSI-mode sum cannot overflow
        // int64 before ~9e9 rows per file
        sum(pmod(xxhash64(cols: _*), lit(1000000007L))).as("checksum"))
      .select(lit(name).as("stage"), col("__file").as("file"),
        col("rows"), col("checksum"),
        lit(java.time.Instant.now().toString).as("recorded_at"))
      .write.mode("append").parquet(lineagePath(baseDir))
  }

  def read(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.parquet(lineagePath(baseDir))
}
