package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Per-stage checkpoint + lineage metrics (north_rule resumability):
  * every pipeline stage persists its output as a parquet checkpoint and
  * appends lineage rows — per-file row counts plus a stage-total row
  * carrying an order-independent content checksum. A completed stage
  * (marker + checkpoint present) is never recomputed on resume —
  * `stage()` short-circuits to a scan.
  *
  * The checksum is Σ xxhash64(row) over all columns — independent of
  * partitioning and row order, so it is stable across parallelism levels
  * and makes cross-run output drift detectable. It is computed ON the
  * write pass (`observe` / CollectMetrics piggybacks on the job that
  * materializes the checkpoint): the stage output — which can carry the
  * raw html column — is never re-read for metrics. Per-file rows come
  * from a zero-data-column scan afterwards (parquet footer row counts,
  * no page decode), so total lineage overhead is O(files), not O(data).
  *
  * Lineage table layout: one row per written file (`rows` populated,
  * `checksum` null) + one `file = '_total_'` row per stage (total rows +
  * the stage checksum). Σ per-file rows == the total row's rows — an
  * integrity equation consumers can assert; aggregating consumers filter
  * `file <> '_total_'`.
  */
object Lineage {

  /** marker value of the stage-total lineage row's `file` column */
  val TotalFile = "_total_"

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
      val src = build
      val cols = src.columns.map(col)
      val obs = Observation(s"lineage_${name}_${System.nanoTime()}")
      // per-row term bounded < 1e9 so the ANSI-mode sum cannot overflow
      // int64 before ~9e9 rows per stage; coalesce covers empty stages
      val metrics = Seq(count(lit(1)).as("rows"),
        coalesce(sum(pmod(xxhash64(cols: _*), lit(1000000007L))), lit(0L))
          .as("checksum"))
      src.observe(obs, metrics.head, metrics.tail: _*)
        .write.mode("overwrite").parquet(path)
      val m = obs.get
      val out = spark.read.parquet(path)
      record(spark, baseDir, name, out,
        m("rows").asInstanceOf[Long], m("checksum").asInstanceOf[Long])
      Files.createDirectories(Paths.get(path))
      Files.write(marker(baseDir, name), Array.emptyByteArray)
      out
    }
  }

  /** Append the stage's lineage rows: per-file row counts + the `_total_`
    * row carrying the write-pass checksum. Per-file rows come straight
    * from the parquet FOOTER metadata on the driver (the row counts are
    * in every file's footer; O(files) metadata reads) — r6: this replaces
    * a scheduled zero-column Spark scan per stage, whose job launch was
    * pure fixed overhead on the 5-stage pipeline. Same rows: Σ per-file
    * rows == the total row's rows stays the consumers' integrity
    * equation. */
  def record(spark: SparkSession, baseDir: String, name: String, out: DataFrame,
             totalRows: Long, checksum: Long): Unit = {
    val ts = java.time.Instant.now().toString
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(stagePath(baseDir, name))
    val fs = dir.getFileSystem(conf)
    val perFileRows: Seq[org.apache.spark.sql.Row] = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val rows = try reader.getRecordCount finally reader.close()
        org.apache.spark.sql.Row(name, st.getPath.toString, rows,
          null.asInstanceOf[java.lang.Long], ts)
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("stage",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("rows",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("checksum",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("recorded_at",
        org.apache.spark.sql.types.StringType, nullable = false)))
    val all = perFileRows :+
      org.apache.spark.sql.Row(name, TotalFile, totalRows, checksum, ts)
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(all).asJava), schema)
      .coalesce(1)
      .write.mode("append").parquet(lineagePath(baseDir))
  }

  def read(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.parquet(lineagePath(baseDir))

  /** Per-stage totals from the `_total_` rows (rows + content checksum). */
  def totals(spark: SparkSession, baseDir: String): DataFrame =
    read(spark, baseDir).filter(col("file") === TotalFile)
      .select(col("stage"), col("rows"), col("checksum"))
}
