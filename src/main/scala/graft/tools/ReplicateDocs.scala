package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic corpus replicator for scaling evidence: writes
  * `<out>/documents.parquet` = the input documents replicated `reps`×
  * with per-rep doc_id offsets (ids stay unique; the Pages fact
  * arithmetic — `doc_id % k` — still produces linkable entities for
  * every row). Used to size the spark-submit RunKg scaling runs; the
  * same replication the in-JVM bench probes drive inline.
  *
  *   runMain graft.tools.ReplicateDocs <sfDir> <outDir> <reps>
  */
object ReplicateDocs {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ReplicateDocs <sfDir> <outDir> <reps> [files]")
    val (sfDir, outDir, reps) = (args(0), args(1), args(2).toInt)
    // a file per rep (1024+) costs ~10 s of serial driver task scheduling
    // per downstream read — write a bounded file count instead
    val files = if (args.length == 4) args(3).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cols = (col("doc_id") + col("rep") * lit(100000000L)).as("doc_id") +:
      docs.columns.filterNot(_ == "doc_id").map(col).toIndexedSeq
    val out = spark.range(0, reps, 1, reps).withColumnRenamed("id", "rep")
      .join(broadcast(docs))
      .select(cols: _*)
    out.repartition(files).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"""{"docs": ${spark.read.parquet(s"$outDir/documents.parquet").count()}}""")
    spark.stop()
  }
}
