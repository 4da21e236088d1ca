package graft.tools

import org.apache.spark.sql.functions._

/** r6: dump the per-round kin-join plan of Louvain (the loop's plans are
  * invisible to BenchExtra because localCheckpoint executes eagerly). */
object LouvainPlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .appName("louvain-peek").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val kb = graft.sources.TpchKg.load(spark, sfDir)
    val wund = graft.sample.GraphMetrics.cooccurrence(kb.edges, "contains")
      .withColumn("w", lit(1L))
    val und = wund.filter(col("u") =!= col("v")).localCheckpoint(true)
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v"), col("w")))
    val deg = sym.groupBy(col("u").as("id")).agg(sum(col("w")).as("k")).localCheckpoint(true)
    val comm = deg.select(col("id"), col("id").as("c")).localCheckpoint(true)
    println("=== und stats: " + und.queryExecution.optimizedPlan.stats)
    println("=== comm stats: " + comm.queryExecution.optimizedPlan.stats)
    val kin = sym.join(comm.select(col("id").as("v"), col("c")), Seq("v"))
      .groupBy(col("u").as("id"), col("c")).agg(sum(col("w")).as("kin"))
    println(kin.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate"))
      .mkString("\n"))
    spark.stop()
  }
}
