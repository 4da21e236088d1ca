package graft.tools
import org.apache.spark.sql.functions._
object CoocPartsPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("cooc-peek").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kb = graft.sources.TpchKg.load(spark, sfDir)
    val e = kb.edges.filter(col("pred") === "contains")
      .select(col("src"), col("dst")).distinct().localCheckpoint(true)
    println(s"[peek] e parts = ${e.rdd.getNumPartitions}, rows = ${e.count()}")
    val und = graft.sample.GraphMetrics.cooccurrence(kb.edges, "contains")
      .localCheckpoint(true)
    println(s"[peek] und parts = ${und.rdd.getNumPartitions}, rows = ${und.count()}")
    val contains = kb.edges.filter(col("pred") === "contains").localCheckpoint(true)
    println(s"[peek] contains parts = ${contains.rdd.getNumPartitions}")
    spark.stop()
  }
}
