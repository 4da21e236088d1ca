package graft.tools
import org.apache.spark.sql.functions._
object WidenAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("widen-ab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kb = graft.sources.TpchKg.load(spark, sfDir)
    def t(name: String)(f: => Any): Unit = {
      f // warmup
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[widen-ab] $name%-30s best ${runs.min}%6.2f s  " +
        runs.map(x => f"$x%.2f").mkString("[", ", ", "]"))
    }
    val e0 = kb.edges.filter(col("pred") === "contains")
      .select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val eW = e0.repartition(32).localCheckpoint(true)
    println(s"[widen-ab] e0 parts=${e0.rdd.getNumPartitions} eW parts=${eW.rdd.getNumPartitions}")
    def wedge(e: org.apache.spark.sql.DataFrame): Long =
      e.as("a").join(broadcast(e0.as("b")),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
        .select(col("a.dst").as("u"), col("b.dst").as("v"))
        .distinct().count()
    t("wedge+distinct from 9 parts")(wedge(e0))
    t("wedge+distinct from 32 parts")(wedge(eW))
    t("widen job itself")(e0.repartition(32).localCheckpoint(true).rdd.getNumPartitions)
    // spCounts-side widening NOT measured further: the wedge numbers
    // already show the widen job (0.36 s) costs more than the fanout
    // parallelism buys (0.15 s) at this scale — rejected.
    spark.stop()
  }
}
