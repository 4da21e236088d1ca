package graft.tools

import org.apache.spark.sql.functions._

/** r6: kg_louvain wall split — setup (coocc + und/deg/comm checkpoints)
  * vs per-round cost, by timing rounds = 0 / 1 / 2. */
object LouvainRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("louvain-rounds").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(r: Int): Long = graft.sample.Louvain.run(
      graft.sample.GraphMetrics.cooccurrence(
        graft.sources.TpchKg.load(spark, sfDir).edges, "contains"), r).count()
    run(2) // warmup
    for (r <- Seq(0, 1, 2, 2)) {
      val t = time(run(r))
      println(f"[louvain-rounds] rounds=$r wall=$t%6.2f s")
    }
    spark.stop()
  }
}
