package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off wall-clock probe for the ForestFire burn loop (dev tool). */
object FfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kb = graft.sources.TpchKg.load(spark, dir)
    val t0 = System.nanoTime()
    val n = new graft.sample.ForestFireSampler(kb, 42L).sample(500).nodes.count()
    println(f"FF n=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
