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
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.wholeStage", sys.env.getOrElse("SPARK_GRAFT_WSCG", "true")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kb = graft.sources.TpchKg.load(spark, dir)
    val n0 = sys.env.getOrElse("SPARK_GRAFT_FF_N", "500").toInt
    val t0 = System.nanoTime()
    val sampler = new graft.sample.ForestFireSampler(kb, 42L)
    val drawn = sampler.draw(n0)
    val t1 = System.nanoTime()
    val n = graft.sample.Samplers.finalizeSample(kb, drawn, 1.0, 42L).nodes.count()
    val t2 = System.nanoTime()
    println(f"FF n=$n draw=${(t1 - t0) / 1e9}%.1f finalize=${(t2 - t1) / 1e9}%.1f")
    spark.stop()
  }
}
