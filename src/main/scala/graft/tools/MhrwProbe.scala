package graft.tools

import graft.sources.TpchKg
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe for the MHRW bias gate (smp_mhrw_props): prints the mean
  * symmetrized degree of the MHRW vs plain-RW node sample on a given sf
  * dir, plus steps/wall — the margin behind the gate's `deg_unbiased`
  * boolean. Usage: runMain graft.tools.MhrwProbe <sfDir> [n] */
object MhrwProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kb = TpchKg.load(spark, sfDir)
    val e = kb.edges.select(col("src"), col("pred"), col("dst"))
    val deg = e.select(col("src").as("id")).unionAll(e.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    def meanDeg(ids: org.apache.spark.sql.DataFrame): Double =
      ids.join(deg, Seq("id")).agg(avg(col("deg"))).head().getDouble(0)
    for (seed <- Seq(11L, 23L, 47L)) {
      var t0 = System.nanoTime()
      val mh = new graft.sample.MhrwSampler(kb, seed = seed).draw(n)
      val mhMean = meanDeg(mh.sampledNodes)
      val mhSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val rw = new graft.sample.WalkSampler(kb, seed = seed).draw(n)
      val rwMean = meanDeg(rw.sampledNodes)
      val rwSec = (System.nanoTime() - t0) / 1e9
      println(f"[mhrw-probe] seed=$seed n=$n mhrw_mean_deg=$mhMean%.2f (${mhSec}%.1fs) " +
        f"rw_mean_deg=$rwMean%.2f (${rwSec}%.1fs) ratio=${rwMean / mhMean}%.2f")
    }
    spark.stop()
  }
}
