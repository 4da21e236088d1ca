package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r6: warm splits of the FF bench line — draw loop, restrictedTo count,
  * pruneUnusedDataProps collect. */
object FfSplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kb = graft.sources.TpchKg.load(spark, dir)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ff-split] $name%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warmup full line
    new graft.sample.ForestFireSampler(kb, 42L).sample(500).nodes.count()
    for (_ <- 1 to 2) {
      t("checkInput nodes.count")(kb.nodes.count())
      val sampler = new graft.sample.ForestFireSampler(kb, 42L)
      var drawn: graft.sample.Drawn = null
      t("draw(500)") { drawn = sampler.draw(500) }
      val sample = drawn.sampledNodes.select(col("id")).distinct()
      val base = kb.restrictedTo(sample)
      t("prune collect (attrs)")(
        base.attrs.select("prop").distinct().collect())
      t("restricted nodes.count")(base.nodes.count())
      t("full finalize+count")(
        graft.sample.Samplers.finalizeSample(kb, drawn, 1.0, 42L).nodes.count())
    }
    spark.stop()
  }
}
