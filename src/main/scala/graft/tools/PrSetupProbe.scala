package graft.tools
import org.apache.spark.sql.SparkSession
object PrSetupProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kb = graft.sources.TpchKg.load(spark, dir)
    graft.sample.PageRank.compute(kb, iterations = 30).count() // warmup
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[pr-split] $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (_ <- 1 to 2) {
      t("iters=0")(graft.sample.PageRank.compute(kb, iterations = 0).count())
      t("iters=1")(graft.sample.PageRank.compute(kb, iterations = 1).count())
      t("iters=2")(graft.sample.PageRank.compute(kb, iterations = 2).count())
      t("iters=30")(graft.sample.PageRank.compute(kb, iterations = 30).count())
    }
    spark.stop()
  }
}
