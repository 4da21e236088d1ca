package graft.tools
import org.apache.spark.sql.SparkSession

/** r6: per-stage wall of the fe_pipeline bench line (fresh ckpt dir each
  * pass, like Bench). */
object PipeSplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline._
    // warm
    KgPipeline.run(spark, dir, KgPipeline.tempDir("pipe_probe_")).count()
    for (_ <- 1 to 2) {
      val ck = KgPipeline.tempDir("pipe_probe_")
      var last = 0L
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[pipe-split] $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      t("pages")(KgPipeline.run(spark, dir, ck, "pages"))
      t("extracted")(KgPipeline.run(spark, dir, ck, "extracted"))
      t("mentions")(KgPipeline.run(spark, dir, ck, "mentions"))
      t("linked")(KgPipeline.run(spark, dir, ck, "linked"))
      t("triples")(KgPipeline.run(spark, dir, ck, "triples"))
      t("count") { last = spark.read.parquet(s"$ck/stage=triples").count() }
      println(s"[pipe-split] rows $last")
    }
    spark.stop()
  }
}
