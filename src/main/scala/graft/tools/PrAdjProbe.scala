package graft.tools
import org.apache.spark.sql.functions._
/** r6: sub-step timing of PageRank.computeInner's setup phase. */
object PrAdjProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val kb = graft.sources.TpchKg.load(spark, dir)
    graft.sample.PageRank.compute(kb, iterations = 2).count() // warm
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[pr-adj] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (_ <- 1 to 2) {
      val edgesW0 = kb.edges.select(col("src"), col("dst")).withColumn("w", lit(1.0))
      var edgesW: org.apache.spark.sql.DataFrame = null
      t("edgesW ckpt") { edgesW = edgesW0.localCheckpoint(true) }
      t("eCnt")(edgesW.count())
      t("nodes count")(kb.nodes.count())
      val outdeg = edgesW.groupBy("src").agg(sum(col("w")).as("outdeg"))
      val adj = edgesW.select("src", "dst", "w").join(broadcast(outdeg), Seq("src")).cache()
      t("adj cache build")(adj.count())
      val dstNodes = adj.select(col("dst").as("id")).distinct().cache()
      t("dstNodes cache")(dstNodes.count())
      val adjIter = adj.join(broadcast(dstNodes.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
        .repartition(col("src")).cache()
      t("adjIter cache")(adjIter.count())
      adj.unpersist(); dstNodes.unpersist(); adjIter.unpersist()
    }
    spark.stop()
  }
}
