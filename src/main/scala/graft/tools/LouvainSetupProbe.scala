package graft.tools

import org.apache.spark.sql.functions._

/** r6: per-sub-step timing of kg_louvain's rounds=0 path. */
object LouvainSetupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("louvain-setup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[setup] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // warmup the whole path once
    graft.sample.Louvain.run(graft.sample.GraphMetrics.cooccurrence(
      graft.sources.TpchKg.load(spark, sfDir).edges, "contains"), 0).count()
    for (_ <- 1 to 2) {
      val edges = graft.sources.TpchKg.load(spark, sfDir).edges
      val e = t("e ckpt (contains distinct)") {
        edges.filter(col("pred") === "contains")
          .select(col("src"), col("dst")).distinct().localCheckpoint(true)
      }
      val ecnt = t("e.count")(e.count())
      val pairs = e.as("a").join(broadcast(e.as("b")),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
        .select(col("a.dst").as("u"), col("b.dst").as("v"))
      val wund = pairs.distinct().withColumn("w", lit(1L))
      val und = t("und ckpt (wedge+distinct)") {
        wund.filter(col("u") =!= col("v")).localCheckpoint(true)
      }
      val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v"), col("w")))
      val deg = t("deg ckpt") {
        sym.groupBy(col("u").as("id")).agg(sum(col("w")).as("k")).localCheckpoint(true)
      }
      t("twoM from deg")(deg.agg(coalesce(sum(col("k")), lit(0L))).head().getLong(0))
      t("nV = deg.count")(deg.count())
      t("comm ckpt")(deg.select(col("id"), col("id").as("c")).localCheckpoint(true))
      println(s"[setup] (e rows $ecnt)")
    }
    spark.stop()
  }
}
