package graft.tools

import org.apache.spark.sql.functions._

/** r6 stage probe for kg_louvain / kg_linkpred / kg_spcounts inputs. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("graph-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def stage(name: String)(f: => Long): Unit = {
      f // warmup
      val runs = (1 to 2).map(_ => time(f))
      println(f"[graph-probe] $name%-30s best ${runs.map(_._2).min}%6.2f s  rows ${runs.head._1}%d")
    }
    def kb = graft.sources.TpchKg.load(spark, sfDir)
    stage("contains edges")(kb.edges.filter(col("pred") === "contains").count())
    stage("cooccurrence")(graft.sample.GraphMetrics.cooccurrence(kb.edges, "contains").count())
    stage("louvain r2 on coocc")(graft.sample.Louvain.run(
      graft.sample.GraphMetrics.cooccurrence(kb.edges, "contains"), 2).count())
    stage("undirected contains")(graft.sample.GraphMetrics.undirected(kb.edges, "contains").count())
    stage("linkpred")(graft.sample.GraphMetrics.linkPredFeatures(
      graft.sample.GraphMetrics.undirected(kb.edges, "contains"), 32, 2).count())
    stage("kg_spcounts")(graft.queries.KgQueries.queries("kg_spcounts")(spark, sfDir).count())
    stage("kg_entity_summary")(graft.core.KgStats.entitySummaries(kb.edges, 3).count())
    spark.stop()
  }
}
