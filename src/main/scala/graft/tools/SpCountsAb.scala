package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r6 A/B: kg_spcounts BFS loop — SMJ everywhere (current) vs per-round
  * count-gated broadcasts of the frontier / settled sides. */
object SpCountsAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("spcounts-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val kb = graft.sources.TpchKg.load(spark, sfDir)
    val contains = kb.edges.filter(col("pred") === "contains").localCheckpoint(true)
    val seeds = contains.select(col("src").as("id")).distinct()
      .filter(expr("CAST(substr(id, 3) AS BIGINT) % 997 = 0"))
    val und = graft.sample.GraphMetrics.undirected(contains, "contains")
      .localCheckpoint(true)
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))

    def run(maxR: Int, gated: Boolean): Long = {
      val gate = 4000000L
      var settled = seeds.select(col("id").as("src"), col("id").as("node"),
        lit(0).as("dist"), lit(1L).as("sigma")).localCheckpoint(true)
      var frontier = settled
      var settledRows = if (gated) settled.count() else 0L
      var frontierRows = settledRows
      for (r <- 1 to maxR) {
        val f0 = frontier.join(sym.withColumnRenamed("u", "node"), Seq("node"))
          .select(col("src"), col("v").as("node"), col("sigma"))
        val fb =
          if (gated && frontierRows <= gate)
            broadcast(frontier).join(sym.withColumnRenamed("u", "node"), Seq("node"))
              .select(col("src"), col("v").as("node"), col("sigma"))
          else f0
        val sb = if (gated && settledRows <= gate)
          broadcast(settled.select(col("src"), col("node")))
        else settled.select(col("src"), col("node"))
        val nxt = fb
          .join(sb, Seq("src", "node"), "left_anti")
          .groupBy("src", "node").agg(sum(col("sigma")).as("sigma"))
          .select(col("src"), col("node"), lit(r).as("dist"), col("sigma"))
          .localCheckpoint(true)
        if (gated) { frontierRows = nxt.count(); settledRows += frontierRows }
        settled = settled.unionAll(nxt)
        frontier = nxt
      }
      settled.count()
    }
    def t(name: String)(f: => Long): Unit = {
      f // warmup
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[spcounts-ab] $name%-18s best ${runs.min}%6.2f s  " +
        runs.map(x => f"$x%.2f").mkString("[", ", ", "]"))
    }
    t("smj (current)")(run(4, gated = false))
    t("gated broadcast")(run(4, gated = true))
    spark.stop()
  }
}
