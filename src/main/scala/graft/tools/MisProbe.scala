package graft.tools

import org.apache.spark.sql.SparkSession

/** Evidence probe for the kg_mis gate parameters: prints the Luby round
  * count and per-round admissions on the co-purchase projection so the
  * oracle's fixed unroll depth is set with measured margin
  * (run via sbt "runMain graft.tools.MisProbe [sfDir]"). */
object MisProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val und = graft.sample.GraphMetrics.cooccurrence(
      graft.sources.TpchKg.load(spark, dir).edges, "contains").localCheckpoint(true)
    val t0 = System.nanoTime()
    val mis = graft.sample.GraphMetrics.maximalIndependentSet(und)
    val byRound = mis.groupBy("mis_round").count().orderBy("mis_round").collect()
    println(s"[mis] $dir edges=${und.count()} members=${mis.count()} " +
      f"rounds=${byRound.map(_.getInt(0)).max} ${(System.nanoTime() - t0) / 1e9}%.1fs")
    byRound.foreach(r => println(s"[mis] round ${r.getInt(0)}: ${r.getLong(1)} admitted"))
    spark.stop()
  }
}
