package graft.tools

import org.apache.spark.sql.SparkSession

/** Evidence probe for the kg_ktruss gate parameters: for a few k values,
  * prints peel rounds + surviving edges of the co-purchase projection so
  * the oracle's fixed unroll depth can be set with measured 2× margin
  * (run via sbt "runMain graft.tools.TrussProbe [sfDir [k...]]"). */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ks = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(3, 4, 6, 10, 20)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val und = graft.sample.GraphMetrics.cooccurrence(
      graft.sources.TpchKg.load(spark, dir).edges, "contains").localCheckpoint(true)
    println(s"[truss] $dir edges=${und.count()}")
    ks.foreach { k =>
      val t0 = System.nanoTime()
      val (sup, rounds) = graft.sample.GraphMetrics.kTrussPeel(und, k)
      println(f"[truss] k=$k%-3d rounds=$rounds%-3d survivors=${sup.count()}%-8d ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
