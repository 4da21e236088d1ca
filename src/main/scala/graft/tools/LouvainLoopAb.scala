package graft.tools

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** r6 A/B: Louvain round-loop physical variants over identical inputs. */
object LouvainLoopAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("louvain-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val kb = graft.sources.TpchKg.load(spark, sfDir)
    val wund = graft.sample.GraphMetrics.cooccurrence(kb.edges, "contains")
      .withColumn("w", lit(1L))
    val und = wund.filter(col("u") =!= col("v")).localCheckpoint(true)
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v"), col("w")))
    val deg = sym.groupBy(col("u").as("id")).agg(sum(col("w")).as("k")).localCheckpoint(true)
    val twoM = deg.agg(coalesce(sum(col("k")), lit(0L))).head().getLong(0)
    val comm0 = deg.select(col("id"), col("id").as("c")).localCheckpoint(true)

    def loop(rounds: Int, useBc: Boolean, ckptKin: Boolean): Long = {
      def bc(df: DataFrame): DataFrame = if (useBc) broadcast(df) else df
      var comm = comm0
      for (_ <- 1 to rounds) {
        val cstats = comm.join(bc(deg), Seq("id"))
          .groupBy("c").agg(sum(col("k")).as("stot"), count(lit(1)).as("n"))
        val stot = cstats.select(col("c"), col("stot"))
        val kin0 = sym
          .join(bc(comm.select(col("id").as("v"), col("c"))), Seq("v"))
          .groupBy(col("u").as("id"), col("c"))
          .agg(sum(col("w")).as("kin"))
        val kin = if (ckptKin) kin0.localCheckpoint(true) else kin0
        val own = comm.select(col("id"), col("c").as("oc"))
        val k2 = kin.join(bc(own), Seq("id"))
        val stay = own
          .join(bc(k2.filter(col("c") === col("oc")).select(col("id"), col("kin"))),
            Seq("id"), "left_outer")
          .select(col("id"), col("oc").as("c"),
            coalesce(col("kin"), lit(0L)).as("kin"), lit(0).as("flag"))
        val sizes = cstats.select(col("c"), col("n"))
        val moves = k2.filter(col("c") =!= col("oc"))
          .join(bc(sizes.select(col("c"), col("n").as("tn"))), Seq("c"))
          .join(bc(sizes.select(col("c").as("oc"), col("n").as("on"))), Seq("oc"))
          .filter(!(col("on") === 1 && col("tn") === 1 && col("c") > col("oc")))
          .select(col("id"), col("c"), col("kin"), lit(1).as("flag"))
        val cand = stay.unionAll(moves)
        val scored = cand
          .join(bc(stot), Seq("c"))
          .join(bc(deg), Seq("id"))
          .select(col("id"), col("c"), col("flag"),
            (lit(twoM) * col("kin") - col("k") *
              (col("stot") - when(col("flag") === 0, col("k")).otherwise(lit(0L))))
              .as("score"))
        comm = scored.groupBy("id")
          .agg(min(struct((-col("score")).as("ns"), col("flag"), col("c"))).as("m"))
          .select(col("id"), col("m.c").as("c"))
          .localCheckpoint(true)
      }
      comm.count()
    }
    def t(name: String)(f: => Long): Unit = {
      f // warmup
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[louvain-ab] $name%-24s best ${runs.min}%6.2f s  " +
        runs.map(x => f"$x%.2f").mkString("[", ", ", "]"))
    }
    t("2r old (smj, lazy kin)")(loop(2, useBc = false, ckptKin = false))
    t("2r bc, lazy kin")(loop(2, useBc = true, ckptKin = false))
    t("2r bc + kin ckpt")(loop(2, useBc = true, ckptKin = true))
    t("2r smj + kin ckpt")(loop(2, useBc = false, ckptKin = true))
    spark.stop()
  }
}
