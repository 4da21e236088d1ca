package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence tool for PageRank.computeFrom's warm-start claim: rank the
  * TPC-H KG minus a ~5% hash-planted edge delta, then re-rank the FULL
  * graph cold (init 1.0) vs warm (init = v1 fixed point) at the same tol
  * and report sweep counts + the L1 gap between the two fixed points.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.PrIncrementalProbe"
  */
object PrIncrementalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the CYCLIC web link graph (hub back-edges close loops) — a depth-3
    // DAG like the TPC-H KG converges exactly in 4-5 Jacobi sweeps and
    // leaves a warm start nothing to save
    val links = graft.pipeline.LinkGraph.links(
      graft.pipeline.Pages.fromDir(spark, sfDir)).toDF()
    val kb = graft.pipeline.LinkGraph.asKb(links)
    val delta = pmod(xxhash64(col("src"), col("dst")), lit(20)) === 0
    val kb1 = kb.copy(edges = kb.edges.filter(!delta))
    val empty = kb.nodes.select(col("id"), lit(1.0).as("pr")).limit(0)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val ((pr1, s1), t1) = timed(graft.sample.PageRank.computeFrom(kb1, empty))
    val ((cold, sCold), tCold) = timed(graft.sample.PageRank.computeFrom(kb, empty))
    val ((warm, sWarm), tWarm) = timed(graft.sample.PageRank.computeFrom(kb, pr1))
    val l1 = cold.withColumnRenamed("pr", "pc").join(warm, Seq("id"))
      .agg(sum(abs(col("pr") - col("pc")))).first().getDouble(0)
    println(f"[probe] v1 sweeps=$s1 (${t1}%.1fs); full cold sweeps=$sCold (${tCold}%.1fs); " +
      f"warm sweeps=$sWarm (${tWarm}%.1fs); L1(cold,warm)=$l1%.3e")
    spark.stop()
  }
}
