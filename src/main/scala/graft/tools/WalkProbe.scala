package graft.tools

/** Evidence probe for the walk-sampler bench lines: runs the exact
  * smp_rwj_200 / smp_rwp_200 configurations and reports the step count and
  * the wall split between setup (teleport index + PageRank + neighbor
  * table) and the step loop — so a bench number can be attributed to
  * "N sequential steps × per-step Spark-job floor" instead of guessed at.
  * Evidence tool, not a gate. */
object WalkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("walk-probe").getOrCreate()

    def run(name: String, mk: () => graft.sample.WalkSampler): Unit = {
      mk().sample(200).nodes.count() // warmup (JIT, parquet footers)
      (1 to 2).foreach { pass =>
        val s = mk()
        val t0 = System.nanoTime()
        s.sample(200).nodes.count()
        val total = (System.nanoTime() - t0) / 1e9
        val st = s.lastStats.get
        println(f"[walk-probe] $name%-12s pass $pass: ${st.steps}%3d steps, " +
          f"setup ${st.setupSec}%5.2f s, loop ${st.loopSec}%5.2f s " +
          f"(${st.loopSec * 1000 / math.max(1, st.steps)}%6.1f ms/step), " +
          f"finalize ${total - st.setupSec - st.loopSec}%5.2f s, total $total%5.2f s")
      }
    }

    run("rwj_200", () => new graft.sample.WalkSampler(
      graft.sources.TpchKg.load(spark, sfDir), 42L,
      jumpProb = Some(0.1), walkers = 64))
    run("rwp_200", () => new graft.sample.WalkSampler(
      graft.sources.TpchKg.load(spark, sfDir), 42L,
      prioritized = true, prIterations = 10, walkers = 64))
    spark.stop()
  }
}
