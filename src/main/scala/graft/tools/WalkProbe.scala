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

    // per-job wall times (start→end, includes scheduling + all stages):
    // the decomposition evidence for the per-step floor
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, String)]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStart.put(j.jobId, j.time)
        jobStages.put(j.jobId, j.stageIds.map(_.toInt))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStart.get(j.jobId)).getOrElse(j.time)
        jobLog.add((j.jobId, t0, j.time))
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.submissionTime; b <- i.completionTime} yield b - a).getOrElse(-1L)
        stageLog.add((i.stageId, i.numTasks, wall, i.name.take(60).replace('\n', ' ')))
      }
    })

    def run(name: String, mk: () => graft.sample.WalkSampler): Unit = {
      mk().sample(200).nodes.count() // warmup (JIT, parquet footers)
      (1 to 2).foreach { pass =>
        val s = mk()
        jobLog.clear()
        val t0 = System.nanoTime()
        s.sample(200).nodes.count()
        val total = (System.nanoTime() - t0) / 1e9
        val st = s.lastStats.get
        println(f"[walk-probe] $name%-12s pass $pass: ${st.steps}%3d steps, " +
          f"setup ${st.setupSec}%5.2f s, loop ${st.loopSec}%5.2f s " +
          f"(${st.loopSec * 1000 / math.max(1, st.steps)}%6.1f ms/step), " +
          f"finalize ${total - st.setupSec - st.loopSec}%5.2f s, total $total%5.2f s")
        val jobs = jobLog.toArray(Array.empty[(Int, Long, Long)]).sortBy(_._1)
        val spans = jobs.map { case (id, a, b) => f"$id:${(b - a) / 1e3}%.2fs" }
        val gaps = jobs.sliding(2).collect {
          case Array((_, _, e1), (_, s2, _)) => (s2 - e1) / 1e3 }.toSeq
        println(s"[walk-probe]   jobs=${jobs.length} " +
          s"walls=[${spans.mkString(" ")}] " +
          f"gapSum=${gaps.sum}%.2fs")
        if (pass == 2) {
          val stages = stageLog.toArray(Array.empty[(Int, Int, Long, String)])
            .map(s => s._1 -> s).toMap
          jobs.foreach { case (jid, a, b) =>
            if (b - a > 300) {
              val ss = jobStages.getOrDefault(jid, Nil).sorted.flatMap(stages.get)
                .map { case (id, n, w, nm) =>
                  f"s$id(t=$n,${w / 1e3}%.2fs,${nm.take(28)})" }
              println(f"[walk-probe]   job $jid%4d ${(b - a) / 1e3}%.2fs: ${ss.mkString(" ")}")
            }
          }
        }
        stageLog.clear()
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
