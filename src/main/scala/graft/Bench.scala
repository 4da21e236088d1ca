package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE JSON line:
  * headline per-query seconds at local[CPUS], pipeline throughput
  * (triples/sec), and the two-cluster-size scaling evidence mandated by the
  * north rule — the same CPU-bound job at local[LOW] vs local[HIGH] cores
  * on the same input, with efficiency = (throughput_high/throughput_low) /
  * (high/low). (Sandbox stand-in for N vs 4N executors; see BASELINE.md.)
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** CPU-bound scaling job: MinHash-LSH dedup candidates over the corpus
    * replicated `reps`× (deterministic id offsets). Work scales with data;
    * the job is codegen hashing + one shuffle — cores are the bottleneck,
    * which is what the efficiency criterion measures. */
  private def scalingJob(spark: SparkSession, sfDir: String, reps: Int): Long = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // drive replication from a reps-partition range × broadcast docs so
    // corpus GENERATION is parallel too (the sf parquet is one small file
    // → a docs-driven cross join would generate serially and cap scaling
    // via Amdahl); values are data-keyed, so partitioning cannot change
    // results
    val replicated = spark.range(0, reps, 1, reps).withColumnRenamed("id", "rep")
      .join(broadcast(docs))
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        concat(col("text"), lit(" r"), col("rep")).as("text"))
    graft.dedup.Dedup.minhash(replicated).count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val low = sys.env.getOrElse("SPARK_GRAFT_SCALE_LOW", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "512").toInt

    // ---- headline queries at local[cpus] ----
    var spark = session(cpus)
    val headline: Seq[(String, SparkSession => Long)] = Seq(
      "kg_triples" -> (s => graft.sources.TpchKg.load(s, sfDir).triples.count()),
      "fe_pipeline" -> (s => graft.pipeline.KgPipeline
        .run(s, sfDir, graft.pipeline.KgPipeline.tempDir("bench_fe_")).count()),
      "smp_forest_fire_500" -> (s =>
        new graft.sample.ForestFireSampler(graft.sources.TpchKg.load(s, sfDir), 42L)
          .sample(500).nodes.count()),
      "smp_rwj_200" -> (s =>
        new graft.sample.WalkSampler(graft.sources.TpchKg.load(s, sfDir), 42L,
          jumpProb = Some(0.1), walkers = 64).sample(200).nodes.count()),
      "pagerank_30" -> (s =>
        graft.sample.PageRank.compute(graft.sources.TpchKg.load(s, sfDir), iterations = 30).count()),
      "ce_exists_nested" -> (s => graft.expr.Eval(graft.sources.TpchKg.load(s, sfDir),
        graft.expr.Exists("placedBy", graft.expr.Exists("inNation",
          graft.expr.HasValue("inRegion", "r:2")))).count()),
      "td_dedup_minhash" -> (s => graft.dedup.Dedup.minhashLsh(
        graft.queries.TrainingDataQueries.corpus(s, sfDir), 0.8).count()),
      "td_ann_topk" -> (s => graft.sim.Ann.bruteForceTopK(
        s.read.parquet(s"$sfDir/embeddings.parquet"), 0L to 9L, 5).count()))

    var triples = 0L
    var pipelineSec = 0.0
    val skipHeadline = sys.env.get("SPARK_GRAFT_SKIP_HEADLINE").contains("1")
    val queryTimes =
      if (skipHeadline) Seq.empty[(String, Double)]
      else headline.map { case (name, job) =>
        val (res, sec) = time(job(spark))
        if (name == "fe_pipeline") { triples = res; pipelineSec = sec }
        name -> sec
      }

    // ---- scaling evidence: same job, same input, two parallelism levels.
    // One small warmup (JIT + parquet footer cache) then best-of-2 timed
    // runs per level — the measurement, not the plan, is what varies. ----
    def measure(cores: Int): (Long, Double) = {
      spark = session(cores)
      scalingJob(spark, sfDir, math.max(1, reps / 8)) // warmup
      val (w1, t1) = time(scalingJob(spark, sfDir, reps))
      val (w2, t2) = time(scalingJob(spark, sfDir, reps))
      require(w1 == w2)
      (w1, math.min(t1, t2))
    }
    // machine calibration: pure-arithmetic thread scaling OUTSIDE Spark —
    // cloud VMs rarely deliver a full 4× from 4× threads (frequency/steal);
    // interleaved with each measurement so temporal co-tenancy drift hits
    // both the same way
    def rawScale(threads: Int): Double = {
      val per = 4000000000L / threads
      def burn(seed: Long): Thread = new Thread(() => {
        var h = seed; var k = 0L
        while (k < per) { h = (h * 1000003L + 7L) % 2147483647L; k += 1 }
        if (h == 42L) println("")
      })
      val t0 = System.nanoTime()
      val ts = (0 until threads).map(i => { val t = burn(i); t.start(); t })
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    rawScale(cpus) // JIT warmup
    val (workLow, tLow) = measure(low)
    val rawLow = math.min(rawScale(low), rawScale(low))
    val (workHigh, tHigh) = measure(cpus)
    val rawHigh = math.min(rawScale(cpus), rawScale(cpus))
    require(workLow == workHigh, "scaling job output differs across parallelism")
    val thLow = workLow / tLow
    val thHigh = workHigh / tHigh
    val efficiency = (thHigh / thLow) / (cpus.toDouble / low)
    val ceiling = (rawLow / rawHigh) / (cpus.toDouble / low)
    val efficiencyVsMachine = math.min(1.0, efficiency / math.min(1.0, ceiling))

    val qs = queryTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum
    val tput = if (pipelineSec > 0) triples / pipelineSec else 0.0
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_triples":$triples,"pipeline_triples_per_sec":$tput%.1f,"scaling":{"cores_low":$low,"cores_high":$cpus,"rows":$workLow,"sec_low":$tLow%.3f,"sec_high":$tHigh%.3f,"rows_per_sec_low":$thLow%.1f,"rows_per_sec_high":$thHigh%.1f,"efficiency":$efficiency%.3f,"machine_ceiling":$ceiling%.3f,"efficiency_vs_machine":$efficiencyVsMachine%.3f}}""")
    spark.stop()
  }
}
