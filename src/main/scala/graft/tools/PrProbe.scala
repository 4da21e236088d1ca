package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val kb = graft.sources.TpchKg.load(spark, dir)
    graft.sample.PageRank.compute(kb, iterations = 2).count() // warm caches
    val stages = new AtomicInteger(); val tasks = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(sc.stageInfo.numTasks)
      }
    })
    val t0 = System.nanoTime()
    graft.sample.PageRank.compute(kb, iterations = 30, checkpointEvery = sys.env.getOrElse("PR_CK", "10").toInt).count()
    println(f"time=${(System.nanoTime()-t0)/1e9}%.2f stages=${stages.get} tasks=${tasks.get}")
    spark.stop()
  }
}
