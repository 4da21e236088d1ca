package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B probe for [[graft.text.Curation.dupSpans]]'s duplicated-gram test:
  * (a) groupBy count>1 + semi join-back (seed stream generated twice, SMJ
  * both sides) vs (b) a single window count over gram (one exchange + sort,
  * no join, grams generated once). Both are result-identical; this measures
  * which shape the operator should ship. Evidence tool, not a gate. */
object DupSpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("dupspan-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def stage(name: String)(f: => Long): Unit = {
      f // warmup
      val runs = (1 to 3).map(_ => time(f))
      println(f"[dupspan-probe] $name%-24s best ${runs.map(_._2).min}%6.2f s  rows ${runs.head._1}%d")
    }

    val corpus = graft.queries.TrainingDataQueries.corpus(spark, sfDir)
    val k = 8

    def seeds: DataFrame = corpus
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${k - 1}), i -> struct(i as pos, array_join(slice(w, i, $k), ' ') as gram))"))
        .as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.gram").as("gram"))

    def islands(dupSeeds: DataFrame): Long = {
      import org.apache.spark.sql.expressions.Window
      val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      dupSeeds
        .withColumn("brk",
          when(col("pos") > coalesce(lag(col("pos"), 1).over(byPos), lit(Long.MinValue)) + k, 1)
            .otherwise(0))
        .withColumn("island", sum(col("brk")).over(byPos))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("pos")).as("span_start"), (max(col("pos")) + (k - 1)).as("span_end"))
        .count()
    }

    stage("seeds-only") { seeds.count() }
    stage("a-join-back") {
      val dup = seeds.groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1).select(col("gram"))
      islands(seeds.join(dup, Seq("gram"), "semi"))
    }
    stage("b-window-count") {
      import org.apache.spark.sql.expressions.Window
      islands(seeds
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("gram"))))
        .filter(col("cnt") > 1).select(col("doc_id"), col("pos")))
    }
    spark.stop()
  }
}
