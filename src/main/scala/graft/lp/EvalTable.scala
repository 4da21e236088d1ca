package graft.lp

import graft.core.Kb
import graft.expr.ClassExpr
import graft.sample.Samplers
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The reference's primary experiment — examples/evaluation_table_generator.py
  * — as one engine call: for each sampler × iteration, draw a
  * `fraction`-of-the-KB sample (default 0.10, the reference's
  * --sampling_size), trim each learning problem to the sample
  * (LpJson.restrictToSample), score a hypothesis class expression with F1
  * against the encoded LP on the SAMPLED graph, and aggregate mean/σ_pop
  * per (sampler, lp) over `iterations` (default 10, the reference's
  * --iterations; stats per :189-207).
  *
  * The reference fits an external concept learner (EvoLearner/CELOE) per
  * iteration; the learner is out of engine scope (SURVEY §2.9), so the
  * hypothesis to score is supplied per LP — e.g. a winner from
  * Hypotheses.topN over a candidate pool.
  */
object EvalTable {

  def run(kb: Kb, lps: Seq[(String, Lp, ClassExpr)],
          samplerNames: Seq[String], fraction: Double = 0.10,
          iterations: Int = 10, seed: Long = 42L,
          keyed: Option[DataFrame] = None): DataFrame = {
    val spark = kb.spark
    val n = math.max(1, (kb.nodes.count() * fraction).toInt)
    val rows = for {
      name <- samplerNames
      (lpName, lp, ce) <- lps
    } yield {
      val scores = (0 until iterations).map { i =>
        val sampler = Samplers.byName(name, kb,
          lp = lp.pos ++ lp.neg, seed = seed + i, keyed = keyed)
        val sampled = sampler.sample(n).cache()
        val trimmed = LpJson.restrictToSample(lp, sampled, seed + i)
        val score =
          if (trimmed.pos.isEmpty) 0.0
          else {
            val elp = LearningProblem.encode(kb = sampled, lp = trimmed, seed = seed + i)
            LearningProblem.evaluateConcept(sampled, ce, F1, elp)._2
          }
        sampled.unpersist()
        score
      }
      val mean = scores.sum / iterations
      val sd = math.sqrt(scores.map(s => (s - mean) * (s - mean)).sum / iterations)
      Row(name, lpName, round5(mean), round5(sd), iterations)
    }
    val schema = StructType(Seq(
      StructField("sampler", StringType, nullable = false),
      StructField("lp", StringType, nullable = false),
      StructField("mean_f1", DoubleType, nullable = false),
      StructField("sd_f1", DoubleType, nullable = false),
      StructField("iterations", IntegerType, nullable = false)))
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }

  private def round5(x: Double): Double =
    BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
}
