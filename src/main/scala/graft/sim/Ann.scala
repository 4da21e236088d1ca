package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]):
  *  - brute-force cosine top-k (the correctness baseline),
  *  - LSH-bucketed variant (random-hyperplane signs → bucket; candidates
  *    only meet within a bucket) — the scale path: the self-join is keyed
  *    by bucket, turning the O(N²) product into Σ bucket².
  *
  * Dot products run in `aggregate`/`zip_with` column expressions (codegen;
  * no UDF) on doubles; hyperplane weights are ±1 from index arithmetic so
  * the oracle reproduces them exactly.
  */
object Ann {

  /** cosine similarity between two Array[Float] columns, computed in
    * double precision. */
  def cosine(a: Column, b: Column): Column = {
    def d(x: Column) = transform(x, v => v.cast("double"))
    val dot = aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(d(a), v => v * v), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(d(b), v => v * v), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** brute-force top-k neighbors for the given query ids:
    * (q, rank, neighbor). Ordering on round(sim, 6) desc then id keeps the
    * comparison oracle-stable under last-ulp float divergence. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q"), col("embedding").as("qe"))
    val sims = embeddings.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q"))
      .select(col("q"), col("vec_id").as("neighbor"),
        round(cosine(col("qe"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("neighbor"))
    sims.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q"), col("rank"), col("neighbor"))
  }

  val NumPlanes = 8

  /** random-hyperplane LSH bucket per vector: bit_j = [Σ_i v_i·w_ij ≥ 0],
    * w_ij = +1 if (i + 17·j) even else −1; bucket = Σ bit_j·2^j. */
  def lshBucket(embeddings: DataFrame): DataFrame = {
    val parts = embeddings.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "x")))
    val aggs = (0 until NumPlanes).map(j =>
      sum(when((col("i") + 17 * j) % 2 === 0, col("x").cast("double"))
        .otherwise(-col("x").cast("double"))).as(s"s$j"))
    parts.groupBy("vec_id").agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"),
        (0 until NumPlanes).map(j =>
          when(col(s"s$j") >= 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("bucket"))
  }

  /** near-duplicate vector pairs: same LSH bucket AND cosine ≥ threshold.
    * (a, b, sim) with a < b. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double = 0.999): DataFrame = {
    val b = lshBucket(embeddings)
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val l = b.select(col("vec_id").as("a"), col("bucket"), col("embedding").as("ea"))
    val r = b.select(col("vec_id").as("b"), col("bucket"), col("embedding").as("eb"))
    l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("ea"), col("eb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
