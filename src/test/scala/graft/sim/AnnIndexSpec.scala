package graft.sim

import graft.SparkSpec
import graft.core.ParquetTableIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted IVF index: a TableIO round trip of (centroids,
  * assignments) must search byte-equal to the inline build, and index
  * APPEND (assign only the increment against the frozen centroids) must
  * equal rebuilding the assignment table over the grown corpus — the
  * contract that makes incremental construction cost ∝ increment size. */
class AnnIndexSpec extends SparkSpec {

  private def vectors(n: Int, dim: Int = 16, from: Int = 0) = {
    import spark.implicits._
    (from until from + n).map { i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 31 + d * 7 + i * d * 1.7).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def rows(df: DataFrame): Set[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("persisted index round trip searches byte-equal to the inline build") {
    val emb = vectors(80)
    val dir = java.nio.file.Files.createTempDirectory("ivf_spec_").toString
    val io = new ParquetTableIO(spark, dir)
    val cents = Ann.ivfCentroidsLloyd(emb, nlist = 8, iters = 2)
    io.write(cents, "ivf/centroids")
    io.write(Ann.ivfAppend(cents, emb), "ivf/assign")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q"), col("embedding").as("qe"))
    val stored = rows(Ann.ivfTopKIndexed(
      emb, io.read("ivf/centroids"), io.read("ivf/assign"), q, 3, nprobe = 4))
    val inline = rows(Ann.ivfTopK(emb, 0L to 4L, 3, nlist = 8, nprobe = 4, lloyd = 2))
    assert(stored === inline)
  }

  test("append == rebuild: increment-only assignment grows the index exactly") {
    val base = vectors(60)
    val inc = vectors(20, from = 60)
    val cents = Ann.ivfCentroidsLloyd(base, nlist = 8, iters = 2)
    def assignSet(df: DataFrame) =
      Ann.ivfAppend(cents, df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // per-vector independence: appending the increment against the frozen
    // centroids == assigning the grown corpus in one shot
    assert((assignSet(base) union assignSet(inc)) === assignSet(base.unionAll(inc)))
    // and the grown index answers full-probe queries exactly: a planted
    // copy of vector 3 arriving in the increment must be its top neighbor
    val planted = base.filter(col("vec_id") === 3)
      .select(lit(9999L).as("vec_id"), col("embedding"))
    val grown = base.unionAll(planted)
    val idx = Ann.ivfAppend(cents, base).unionAll(Ann.ivfAppend(cents, planted))
    val q = base.filter(col("vec_id") === 3)
      .select(col("vec_id").as("q"), col("embedding").as("qe"))
    val top = Ann.ivfTopKIndexed(grown, cents, idx, q, 1, nprobe = 8).head()
    assert(top.getLong(2) === 9999L)
  }

  test("queries outside the corpus id space search the stored index") {
    val emb = vectors(50)
    val cents = Ann.ivfCentroidsLloyd(emb, nlist = 8)
    val assign = Ann.ivfAppend(cents, emb)
    // a NEW query vector (id far outside the corpus, never indexed): full
    // probe must return its exact brute-force neighbors over the corpus
    import spark.implicits._
    val qv = Array.tabulate(16)(d => math.sin(7 * 31 + d * 7 + 7 * d * 1.7).toFloat)
    val q = Seq((777000L, qv)).toDF("q", "qe")
    val got = Ann.ivfTopKIndexed(emb, cents, assign, q, 3, nprobe = 8)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    // brute force over the corpus with the same tie-break
    val bf = emb.select(col("vec_id").as("neighbor"),
        round(Ann.cosine(col("embedding"), typedLit(qv)), 6).as("sim"))
      .orderBy(col("sim").desc, col("neighbor")).limit(3)
      .collect().zipWithIndex.map { case (r, i) => (i + 1, r.getLong(0)) }.toSet
    assert(got === bf)
    // vec 7 shares the fixture formula with the query, so it must rank 1
    assert(got.contains((1, 7L)))
  }
}
