package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale training corpora:
  * exact (hash group-by), MinHash + LSH banding (candidate generation →
  * exact Jaccard verification), SimHash, and n-gram Jaccard. All draws are
  * seeded hash arithmetic (no fitted models) — outputs are identical across
  * parallelism levels and reproducible in the SQL oracle.
  *
  * Scale shape: shingling is an explode (map-side); MinHash is one hash
  * aggregate keyed by (doc, j); LSH banding buckets by (band,
  * signature-slice) so the candidate self-join only meets same-bucket rows;
  * exact Jaccard runs only on candidate pairs. The only quadratic blow-up
  * is within a bucket, bounded by the banding parameters.
  */
object Dedup {

  val NumHashes = 16
  val BandRows = 4
  val P = 2147483647L
  def hashA(j: Int): Long = 1000003L + 999983L * j
  def hashB(j: Int): Long = 7L + 104729L * j

  /** exact dedup: keep the minimum id per identical text. */
  def exact(corpus: DataFrame): DataFrame =
    corpus.groupBy(col("text")).agg(min(col("doc_id")).as("keeper"))
      .select(col("keeper").as("doc_id"))

  /** (doc_id, j, mh): MinHash signatures over distinct 3-gram shingles —
    * mh_j = min over shingles of (a_j·h + b_j) mod P. */
  def minhash(corpus: DataFrame): DataFrame = {
    val sh = TextOps.shingles(corpus)
    val perHash = (0 until NumHashes).map { j =>
      sh.select(col("doc_id"), lit(j).as("j"),
        pmod(col("h") * hashA(j) + hashB(j), lit(P)).as("v"))
    }.reduce(_.unionAll(_))
    perHash.groupBy("doc_id", "j").agg(min(col("v")).as("mh"))
  }

  /** LSH band keys: (doc_id, band, key), key = band's signature rows joined
    * in j order. */
  def lshBands(corpus: DataFrame): DataFrame =
    minhash(corpus)
      .withColumn("band", (col("j") / BandRows).cast("int"))
      .groupBy("doc_id", "band")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("j"), col("mh")))),
        x => x.getField("mh").cast("string")), "_").as("key"))

  /** near-dup pairs via MinHash-LSH banding + exact Jaccard ≥ threshold.
    * Returns (a, b, jaccard) with a < b, Jaccard rounded to 5. */
  def minhashLsh(corpus: DataFrame, threshold: Double = 0.8): DataFrame = {
    val bands = lshBands(corpus)
    val candidates = bands.select(col("doc_id").as("a"), col("band"), col("key"))
      .join(bands.select(col("doc_id").as("b"), col("band"), col("key")), Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    jaccardOf(corpus, candidates).filter(col("jaccard") >= threshold)
  }

  /** exact n-gram Jaccard for given (a, b) pairs: |A∩B| / |A∪B| over
    * distinct shingles, rounded to 5. Pairs with empty intersection yield
    * jaccard 0 via the left join. */
  def jaccardOf(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val sh = TextOps.shingles(corpus)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.withColumnRenamed("doc_id", "a"), Seq("a"))
      .join(sh.withColumnRenamed("doc_id", "b"), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    pairs
      .join(inter, Seq("a", "b"), "left_outer")
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), Seq("a"))
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), Seq("b"))
      .select(col("a"), col("b"),
        round(coalesce(col("i"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("i"), lit(0L))), 5).as("jaccard"))
  }

  /** SimHash (16-bit): bit_j set iff the shingle-majority hashes to 1 under
    * the j-th bit hash ((h·a_j + b_j) mod 1021 ≥ 510). */
  def simhash(corpus: DataFrame): DataFrame = {
    val sh = TextOps.shingles(corpus)
    val bits = (0 until NumHashes).map { j =>
      sh.select(col("doc_id"), lit(j).as("j"),
        when(pmod(col("h") * hashA(j) + hashB(j), lit(1021L)) >= 510, 1L)
          .otherwise(-1L).as("s"))
    }.reduce(_.unionAll(_))
    bits.groupBy("doc_id", "j").agg(sum(col("s")).as("tot"))
      .groupBy("doc_id")
      .agg(sum(when(col("tot") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
        .otherwise(0L)).as("simhash"))
  }
}
