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
    * mh_j = min over shingles of (a_j·h + b_j) mod P.
    * One scan + one partial-aggregating shuffle: all 16 mins are computed
    * as conditional aggregates of a single groupBy, then unpivoted with
    * stack() — not 16 unioned re-scans of the shingle explode. */
  def minhash(corpus: DataFrame): DataFrame = {
    val sh = TextOps.shingles(corpus)
    val aggs = (0 until NumHashes).map(j =>
      min(pmod(col("h") * hashA(j) + hashB(j), lit(P))).as(s"mh$j"))
    val wide = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val stackArgs = (0 until NumHashes).map(j => s"$j, mh$j").mkString(", ")
    wide.select(col("doc_id"),
      expr(s"stack($NumHashes, $stackArgs)").as(Seq("j", "mh")))
      .select(col("doc_id"), col("j"), col("mh"))
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

  /** signature agreements required before the exact-Jaccard pass: 10/16
    * matching minhashes estimate J ≳ 0.6 — a cheap prefilter that keeps the
    * expensive shingle-level join linear in true near-dups, not in band
    * collisions. */
  val SigAgreeMin = 10

  /** near-dup pairs via MinHash-LSH banding → signature-estimate prefilter
    * → exact Jaccard ≥ threshold. Returns (a, b, jaccard) with a < b,
    * Jaccard rounded to 5. */
  def minhashLsh(corpus: DataFrame, threshold: Double = 0.8): DataFrame = {
    val mh = minhash(corpus).cache()
    val bands = mh.withColumn("band", (col("j") / BandRows).cast("int"))
      .groupBy("doc_id", "band")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("j"), col("mh")))),
        x => x.getField("mh").cast("string")), "_").as("key"))
    val candidates = bands.select(col("doc_id").as("a"), col("band"), col("key"))
      .join(bands.select(col("doc_id").as("b"), col("band"), col("key")), Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // prefilter: enough full-signature agreement (estimated Jaccard)
    val agree = candidates
      .join(mh.select(col("doc_id").as("a"), col("j"), col("mh").as("ma")), Seq("a"))
      .join(mh.select(col("doc_id").as("b"), col("j"), col("mh").as("mb")), Seq("b", "j"))
      .groupBy("a", "b")
      .agg(sum(when(col("ma") === col("mb"), 1).otherwise(0)).as("agree"))
      .filter(col("agree") >= SigAgreeMin)
      .select("a", "b")
    jaccardOf(corpus, agree).filter(col("jaccard") >= threshold)
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
    val aggs = (0 until NumHashes).map(j =>
      sum(when(pmod(col("h") * hashA(j) + hashB(j), lit(1021L)) >= 510, 1L)
        .otherwise(-1L)).as(s"t$j"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until NumHashes).map(j =>
          when(col(s"t$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }
}
