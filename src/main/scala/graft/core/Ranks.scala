package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed dense ranking without a global single-partition sort.
  *
  * `row_number().over(Window.orderBy(...))` with no partitionBy funnels the
  * entire table through ONE task — the classic straggler/OOM once the table
  * is 100× fixture scale. The scale-safe equivalent is the two-pass pattern:
  * split the total order into bounded, order-preserving buckets, count rows
  * per bucket (a tiny aggregate collected to the driver), turn the counts
  * into per-bucket offsets, and rank inside each bucket with a PARTITIONED
  * window. rank = bucket offset + within-bucket row_number. Every task then
  * sorts only its bucket (~N/buckets rows) and the result is a pure function
  * of the row order — identical at any parallelism.
  */
object Ranks {

  /** Dense rank 1..N of `df` under the total order (bucket, order...).
    *
    * `bucket` must be (a) order-preserving — row x before row y in the
    * intended order ⇒ bucket(x) ≤ bucket(y) — and (b) bounded cardinality
    * (its distinct values are collected; keep it ≤ ~10⁵). `order` must break
    * all ties within a bucket (include a unique column) so the rank is
    * deterministic. */
  def rankByBucketedOrder(df: DataFrame, bucket: Column, order: Seq[Column],
                          outCol: String): DataFrame = {
    val spark = df.sparkSession
    // temp names chosen to not collide with caller columns (a caller column
    // named __bucket would silently be overwritten / joined on otherwise)
    val existing = df.columns.toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(!existing.contains(_)).get
    val bCol = fresh("__bucket")
    val oCol = fresh("__off")
    val b = df.withColumn(bCol, bucket.cast("long"))
    val counts = b.groupBy(col(bCol)).agg(count(lit(1)).as("n"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          "rankByBucketedOrder: bucket expression produced NULL — the total order is undefined for such rows")
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (bk, n) => val off = acc; acc += n; (bk, off) }
    import org.apache.spark.sql.Encoders
    val offDf = spark.createDataset(offsets.toSeq)(
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)).toDF(bCol, oCol)
    val w = Window.partitionBy(col(bCol)).orderBy(order: _*)
    b.join(broadcast(offDf), Seq(bCol))
      .withColumn(outCol, col(oCol) + row_number().over(w))
      .drop(bCol, oCol)
  }

  /** An order-preserving bucket for a signed-long order column: the top
    * `bits` bits of the value (arithmetic shift keeps sign order), offset to
    * ≥ 0. 2^bits buckets; with a hash-valued column they are balanced. */
  def signedRangeBucket(v: Column, bits: Int = 6): Column =
    shiftright(v, 64 - bits) + lit(1L << (bits - 1))
}
