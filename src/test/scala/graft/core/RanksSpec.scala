package graft.core

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RanksSpec extends SparkSpec {

  test("rankByBucketedOrder == global-window row_number (same total order)") {
    import spark.implicits._
    val df = spark.range(0, 500).select(col("id"))
      .withColumn("tier", pmod(col("id"), lit(3L)).cast("int"))
      .withColumn("h", xxhash64(col("id")))
    val order = Seq(col("tier"), col("h"), col("id"))
    val expected = df
      .withColumn("trn", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select(col("id"), col("trn")).as[(Long, Long)].collect().toMap
    val got = Ranks.rankByBucketedOrder(df,
        col("tier") * 64 + Ranks.signedRangeBucket(col("h"), 6),
        Seq(col("h"), col("id")), "trn")
      .select(col("id"), col("trn")).as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("signedRangeBucket is order-preserving over signed longs") {
    val vs = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    import spark.implicits._
    val out = vs.toDF("v")
      .select(Ranks.signedRangeBucket(col("v"), 6).as("b")).as[Long].collect()
    assert(out.toSeq === out.sorted.toSeq)
    assert(out.head === 0L && out.last === 63L)
  }
}
