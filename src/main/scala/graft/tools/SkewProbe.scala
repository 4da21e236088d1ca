package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured evidence for the salted canonical-map join (north_rule's
  * head-entity skew case): a synthetic fact table where ONE key carries
  * `hotFrac` of all rows is joined to a unique-keyed map three ways —
  * plain shuffle-hash (the hot key lands on one partition), the engine's
  * salted shuffle-hash (`Canonicalize.saltedMapJoin` big-catalog path),
  * and broadcast (the small-catalog path, as the reference point). Each
  * run reports wall time and the max/mean shuffle-partition row ratio the
  * salt is supposed to flatten. Run via
  * `sbt "runMain graft.tools.SkewProbe"`; env knobs: SPARK_GRAFT_SKEW_ROWS
  * (default 4e6), SPARK_GRAFT_SKEW_HOTFRAC (0.8), SPARK_GRAFT_SKEW_KEYS
  * (100000), SPARK_GRAFT_SKEW_SALT (8).
  *
  * AQE stays ON: its skew-join mitigation applies to sort-merge joins, not
  * the shuffle-hash build path a map join wants, so the salt is the lever
  * that matters here — the probe demonstrates that, not a strawman.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "4000000").toLong
    val hotFrac = sys.env.getOrElse("SPARK_GRAFT_SKEW_HOTFRAC", "0.8").toDouble
    val keys = sys.env.getOrElse("SPARK_GRAFT_SKEW_KEYS", "100000").toLong
    val salt = sys.env.getOrElse("SPARK_GRAFT_SKEW_SALT", "8").toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fact side: hotFrac of rows on entity_0, the rest uniform over `keys`
    val fact = spark.range(0, rows, 1, 64)
      .select(
        when(pmod(xxhash64(col("id")), lit(1000000L)) < lit((hotFrac * 1000000).toLong),
          lit("entity_0"))
          .otherwise(concat(lit("entity_"), pmod(xxhash64(col("id"), lit(7L)), lit(keys))))
          .as("subj_id"),
        col("id").as("payload"))
      .localCheckpoint(true)
    // map side: unique key per row (a canonical map's shape)
    val map = spark.range(0, keys, 1, 16)
      .select(concat(lit("entity_"), col("id")).as("entity_id"),
        concat(lit("canon_"), pmod(col("id"), lit(1000L))).as("canonical"))
      .localCheckpoint(true)

    def time(name: String)(df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-22s rows=$n%,d  wall=$sec%.2f s")
      n
    }

    val m = map.select(col("entity_id").as("subj_id"), col("canonical"))
    val a = time("plain shuffle-hash") {
      fact.join(m.hint("shuffle_hash"), Seq("subj_id"))
    }
    val b = time("salted shuffle-hash") {
      graft.pipeline.Canonicalize.saltedMapJoin(
        fact, map, "subj_id", "canonical",
        broadcastMaxRows = 1, saltBuckets = salt, mapRows = Some(keys))
    }
    val c = time("broadcast (reference)") {
      fact.join(broadcast(m), Seq("subj_id"))
    }
    require(a == b && b == c, "join variants disagree on row count")

    // the distribution the salt flattens: rows per shuffle partition of the
    // fact side under hash(subj_id) vs hash(subj_id, salt)
    def partSpread(withSalt: Boolean): (Long, Long) = {
      val keyed =
        if (withSalt)
          fact.withColumn("__s",
            pmod(xxhash64(struct(col("payload"))), lit(salt)).cast("int"))
            .select(pmod(hash(col("subj_id"), col("__s")), lit(8)).as("p"))
        else fact.select(pmod(hash(col("subj_id")), lit(8)).as("p"))
      val counts = keyed.groupBy("p").count().collect().map(_.getLong(1))
      (counts.max, counts.sum / counts.length)
    }
    val (mx0, mean0) = partSpread(withSalt = false)
    val (mx1, mean1) = partSpread(withSalt = true)
    println(f"unsalted partitions: max=$mx0%,d mean=$mean0%,d  (max/mean ${mx0.toDouble / mean0}%.2f)")
    println(f"salted partitions:   max=$mx1%,d mean=$mean1%,d  (max/mean ${mx1.toDouble / mean1}%.2f)")
    spark.stop()
  }
}
