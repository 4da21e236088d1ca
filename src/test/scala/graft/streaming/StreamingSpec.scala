package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structured Streaming surface: the session_window aggregation produces
  * the SAME sessions under readStream (file source, watermark, AvailableNow
  * trigger) as in batch — windows, counts, and exact decimal sums. */
class StreamingSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

  test("sessionizeStream == sessionize (batch/stream parity, AvailableNow)") {
    val dir = java.nio.file.Files.createTempDirectory("events_in_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("events_ck_").toString
    // deterministic event fixture: 3 users, gaps straddling the 30-min rule
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rows = Seq(
      (0L, ts(0), 1L, "view", 1.25, "{}"),
      (1L, ts(10), 1L, "click", 2.50, "{}"),
      (2L, ts(40), 1L, "view", 4.00, "{}"),   // exactly 30 min after prev → MERGES (touching windows)
      (3L, ts(71), 1L, "view", 8.00, "{}"),   // 31 min after prev → NEW session
      (4L, ts(0), 2L, "view", 0.75, "{}"),
      (5L, ts(200), 2L, "error", 1.00, "{}"),
      (6L, ts(5), 3L, "view", 3.00, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir)

    val batch = Sessions.sessionize(spark.read.parquet(dir), 30)
    // user 1: {0,10,40} (40 touches 10+30 → merged) and {71};
    // user 2: two singletons; user 3: one
    assert(canon(batch) === Set(
      (1L, "2024-01-01 00:00:00.000000", 3L, 7.75),
      (1L, "2024-01-01 01:11:00.000000", 1L, 8.0),
      (2L, "2024-01-01 00:00:00.000000", 1L, 0.75),
      (2L, "2024-01-01 03:20:00.000000", 1L, 1.0),
      (3L, "2024-01-01 00:05:00.000000", 1L, 3.0)))

    val q = Sessions.sessionizeStream(spark, dir, 30, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("sessions_out")
    assert(canon(streamed) === canon(batch))
  }

  test("sessionize over the testdata events table: invariants") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val s = Sessions.sessionize(events, 30).cache()
    val nEvents = events.count()
    val agg = s.agg(sum(col("n_events")), count(lit(1))).collect()(0)
    assert(agg.getLong(0) === nEvents) // every event lands in exactly one session
    assert(agg.getLong(1) > 0 && agg.getLong(1) <= nEvents)
    s.unpersist()
  }
}
