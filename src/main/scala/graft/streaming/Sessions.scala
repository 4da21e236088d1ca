package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap-based sessionization over an event stream — the canonical
  * training-data-pipeline windowed aggregation (user activity → sessions).
  *
  * The aggregation is Spark's native `session_window` (merge events whose
  * [ts, ts+gap) windows overlap): one codegen expression, grouped per
  * user — every shuffle is keyed (user, window), nothing global. The SAME
  * groupBy works in batch and under Structured Streaming with a watermark
  * (sessionizeStream below): state eviction is handled by the engine, so
  * the operator survives unbounded input.
  *
  * Sums are DECIMAL so the per-session total is exact and order-independent
  * (a double sum's rounding would depend on partition order — not
  * oracle-comparable, not parallelism-invariant).
  */
object Sessions {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** (user_id, session_start, n_events, total_value): gap-based sessions.
    * A new session starts only when an event arrives STRICTLY more than
    * `gap` after the previous one — Spark's `session_window` merges
    * touching windows, so an event at exactly prev_ts + gap joins the
    * running session (the td_sessionize oracle and StreamingSpec both
    * encode this `ts > prev + gap` rule). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("v"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        col("n_events"),
        col("v").cast("double").as("total_value"))

  /** The same sessionization as a Structured Streaming query over a parquet
    * file source: readStream → watermark → session_window agg. Append mode
    * emits a session once the watermark passes its close — resume comes
    * from the checkpoint, parity with the batch result is tested with an
    * AvailableNow trigger. */
  def sessionizeStream(spark: SparkSession, dir: String,
                       gapMinutes: Int = 30, watermark: String = "1 hour"): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("v"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        col("n_events"),
        col("v").cast("double").as("total_value"))
}
