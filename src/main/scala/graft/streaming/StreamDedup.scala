package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming exact dedup — the online form of the batch first-occurrence
  * keeper ([[graft.dedup.Dedup.exact]]): a recrawl stream re-fetches the
  * same content endlessly, and only a key's FIRST arrival may enter the
  * corpus. `dropDuplicates` on a streaming Dataset is exactly that
  * operator: the key set is streaming state (hash-partitioned by key, so
  * state grows per EXECUTOR, not per driver), each micro-batch probes and
  * inserts in one pass, and an already-seen key emits nothing — across
  * micro-batches AND across restarts (the state store rides the
  * checkpoint).
  *
  * Scale contract: exact dedup keeps one state row per distinct key
  * forever — at 10¹² urls that is the real cost of exactness, managed by
  * keying on a 128-bit content hash (16 bytes + store overhead, RocksDB
  * state store at cluster scale) rather than the text itself. Where the
  * stream carries event time and a re-fetch older than the watermark
  * SHOULD re-enter (a recrawl refresh window),
  * `dropDuplicatesWithinWatermark` bounds state by time instead; its
  * re-emission behavior at the horizon is deliberately not a gate
  * surface here.
  */
object StreamDedup {

  private val corpusSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** First-occurrence keys of a staged corpus directory, drained
    * AvailableNow with `maxFilesPerTrigger=1` so the dedup state is
    * genuinely exercised ACROSS micro-batches (each staged file is its
    * own batch). Emits one row per distinct content hash — arrival order
    * decides which physical row won, but the emitted KEY SET is
    * order-independent, which is what makes this a deterministic gate
    * surface. Re-running against the same checkpoint appends nothing;
    * appending a file of old keys appends nothing; only genuinely new
    * keys land (StreamDedupSpec).
    */
  def firstKeysOnce(spark: SparkSession, inDir: String, outDir: String,
                    checkpointDir: String): DataFrame = {
    val q = spark.readStream
      .schema(corpusSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .select(md5(col("text").cast("binary")).as("text_md5"))
      .dropDuplicates("text_md5")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }
}
