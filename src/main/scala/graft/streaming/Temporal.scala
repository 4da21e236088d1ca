package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal event-log operators Spark has no built-in for: backward as-of
  * join and SCD type-2 interval construction — the two joins every
  * event-sourced feature pipeline needs at 100 TB (attach the latest
  * dimension/state row at event time; turn a change log into validity
  * intervals).
  *
  * Both are implemented as the UNION-TAG window plan, not a range join:
  * tag the two streams, union, one hash shuffle on the key, one sort per
  * partition, and a running `last(..., ignoreNulls)` carries the newest
  * right-side row forward to each left row. That is O(n log n) per key
  * group with NO candidate-pair blow-up — a theta/range join of the same
  * semantics explodes quadratically on hot keys, which is exactly what a
  * per-user event log has. The windows are all PARTITIONed (never a
  * global window); a single pathological key is the usual window-skew
  * story — pre-split by a time bucket and re-merge if one key exceeds a
  * partition.
  *
  * Determinism: the order within a key is the TOTAL order (ts, tag, id) —
  * right rows sort before left rows at equal ts (so at-or-before includes
  * the same instant, DuckDB/pandas backward-ASOF semantics), and the id
  * column breaks exact-ts collisions between two right rows the same way
  * in any engine.
  */
object Temporal {

  /** Backward as-of join: each `left` row gains the newest `right` row
    * with the same `key` and `right.ts <= left.ts` (ties included).
    * `carry` lists (rightColumn, outputName) pairs to attach; all of them
    * are null when no right row precedes. `id` must exist on BOTH sides
    * and be unique per side (the tie-break). Output: every left column,
    * then the carried columns. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      id: String,
      carry: Seq[(String, String)]): DataFrame = {
    require(carry.nonEmpty, "carry at least one right column")
    val carryStruct = struct(carry.map { case (c, n) => col(c).as(n) }: _*)
    val carryType: StructType = right.select(carryStruct).schema.head.dataType.asInstanceOf[StructType]
    val rowStruct = struct(left.columns.map(col): _*)
    val rowType: StructType = left.select(rowStruct).schema.head.dataType.asInstanceOf[StructType]

    val rt = right.select(
      col(key).as("__key"), col(ts).as("__ts"), lit(0).as("__tag"),
      col(id).cast("long").as("__ord"),
      carryStruct.as("__carry"), lit(null).cast(rowType).as("__row"))
    val lt = left.select(
      col(key).as("__key"), col(ts).as("__ts"), lit(1).as("__tag"),
      col(id).cast("long").as("__ord"),
      lit(null).cast(carryType).as("__carry"), rowStruct.as("__row"))

    val w = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__tag"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.unionByName(rt)
      .withColumn("__m", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__row.*") +: carry.map { case (_, n) => col(s"__m.$n").as(n) }: _*)
  }

  /** Trailing-window per-event features: count and EXACT DECIMAL sum of
    * the key's rows in (ts − window, ts) — strictly before the row's own
    * instant, so the feature can never leak the row it describes
    * (training-safe by construction). RANGE frame over integer micros:
    * one hash shuffle on the key, one sort per partition, the frame scan
    * is the streaming two-pointer Spark's window exec already does.
    * DECIMAL, not double, keeps the sum order-independent — cast to
    * double strictly downstream if a float is wanted. */
  def rollingFeatures(
      events: DataFrame,
      key: String,
      ts: String,
      valueCol: String,
      windowMicros: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("__us"))
      .rangeBetween(-windowMicros, -1L)
    events
      .withColumn("__us", unix_micros(col(ts).cast("timestamp")))
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .withColumn("trail_sum", sum(col(valueCol).cast("decimal(18,2)")).over(w))
      .drop("__us")
  }

  /** SCD type-2 intervals from a change log: one row per state RUN —
    * (key, state, valid_from, valid_to), `valid_to` null for the current
    * state, consecutive duplicate states collapsed. The classic
    * dimension-table build from an event stream. */
  def scd2(
      log: DataFrame,
      key: String,
      ts: String,
      id: String,
      state: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(id))
    val changes = log
      .withColumn("__prev", lag(col(state), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(state))
    changes
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(state).as("state"),
        col(ts).as("valid_from"), col("valid_to"))
  }

  /** Ordered conversion funnel: for each key, the earliest time of step 1,
    * then the earliest STRICTLY-LATER occurrence of step 2, and so on —
    * the standard product-analytics query (a same-instant later step does
    * not count; an out-of-order purchase before the first view does not
    * complete the funnel). Output: (key, step1_us..stepK_us epoch-micros,
    * reached = number of consecutive steps completed); keys with no step-1
    * event are omitted (they carry zero information and at web scale are
    * most of the universe).
    *
    * Plan shape: ONE hash shuffle on the key. Each step is a conditional
    * `min(...) over (partition by key)` — an UNORDERED full-partition
    * frame, so all K windows plus the final per-key collapse reuse the
    * same exchange (no sort, no join, no per-step pass over the input).
    * A theta self-join per step — the naive funnel — explodes on hot keys
    * and rescans the log K times. */
  def funnel(
      events: DataFrame,
      key: String,
      ts: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val w = Window.partitionBy(key)
    var df = events.select(col(key), col(typeCol).as("__type"),
      unix_micros(col(ts).cast("timestamp")).as("__us"))
    steps.zipWithIndex.foreach { case (s, i) =>
      val prev = if (i == 0) lit(true) else col(s"step${i}_us").isNotNull
      val after = if (i == 0) lit(true) else col("__us") > col(s"step${i}_us")
      df = df.withColumn(s"step${i + 1}_us",
        min(when(col("__type") === s && prev && after, col("__us"))).over(w))
    }
    val stepCols = steps.indices.map(i => s"step${i + 1}_us")
    // steps are consecutive-gated (step k+1 non-null ⇒ step k non-null),
    // so the depth reached is the count of non-null step times
    val reached = stepCols
      .map(c => when(col(c).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    df.filter(col("step1_us").isNotNull)
      .groupBy(col(key))
      .agg(min(col(stepCols.head)).as(stepCols.head),
        (stepCols.tail.map(c => min(col(c)).as(c)) :+
          min(reached).cast("int").as("reached")): _*)
  }

  /** The [[funnel]] as a Structured Streaming query with CUSTOM state:
    * `groupByKey(user).mapGroupsWithState` holding exactly K longs per
    * user (the earliest qualifying time per step, -1 = unreached) — the
    * O(K) state bound is the whole point: a session-window or join
    * formulation of a funnel buffers raw events per user, this never
    * holds more than the chain.
    *
    * Per micro-batch the group's new events are sorted by (ts, type-rank)
    * and folded through the chain: step k fires on the first event
    * STRICTLY later than chain[k-1] (same strictness as the batch
    * funnel), step 0 on its first event. Update mode emits the user's
    * current chain every batch it changes; the LAST update per user is
    * the funnel row.
    *
    * Exactness contract (documented, tested): exact when each user's
    * events respect event-time order ACROSS micro-batches (within a
    * batch, order is irrelevant — the fold sorts). An out-of-order
    * straggler that lands in a later batch than a later-timed event can
    * only UNDER-advance the funnel (chain entries are first-set-wins and
    * the strictly-monotone fold never uses it retroactively) — it never
    * invents a false conversion. The batch [[funnel]] is the exact
    * backfill/repair path; this is the standard streaming/batch split
    * for funnels (the general out-of-order-exact funnel requires
    * unbounded per-user event retention).
    *
    * Output: (user_id, step times as epoch micros in `steps` order with
    * -1 for unreached, reached). */
  def funnelStream(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      steps: Seq[String],
      watermark: String = "1 hour",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.{Encoder, Encoders}
    require(steps.nonEmpty, "at least one funnel step")
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.size
    implicit val inEnc: Encoder[(Long, Long, Int)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaInt)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stEnc: Encoder[FunnelChain] = Encoders.product[FunnelChain]
    implicit val outEnc: Encoder[FunnelUpdate] = Encoders.product[FunnelUpdate]
    val reader = spark.readStream.schema(Sessions.eventsSchema)
    val src = maxFilesPerTrigger
      .fold(reader)(m => reader.option("maxFilesPerTrigger", m)).parquet(dir)
    val typed = src
      .withWatermark("ts", watermark)
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .map(r => (r.getLong(0), r.getLong(1), stepIdx(r.getString(2))))(inEnc)
    typed.groupByKey(_._1)(keyEnc)
      .mapGroupsWithState[FunnelChain, FunnelUpdate](GroupStateTimeout.NoTimeout()) {
        (user, events, state) =>
          val chain = state.getOption.map(_.c.toArray).getOrElse(Array.fill(k)(-1L))
          // in-batch order: (ts, step rank) — a step event never fires on
          // a same-instant earlier step (strict >), so rank only breaks
          // log-order nondeterminism, never the semantics
          events.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, us, i) =>
            val prevOk = i == 0 || (chain(i - 1) >= 0L && us > chain(i - 1))
            if (chain(i) < 0L && prevOk) chain(i) = us
          }
          state.update(FunnelChain(chain.toSeq))
          FunnelUpdate(user, chain.toSeq, chain.count(_ >= 0L))
      }
      .toDF()
      // parity with the batch funnel's output domain: users that never
      // completed step 1 are omitted (they carry zero information)
      .filter(col("reached") >= 1)
  }

  /** Drain [[funnelStream]] with Trigger.AvailableNow and return the FINAL
    * funnel row per user in the batch [[funnel]]'s column shape
    * (step1_us…stepK_us nullable, reached) — foreachBatch lands every
    * update with its batch id, and the last batch's row per user wins
    * (update-mode semantics). The verify gate runs this against the SAME
    * DuckDB oracle as the batch funnel. */
  def funnelStreamOnce(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      steps: Seq[String],
      outDir: String,
      checkpointDir: String,
      watermark: String = "0 seconds"): DataFrame = {
    val q = funnelStream(spark, dir, steps, watermark)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val w = Window.partitionBy(col("user_id")).orderBy(col("batch_id").desc)
    val last = spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val stepCols = steps.indices.map { i =>
      val c = col("step_us").getItem(i)
      when(c >= 0L, c).as(s"step${i + 1}_us")
    }
    last.select(col("user_id") +: stepCols :+ col("reached"): _*)
  }
}

/** [[Temporal.funnelStream]] per-user state: the chain of earliest
  * qualifying step times, -1 = unreached (top-level for encoder
  * derivation) */
final case class FunnelChain(c: Seq[Long])

/** one [[Temporal.funnelStream]] update row (top-level for encoder
  * derivation): step times in funnel order, -1 = unreached */
final case class FunnelUpdate(user_id: Long, step_us: Seq[Long], reached: Int)
