package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // (event_id, ts, user_id, event_type, value)
  private val ev = Seq(
    (1L, "2024-01-01 00:00:01", 7L, "view", 1.0),
    (2L, "2024-01-01 00:00:05", 7L, "click", 0.0),
    (3L, "2024-01-01 00:00:05", 7L, "view", 2.0), // same instant as a later click
    (4L, "2024-01-01 00:00:09", 7L, "click", 0.0),
    (5L, "2024-01-01 00:00:02", 8L, "click", 0.0), // no prior view for user 8
    (6L, "2024-01-01 00:00:03", 8L, "view", 3.0),
    (7L, "2024-01-01 00:00:04", 8L, "click", 0.0))
    .map { case (id, t, u, et, v) => (id, ts(t), u, et, v) }
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  private def asof() = Temporal.asofJoin(
    ev.filter($"event_type" === "click"),
    ev.filter($"event_type" === "view"),
    key = "user_id", ts = "ts", id = "event_id",
    carry = Seq("event_id" -> "view_id", "value" -> "view_value"))

  test("asofJoin picks the newest at-or-before view, ties included") {
    val got = asof().select("event_id", "view_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    assert(got === Map(
      2L -> Some(3L), // view 3 shares click 2's instant: at-or-before includes it
      4L -> Some(3L), // the 00:00:05 view is the newest preceding one
      5L -> None,     // nothing precedes
      7L -> Some(6L)))
  }

  test("asofJoin: a view at the click's exact instant matches (at-or-before)") {
    val sameInstant = Temporal.asofJoin(
      Seq((10L, ts("2024-01-01 00:00:05"), 7L)).toDF("event_id", "ts", "user_id"),
      ev.filter($"event_type" === "view"),
      key = "user_id", ts = "ts", id = "event_id",
      carry = Seq("event_id" -> "view_id"))
    assert(sameInstant.collect().map(_.getAs[Long]("view_id")).toSeq === Seq(3L))
  }

  test("asofJoin carries nulls for all columns when unmatched") {
    val r = asof().filter($"event_id" === 5L).collect().head
    assert(r.isNullAt(r.fieldIndex("view_id")) && r.isNullAt(r.fieldIndex("view_value")))
  }

  test("asofJoin preserves every left column and is partition-invariant") {
    val a = asof().collect().map(_.toString).sorted.toSeq
    val b = Temporal.asofJoin(
      ev.filter($"event_type" === "click").repartition(5),
      ev.filter($"event_type" === "view").repartition(3),
      "user_id", "ts", "event_id",
      Seq("event_id" -> "view_id", "value" -> "view_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
    assert(asof().columns.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "view_id", "view_value"))
  }

  test("rollingFeatures: strictly-before trailing frame, exact decimal sum") {
    val log = Seq(
      (1L, "2024-01-01 00:00:00", 7L, 1.10),
      (2L, "2024-01-01 10:00:00", 7L, 2.20),
      (3L, "2024-01-02 09:00:00", 7L, 4.40), // 24h window: sees e2, NOT e1 (exactly 33h/23h back)
      (4L, "2024-01-01 00:00:00", 9L, 8.00)) // other user, same instant as e1
      .map { case (id, t, u, v) => (id, ts(t), u, v) }
      .toDF("event_id", "ts", "user_id", "value")
    val got = Temporal.rollingFeatures(log, "user_id", "ts", "value", 86400000000L)
      .select($"event_id", $"trail_cnt", $"trail_sum".cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got === Set(
      (1L, 0L, None),             // nothing precedes; the row never sees itself
      (2L, 1L, Some(1.10)),       // e1, 10h back
      (3L, 1L, Some(2.20)),       // e2 at 23h back; e1 at 33h is out
      (4L, 0L, None)))            // user 9's first event
  }

  test("rollingFeatures: events at the same instant exclude each other") {
    val log = Seq(
      (1L, "2024-01-01 00:00:05", 7L, 1.0),
      (2L, "2024-01-01 00:00:05", 7L, 2.0))
      .map { case (id, t, u, v) => (id, ts(t), u, v) }
      .toDF("event_id", "ts", "user_id", "value")
    val got = Temporal.rollingFeatures(log, "user_id", "ts", "value", 86400000000L)
      .select($"event_id", $"trail_cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 0L), (2L, 0L)))
  }

  test("scd2 collapses runs and closes intervals with the next change") {
    val log = Seq(
      (1L, "2024-01-01 00:00:01", 7L, "a"),
      (2L, "2024-01-01 00:00:02", 7L, "a"), // duplicate state: collapsed
      (3L, "2024-01-01 00:00:03", 7L, "b"),
      (4L, "2024-01-01 00:00:04", 7L, "a"), // a again: a NEW run
      (5L, "2024-01-01 00:00:05", 9L, "x"))
      .map { case (id, t, u, st) => (id, ts(t), u, st) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Temporal.scd2(log, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString))).toSet
    assert(got === Set(
      (7L, "a", "2024-01-01 00:00:01.0", Some("2024-01-01 00:00:03.0")),
      (7L, "b", "2024-01-01 00:00:03.0", Some("2024-01-01 00:00:04.0")),
      (7L, "a", "2024-01-01 00:00:04.0", None),
      (9L, "x", "2024-01-01 00:00:05.0", None)))
  }

  // funnel fixture on integer-second timestamps (timestamp_seconds ⇒
  // step times are exactly sec·10⁶ regardless of JVM zone)
  private def funnelDf(rows: Seq[(Long, Long, String)]) =
    rows.toDF("user_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds($"sec"))

  private def runFunnel(rows: Seq[(Long, Long, String)]) =
    Temporal.funnel(funnelDf(rows), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> ((
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getInt(4)))).toMap

  test("funnel: strictly-later steps, same-instant click does not count") {
    val got = runFunnel(Seq(
      (1L, 1L, "view"), (1L, 1L, "click"), // same instant: ignored
      (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "purchase"), (2L, 2L, "view"), // purchase precedes view: no credit
      (3L, 5L, "click"))) // never viewed: omitted
    assert(got === Map(
      1L -> ((Some(1000000L), Some(2000000L), Some(3000000L), 3)),
      2L -> ((Some(2000000L), None, None, 1))))
  }

  test("funnel picks the EARLIEST qualifying occurrence of each step") {
    val got = runFunnel(Seq(
      (1L, 5L, "view"), (1L, 2L, "view"),           // earliest view wins
      (1L, 3L, "click"), (1L, 8L, "click"),         // click@3 > view@2 qualifies
      (1L, 4L, "purchase")))                        // purchase@4 > click@3
    assert(got === Map(1L -> ((Some(2000000L), Some(3000000L), Some(4000000L), 3))))
  }

  // ---- funnelStream (mapGroupsWithState, O(K) state per user) ----

  private def writeEventFiles(dir: String, fileRows: Seq[Seq[(Long, Long, Long, String)]]): Unit =
    fileRows.zipWithIndex.foreach { case (rows, i) =>
      rows.map { case (id, sec, u, et) => (id, new java.sql.Timestamp(sec * 1000L), u, et, 0.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      // distinct mtimes keep the file-source batch order deterministic
      if (i < fileRows.size - 1) Thread.sleep(1100)
    }

  private def lastUpdates(dir: String, name: String, maxFiles: Option[Int]): Map[Long, (Seq[Long], Int)] = {
    val ckpt = java.nio.file.Files.createTempDirectory("funnel_ck_").toString
    val q = Temporal.funnelStream(spark, dir, Seq("view", "click", "purchase"),
        watermark = "0 seconds", maxFilesPerTrigger = maxFiles)
      .writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // the LAST update per user is the funnel row; memory sink appends in
    // batch order, so keep the final occurrence
    spark.table(name).collect()
      .map(r => (r.getLong(0), (r.getSeq[Long](1), r.getInt(2))))
      .foldLeft(Map.empty[Long, (Seq[Long], Int)]) { case (m, (u, v)) => m + (u -> v) }
  }

  private def batchShape(rows: Seq[(Long, Long, Long, String)]): Map[Long, (Seq[Long], Int)] = {
    val df = rows.map { case (id, sec, u, et) => (id, new java.sql.Timestamp(sec * 1000L), u, et) }
      .toDF("event_id", "ts", "user_id", "event_type")
    Temporal.funnel(df, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .collect().map { r =>
        val steps = (1 to 3).map(i => if (r.isNullAt(i)) -1L else r.getLong(i))
        r.getLong(0) -> ((steps, r.getInt(4)))
      }.toMap
  }

  test("funnelStream == funnel (single-batch AvailableNow parity)") {
    val rows = Seq(
      (1L, 1L, 1L, "view"), (2L, 1L, 1L, "click"), (3L, 2L, 1L, "click"),
      (4L, 3L, 1L, "purchase"),
      (5L, 1L, 2L, "purchase"), (6L, 2L, 2L, "view"),
      (7L, 5L, 3L, "click"), // never viewed: omitted on both sides
      (8L, 4L, 4L, "view"), (9L, 9L, 4L, "click"))
    val dir = java.nio.file.Files.createTempDirectory("funnel_in_").toString
    writeEventFiles(dir, Seq(rows))
    val streamed = lastUpdates(dir, "funnel_out1", maxFiles = None)
    assert(streamed === batchShape(rows))
    assert(streamed(1L) === ((Seq(1000000L, 2000000L, 3000000L), 3)))
  }

  test("funnelStream: state carries across micro-batches (in-order files)") {
    // file 1 ends mid-funnel; file 2 completes it — one file per trigger
    val f1 = Seq((1L, 1L, 7L, "view"), (2L, 2L, 7L, "click"),
      (3L, 1L, 8L, "view"))
    val f2 = Seq((4L, 10L, 7L, "purchase"), (5L, 11L, 8L, "click"))
    val dir = java.nio.file.Files.createTempDirectory("funnel_in2_").toString
    writeEventFiles(dir, Seq(f1, f2))
    val streamed = lastUpdates(dir, "funnel_out2", maxFiles = Some(1))
    assert(streamed === batchShape(f1 ++ f2))
    assert(streamed(7L)._2 === 3 && streamed(8L)._2 === 2)
  }

  test("funnel is partition-invariant") {
    val rows = (1L to 40L).flatMap(u => Seq(
      (u, u, "view"), (u, u + 1, "click"), (u, u + 2, "purchase")))
    val a = runFunnel(rows)
    val b = Temporal.funnel(funnelDf(rows).repartition(7), "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(a.view.mapValues(_._4).toMap === b && b.values.forall(_ == 3))
  }
}
