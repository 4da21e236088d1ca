package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recrawl dedup: newest snapshot per CANONICAL url via one
  * max(struct) aggregate. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def run(rows: Seq[(String, String, String)]) =
    Pages.latestSnapshots(
      rows.map { case (u, t, p) => (u, ts(t), p) }.toDF("url", "warc_ts", "payload"))
      .collect().map(r => r.getString(0) -> ((r.getString(2), r.getString(3)))).toMap

  test("canonical variants collapse; the newest snapshot wins under the base key") {
    val got = run(Seq(
      ("https://ex.org/a", "2025-01-01 00:00:00", "old"),
      ("HTTPS://EX.ORG:443/a?utm_src=x", "2025-01-02 00:00:00", "new"), // newer, variant spelling
      ("https://ex.org/a#frag", "2024-12-31 00:00:00", "older"),
      ("http://other.net", "2025-01-01 00:00:00", "b"))) // empty path → '/'
    assert(got.keySet === Set("https://ex.org/a", "http://other.net/"))
    assert(got("https://ex.org/a") === (("HTTPS://EX.ORG:443/a?utm_src=x", "new")))
  }

  test("exact-instant tie breaks by raw url then payload, deterministically") {
    val got = run(Seq(
      ("https://ex.org/t", "2025-01-01 00:00:00", "p1"),
      ("https://ex.org/t#b", "2025-01-01 00:00:00", "p2"), // same norm, same ts
      ("https://ex.org/t#a", "2025-01-01 00:00:00", "p9")))
    // raw url desc: '…/t#b' > '…/t#a' > '…/t'
    assert(got("https://ex.org/t") === (("https://ex.org/t#b", "p2")))
  }

  test("unparseable urls pass through as their own canonical keys") {
    val got = run(Seq(
      ("not a url", "2025-01-01 00:00:00", "x"),
      ("not a url", "2025-01-02 00:00:00", "y")))
    assert(got === Map("not a url" -> (("not a url", "y"))))
  }

  test("partition-invariant") {
    val rows = (1 to 100).map(i =>
      (s"https://ex.org/p${i % 10}", f"2025-01-01 00:${i % 60}%02d:00", s"v$i"))
    val df = rows.map { case (u, t, p) => (u, ts(t), p) }.toDF("url", "warc_ts", "payload")
    val a = Pages.latestSnapshots(df).collect().map(_.toString).sorted.toSeq
    val b = Pages.latestSnapshots(df.repartition(13)).collect().map(_.toString).sorted.toSeq
    assert(a === b && a.size === 10)
  }

  test("plan: one partial aggregate, no window, no join") {
    val df = Pages.latestSnapshots(
      Seq(("https://ex.org/a", ts("2025-01-01 00:00:00"), "p"))
        .toDF("url", "warc_ts", "payload"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"keep-latest must be a pure aggregate:\n$plan")
    assert(plan.contains("partial_max") || plan.contains("partial max"),
      s"the max(struct) must map-side combine:\n$plan")
  }
}
