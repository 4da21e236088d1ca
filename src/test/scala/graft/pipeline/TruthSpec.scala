package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Truth-discovery units: the trust iteration must be LOAD-BEARING (a
  * round-2 winner flip on a hand-computed conflict), exact integer trust
  * arithmetic, and the temporal-scoping aggregate. */
class TruthSpec extends SparkSpec {

  // hand-computed conflict: s1/s2 are reliable (3/4 of their claims agree
  // with round-1 winners), s3/s4/s5 unreliable (1/3) — so item i4, whose
  // uniform majority says y (3 sources vs 2), flips to x once trust is
  // agreement-weighted: x gets 2·750000 = 1.5M vs y's 3·333333 = 999999.
  private def claims = {
    import spark.implicits._
    Seq(
      ("s1", "i1", "p", "a"), ("s1", "i2", "p", "a"), ("s1", "i3", "p", "a"), ("s1", "i4", "p", "x"),
      ("s2", "i1", "p", "a"), ("s2", "i2", "p", "a"), ("s2", "i3", "p", "a"), ("s2", "i4", "p", "x"),
      ("s3", "i1", "p", "b"), ("s3", "i2", "p", "b"), ("s3", "i4", "p", "y"),
      ("s4", "i1", "p", "b"), ("s4", "i3", "p", "b"), ("s4", "i4", "p", "y"),
      ("s5", "i2", "p", "b"), ("s5", "i3", "p", "b"), ("s5", "i4", "p", "y")
    ).toDF("src", "subj", "pred", "obj")
  }

  private def winnerOf(df: org.apache.spark.sql.DataFrame, subj: String): String =
    df.filter(col("subj") === subj).select("obj").collect().head.getString(0)

  test("round 1 is the uniform majority (obj-asc tiebreak on the 2-2 items)") {
    val w1 = Truth.resolve(claims, rounds = 1).cache()
    assert(winnerOf(w1, "i1") == "a") // 2-2 tie -> 'a' < 'b'
    assert(winnerOf(w1, "i2") == "a")
    assert(winnerOf(w1, "i3") == "a")
    assert(winnerOf(w1, "i4") == "y") // 3 sources beat 2
  }

  test("round 2 flips the majority winner via source trust") {
    val w2 = Truth.resolve(claims, rounds = 2).cache()
    assert(winnerOf(w2, "i4") == "x", "reliable minority must beat unreliable majority")
    assert(winnerOf(w2, "i1") == "a")
    val i4 = w2.filter(col("subj") === "i4").collect().head
    assert(i4.getAs[Long]("belief_micros") == 1500000L) // 2 x 750000
    assert(i4.getAs[Long]("n_src") == 2L)
  }

  test("sourceTrust is the exact integer agreement rate vs round-1 winners") {
    val t = Truth.sourceTrust(claims, rounds = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t("s1") == 750000L && t("s2") == 750000L)
    assert(t("s3") == 333333L && t("s4") == 333333L && t("s5") == 333333L)
  }

  test("duplicate assertions from one source count once") {
    val dup = claims.unionAll(claims.filter(col("src") === "s3"))
    assert(Truth.resolve(dup, rounds = 2).collect().toSet ==
      Truth.resolve(claims, rounds = 2).collect().toSet)
  }

  test("factIntervals: min/max observation ts + distinct-doc support") {
    import spark.implicits._
    val cl = Seq(
      ("u1", "2025-01-01 00:00:00", "e", "p", "v"),
      ("u2", "2025-01-03 00:00:00", "e", "p", "v"),
      ("u2", "2025-01-02 00:00:00", "e", "p", "v"), // same doc, earlier snapshot
      ("u1", "2025-01-05 00:00:00", "e", "p", "w")
    ).toDF("url", "ts", "subj", "pred", "obj")
      .withColumn("warc_ts", col("ts").cast("timestamp"))
    val out = Truth.factIntervals(cl).filter(col("obj") === "v").collect().head
    assert(out.getAs[java.sql.Timestamp]("first_ts").toString.startsWith("2025-01-01"))
    assert(out.getAs[java.sql.Timestamp]("last_ts").toString.startsWith("2025-01-03"))
    assert(out.getAs[Long]("n_docs") == 2L)
  }

  test("factsAsOf: serves the covering version, hides later and superseded ones") {
    import spark.implicits._
    val cl = Seq(
      ("u1", "2025-01-01 00:00:00", "e", "p", "v1"), // version 1
      ("u2", "2025-01-05 00:00:00", "e", "p", "v2"), // version 2 supersedes at day 5
      ("u3", "2025-01-09 00:00:00", "f", "q", "w1")  // first observed after the cutoff
    ).toDF("url", "ts", "subj", "pred", "obj")
      .withColumn("warc_ts", col("ts").cast("timestamp"))
    val tl = Truth.factTimeline(cl)
    def asOf(ts: String) = Truth.factsAsOf(tl, java.sql.Timestamp.valueOf(ts))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(asOf("2025-01-03 00:00:00") === Set(("e", "p", "v1")))     // v2 and f unseen yet
    assert(asOf("2025-01-07 00:00:00") === Set(("e", "p", "v2")))     // v1 superseded
    assert(asOf("2025-01-10 00:00:00") === Set(("e", "p", "v2"), ("f", "q", "w1")))
    // boundary: valid_from ≤ ts < valid_until — at exactly day 5, v2 serves
    assert(asOf("2025-01-05 00:00:00") === Set(("e", "p", "v2")))
  }

  test("intervalConflicts: cross-source overlap with disagreeing values only") {
    val s2 = spark
    import s2.implicits._
    // source A: e/p = v1 on day 1, superseded by v2 on day 5 (until = day 5)
    // source B: e/p = vX on day 3 (open) — overlaps A's [1,5) v1 AND [5,∞) v2
    // source C: e/p = v1 on day 2 (open) — AGREES with A's v1 (no conflict),
    //           disagrees with A's v2 (overlap from day 5) and B's vX (day 3)
    // source D: f/q = w1 — different item, never conflicts
    val cl = Seq(
      ("A", "2025-01-01 00:00:00", "e", "p", "v1"),
      ("A", "2025-01-05 00:00:00", "e", "p", "v2"),
      ("B", "2025-01-03 00:00:00", "e", "p", "vX"),
      ("C", "2025-01-02 00:00:00", "e", "p", "v1"),
      ("D", "2025-01-01 00:00:00", "f", "q", "w1")
    ).toDF("src", "ts", "subj", "pred", "obj")
      .withColumn("warc_ts", col("ts").cast("timestamp"))
    val got = Truth.intervalConflicts(Truth.sourceTimeline(cl))
      .collect().map(r => (r.getString(2), r.getString(3), r.getString(4),
        r.getString(5), r.getTimestamp(6).toString)).toSet
    assert(got === Set(
      ("A", "v1", "B", "vX", "2025-01-03 00:00:00.0"),
      ("A", "v2", "B", "vX", "2025-01-05 00:00:00.0"),
      ("A", "v2", "C", "v1", "2025-01-05 00:00:00.0"),
      ("B", "vX", "C", "v1", "2025-01-03 00:00:00.0")))
    // closed-interval miss: B's claim AFTER A's v1 window would not pair
    // with v1 — shift B to day 0..1 window check via a disjoint fixture
    val cl2 = Seq(
      ("A", "2025-01-01 00:00:00", "e", "p", "v1"),
      ("A", "2025-01-02 00:00:00", "e", "p", "v2"),
      ("B", "2025-01-03 00:00:00", "e", "p", "v3")
    ).toDF("src", "ts", "subj", "pred", "obj")
      .withColumn("warc_ts", col("ts").cast("timestamp"))
    val got2 = Truth.intervalConflicts(Truth.sourceTimeline(cl2))
      .collect().map(r => (r.getString(3), r.getString(5))).toSet
    // v1's interval [day1, day2) ends before B starts → only v2 conflicts
    assert(got2 === Set(("v2", "v3")))
  }
}
