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
}
