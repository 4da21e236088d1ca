package graft.core

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distincts, native-typed min/max") {
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(10L), Some("a")),
      (Some(3L), None),
      (None, Some("a")))
      .toDF("num", "s")
    val got = Profile.profile(df, Seq("num", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)))).toMap
    // numeric min/max: 3 < 10 (native Long order, NOT "10" < "3" lexical)
    assert(got("num") === ((4L, 1L, 2L, Some("3"), Some("10"))))
    assert(got("s") === ((4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("profile of an all-null column reports null min/max, zero distinct") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "v")
    val got = Profile.profile(df, Seq("v")).collect().head
    assert(got.getLong(2) === 2L && got.getLong(3) === 0L)
    assert(got.isNullAt(4) && got.isNullAt(5))
  }

  test("quantilesDisc: integer-percent rank math, hand-traced ladder") {
    // n=4 per key: ranks ceil(p*4/100) = 1, 2, 3, 4 for p = 25/50/75/95
    val df = Seq(("a", 1L, 40L), ("a", 2L, 10L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("b", 5L, 7L), ("b", 6L, 5L), ("b", 7L, 5L))
      .toDF("k", "doc_id", "v")
    val got = Profile.quantilesDisc(df, "v", Seq("k"), Seq(25, 50, 75, 95), "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("a", 25) -> 10L, ("a", 50) -> 20L, ("a", 75) -> 30L, ("a", 95) -> 40L,
      // n=3: ranks ceil(.75)=1, ceil(1.5)=2, ceil(2.25)=3, ceil(2.85)=3
      ("b", 25) -> 5L, ("b", 50) -> 5L, ("b", 75) -> 7L, ("b", 95) -> 7L))
  }

  test("quantilesDisc: brute-force parity on a seeded random table with ties") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 400L).map(i =>
      (s"k${rnd.nextInt(5)}", i, rnd.nextInt(20).toLong)) // heavy ties
    val percents = Seq(1, 10, 37, 50, 83, 95, 100)
    val got = Profile.quantilesDisc(rows.toDF("k", "doc_id", "v"),
        "v", Seq("k"), percents, "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val sorted = rs.map(_._3).sorted
      percents.map { p =>
        val rank = (p.toLong * sorted.size + 99L) / 100L // ceil(p*n/100)
        (k, p) -> sorted((rank - 1).toInt)
      }
    }
    assert(got === expected)
  }

  test("quantilesDisc: nulls excluded from rank and count") {
    val df = Seq(("a", 1L, Some(10L)), ("a", 2L, None), ("a", 3L, Some(20L)))
      .toDF("k", "doc_id", "v")
    val got = Profile.quantilesDisc(df, "v", Seq("k"), Seq(50, 95), "doc_id")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // n=2 (null dropped): p50 → rank 1 → 10, p95 → rank 2 → 20
    assert(got === Map(50 -> 10L, 95 -> 20L))
  }
}
