package graft.pipeline

import graft.SparkSpec

class SortedNeighborSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(String, String)], window: Int, maxDist: Int) =
    Canonicalize.sortedNeighborPairs(
      rows.toDF("id", "name"), "id", "name", window, maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet

  test("sortedNeighborPairs finds rank-adjacent near-duplicates") {
    // sorted: appla, apple, banana, bananna, zzz
    val got = pairs(Seq(
      ("e1", "apple"), ("e2", "appla"), ("e3", "banana"),
      ("e4", "bananna"), ("e5", "zzz")), window = 2, maxDist = 2)
    assert(got === Set(("e2", "e1", 1L), ("e3", "e4", 1L)))
  }

  test("sortedNeighborPairs: u is the LOWER-ranked id in (name, id) order") {
    val got = pairs(Seq(("b_id", "same"), ("a_id", "same")), 1, 0)
    assert(got === Set(("a_id", "b_id", 0L))) // tie on name → id breaks it
  }

  test("sortedNeighborPairs respects the window bound") {
    // sorted: aa, ab, ac, ad — (aa, ad) is within dist 1 but 3 ranks apart
    val names = Seq(("1", "aa"), ("2", "ab"), ("3", "ac"), ("4", "ad"))
    val w1 = pairs(names, window = 1, maxDist = 2)
    assert(w1 === Set(("1", "2", 1L), ("2", "3", 1L), ("3", "4", 1L)))
    val w3 = pairs(names, window = 3, maxDist = 2)
    assert(w3.contains(("1", "4", 1L)) && w3.size === 6)
  }

  test("sortedNeighborPairs filters by edit distance") {
    val got = pairs(Seq(("1", "alpha"), ("2", "alzzz"), ("3", "ambbb")), 2, 2)
    assert(got.isEmpty) // neighbors exist but all are > 2 edits apart
  }

  test("sortedNeighborPairs is partition-invariant") {
    val rows = (1 to 200).map(i => (f"id$i%03d", f"name${i / 2}%04d"))
    val a = pairs(rows, 3, 1)
    val b = Canonicalize.sortedNeighborPairs(
      rows.toDF("id", "name").repartition(11), "id", "name", 3, 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet
    assert(a === b && a.nonEmpty)
  }
}
