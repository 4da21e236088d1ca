package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MinHash-LSH-blocked canonicalization over a fuzzy alias catalog —
  * name variants that share NO exact normalization key, the case the
  * banded blocking exists for. */
class FuzzyCanonSpec extends SparkSpec {

  private def aliasDf(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("surface", "entity_id", "score")
  }

  test("fuzzy variants link, chains close transitively, singletons survive") {
    val aliases = aliasDf(Seq(
      // three single-edit variants of one name: whichever pairs the bands
      // surface, CC closes the set into one component (banding recall at a
      // given Jaccard is per-pair; transitive closure is what makes the
      // blocking robust)
      ("acme corporation limited holdings 42", "e01", 0.9),
      ("acme corporation limited holding 42", "e02", 0.8),
      ("acme corporation limited holding 421", "e03", 0.7),
      // near-identical pair, distinct prefix from acme
      ("globex heavy industries manufacturing gmbh 7", "e10", 0.9),
      ("globex heavy industries manufacturing gmbh 77", "e11", 0.8),
      // unrelated singleton
      ("initech systems 9", "e20", 0.9)))
    val canon = Canonicalize.fuzzyCanonicalMap(aliases, threshold = 0.5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon.keySet === Set("e01", "e02", "e03", "e10", "e11", "e20"))
    // one component per brand, rooted at the min entity id
    assert(canon("e01") === "e01" && canon("e02") === "e01" && canon("e03") === "e01")
    assert(canon("e10") === "e10" && canon("e11") === "e10")
    assert(canon("e20") === "e20")
  }

  test("alsoExactKey composes fuzzy blocking with the normalization key") {
    val aliases = aliasDf(Seq(
      // same normKey (prefix 'ent' + digits 7) but near-zero shingle
      // overlap — only the exact-key path links these
      ("Ent 7", "e1", 0.9),
      ("Entity 7", "e2", 0.8),
      // fuzzy-only pair: distinct normKeys (digits differ: '311'/'31'),
      // high shingle overlap
      ("vandelay imports co 311", "e3", 0.9),
      ("vandelay importz co 311", "e4", 0.8)))
    val fuzzyOnly = Canonicalize.fuzzyCanonicalMap(aliases, threshold = 0.5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fuzzyOnly("e1") === "e1" && fuzzyOnly("e2") === "e2") // not linked
    assert(fuzzyOnly("e4") === "e3")
    val both = Canonicalize.fuzzyCanonicalMap(aliases, threshold = 0.5,
      alsoExactKey = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(both("e1") === "e1" && both("e2") === "e1") // key path links them
    assert(both("e4") === "e3")
  }

  test("no linkable pairs at all: every entity is its own canonical") {
    val aliases = aliasDf(Seq(
      ("alpha one 1", "e1", 0.9), ("zeta omega 999", "e2", 0.9)))
    val canon = Canonicalize.fuzzyCanonicalMap(aliases, threshold = 0.9)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(canon === Map("e1" -> "e1", "e2" -> "e2"))
  }
}
