package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packing laws: spans partition docs, bins fill to budget, tails short") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), col("doc_id").cast("long").as("doc_id"), col("text"))
    val budget = 64L
    val m = Packing.packManifest(docs, budget).localCheckpoint(true)
    val rows = m.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // doc spans are non-empty, ordered, and partition [0, toks)
    val toks = docs.select(col("lang"), col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.groupBy(r => (r._1, r._2)).foreach { case (key, spans) =>
      val s = spans.sortBy(_._3)
      assert(s.head._4 === 0L, s"$key first span must start at 0")
      assert(s.last._5 === toks(key), s"$key last span must end at token count")
      assert(s.forall(x => x._5 > x._4), s"$key has an empty span")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._3 + 1, s"$key bins must be consecutive")
          assert(b._4 === a._5, s"$key spans must be contiguous")
        case _ =>
      }
    }

    // every bin except each stream's last packs exactly `budget` tokens
    val perBin = rows.groupBy(r => (r._1, r._3))
      .map { case (k, v) => k -> v.map(x => x._5 - x._4).sum }
    val lastBin = rows.groupBy(_._1).map { case (l, v) => l -> v.map(_._3).max }
    perBin.foreach { case ((lang, bin), total) =>
      if (bin < lastBin(lang)) assert(total === budget, s"bin ($lang, $bin) underfilled")
      else assert(total <= budget, s"tail bin ($lang, $bin) overfilled")
    }

    // total conservation: manifest tokens == corpus tokens
    assert(rows.map(r => r._5 - r._4).sum === toks.values.sum)
  }
}
