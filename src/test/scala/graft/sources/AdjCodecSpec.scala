package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AdjCodecSpec extends SparkSpec {
  import spark.implicits._

  test("varint gap kernel: fuzz roundtrip over seeded increasing arrays") {
    val rnd = new scala.util.Random(0xadc0dec)
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(40)
      // strictly increasing positives with occasional huge jumps so
      // multi-byte varints (up to 9 bytes) are exercised
      val arr = Iterator.iterate(1L + rnd.nextInt(5))(v =>
        v + 1 + (if (rnd.nextInt(10) == 0) rnd.nextLong(1L << 40) else rnd.nextInt(100)))
        .take(n).toArray
      val dec = AdjCodec.decodeGaps(AdjCodec.encodeGaps(arr))
      assert(dec.toSeq === arr.toSeq)
    }
  }

  test("varint gap kernel: dense lists beat 8 bytes/edge; guards fire") {
    // a dense adjacency (gaps ≤ 127) costs exactly 1 byte/edge
    val dense = (1L to 1000L).toArray
    assert(AdjCodec.encodeGaps(dense).length === 1000)
    // non-increasing input must be rejected, not silently mis-coded
    intercept[IllegalArgumentException](AdjCodec.encodeGaps(Array(5L, 5L)))
    intercept[IllegalArgumentException](AdjCodec.encodeGaps(Array(0L)))
    // truncated cell must be rejected
    intercept[IllegalArgumentException](AdjCodec.decodeGaps(Array(0x80.toByte)))
  }

  test("lex dictionary: locality order compresses a web-shaped graph harder than hash order") {
    // the BV lever: url-lexicographic ids put same-SITE link targets on
    // nearby ids, so an adjacency list's sorted-gap stream collapses to
    // 1-byte varints. The lever needs site-internal link RUNS — the
    // sf testdata's 3-edge lists (hub/next/cdn, three different blocks)
    // have none, so this fixture is a web-shaped site graph: 50 hosts ×
    // 40 pages, each page linking 8 lex-consecutive same-host pages + 1
    // cross-host page. Roundtrip must stay exact under either dictionary.
    val links = (for {
      h <- 0 until 50; p <- 0 until 40
      url = f"https://h$h%02d.ex/p$p%02d"
      dst <- (1 to 8).map(k => f"https://h$h%02d.ex/p${(p + k) % 40}%02d") :+
        f"https://h${(h + 7) % 50}%02d.ex/p$p%02d"
    } yield (url, dst)).toDF("src", "dst")
    val nodes = links.select(col("src").as("id"))
      .unionAll(links.select(col("dst").as("id"))).distinct()
    def bytesUnder(dict: org.apache.spark.sql.DataFrame): Long = {
      val d = dict.localCheckpoint(true)
      val enc = AdjCodec.encode(links, d).localCheckpoint(true)
      val back = AdjCodec.decode(enc, d)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val expect = links.distinct()
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(back === expect)
      enc.agg(sum(octet_length(col("adj")))).head().getLong(0)
    }
    val hashBytes = bytesUnder(AdjCodec.dictionary(nodes))
    val lexBytes = bytesUnder(AdjCodec.lexDictionary(nodes))
    assert(lexBytes < hashBytes,
      s"lex order ($lexBytes B) must beat hash order ($hashBytes B)")
    // determinism across parallelism: the rank is a pure function of the
    // total order, not of the range boundaries
    val a = AdjCodec.lexDictionary(nodes, partitions = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = AdjCodec.lexDictionary(nodes, partitions = 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("incremental merge: byte-identical to from-scratch, untouched cells pass through") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a"))
      .toDF("src", "dst")
    val nodes = edges.select($"src".as("id"))
      .unionAll(edges.select($"dst".as("id"))).distinct()
    val dict = AdjCodec.dictionary(nodes).localCheckpoint(true)
    // increment touches 'a' (existing cell re-encodes) and 'e' via the
    // extended dictionary (new source AND new target)
    val inc = Seq(("a", "d"), ("e", "b")).toDF("src", "dst")
    val dict2 = AdjCodec.extendDictionary(dict,
      inc.select($"src".as("id")).unionAll(inc.select($"dst".as("id"))))
      .localCheckpoint(true)
    // old ids keep their nid; new ids are dense after the stored max
    val base = dict.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ext = dict2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base.forall { case (k, v) => ext(k) == v })
    assert(ext.values.toSeq.sorted === (1L to ext.size))

    val stored = AdjCodec.encode(edges, dict2).localCheckpoint(true)
    val merged = AdjCodec.mergeIncrement(stored, inc, dict2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toList)).toSet
    val scratch = AdjCodec.encode(edges.unionAll(inc), dict2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toList)).toSet
    assert(merged === scratch)
    // untouched sources (b, c, d) pass through: their cells byte-match the store
    val untouchedNids = Set("b", "c", "d").map(ext)
    val storeCells = stored.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2).toList).toMap
    merged.filter(m => untouchedNids(m._1))
      .foreach(m => assert(m._3 === storeCells(m._1)))
  }

  test("dataframe roundtrip equals distinct adjacency; cells beat raw longs") {
    val edges = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst"))
    val nodes = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id"))).distinct()
    val dict = AdjCodec.dictionary(nodes).localCheckpoint(true)
    val enc = AdjCodec.encode(edges, dict).localCheckpoint(true)
    val back = AdjCodec.decode(enc, dict)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expect = edges.distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === expect)
    // compression: Σ|adj| < 8 bytes × edges (varint gaps vs raw longs)
    val Seq(bytes, deg) = enc.agg(
      sum(octet_length(col("adj"))), sum(col("deg"))).head().toSeq.map(_.asInstanceOf[Long]).toSeq
    assert(deg.toLong === expect.size)
    assert(bytes < 8L * deg, s"codec ($bytes B) must beat raw longs (${8L * deg} B)")
  }
}
