package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Inverted index + BM25: hand-computed postings/features and a
  * hand-evaluated BM25 score on a 3-doc corpus; ranking sanity. */
class RetrievalSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def corpus: DataFrame = Seq(
    (1L, "spark joins tables. Spark scales!"),
    (2L, "the table of tables"),
    (3L, "vector search")).toDF("doc_id", "text")

  test("postings: lowercase alnum-run tokenization, tf counted") {
    val p = Retrieval.postings(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p(("spark", 1L)) == 2L) // case-folded
    assert(p(("table", 2L)) == 1L && p(("tables", 2L)) == 1L) // no stemming
    assert(p.get(("table", 1L)).isEmpty) // doc1 has only 'tables'
    assert(Retrieval.docLengths(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 5L, 2L -> 4L, 3L -> 2L))
  }

  test("bm25Features: exact integers for a fixed query") {
    val f = Retrieval.bm25Features(corpus, Seq("spark", "table")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // N=3, Σlen=11; 'spark' in doc1 tf=2 df=1 len=5; 'table' in doc2 tf=1 df=1 len=4
    assert(f == Map(
      ("spark", 1L) -> ((2L, 1L, 5L, 3L, 11L)),
      ("table", 2L) -> ((1L, 1L, 4L, 3L, 11L))))
  }

  test("bm25TopK matches a hand-evaluated score and ranks by relevance") {
    val top = Retrieval.bm25TopK(corpus, Seq("spark", "table"), k = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // doc1: idf = ln(1 + (3-1+0.5)/1.5) = ln(8/3); tfn = 2/(2 + 1.2*(0.25 + 0.75*5/(11/3)))
    val idf = math.log(1 + 2.5 / 1.5)
    val tfn1 = 2.0 / (2 + 1.2 * (1 - 0.75 + 0.75 * 5.0 / (11.0 / 3)))
    assert(top.head._1 == 1L)
    assert(math.abs(top.head._2 - idf * tfn1) < 1e-12)
    assert(top.map(_._1).toSeq == Seq(1L, 2L)) // doc3 matches nothing
  }

  test("jaccardRank: micro-unit Jaccard ordering, self excluded, ties by doc") {
    // bigrams (space-split, no case folding — Curation's shingle alphabet):
    // q=1 "a b c"   → {a b, b c}
    // d=2 "a b c d" → {a b, b c, c d}: ix=2, jac = 2/3 → 666666
    // d=3 "a b x"   → {a b, b x}:      ix=1, jac = 1/3 → 333333
    // d=4 "b c y"   → {b c, c y}:      ix=1, jac = 1/3 → 333333 (tie → doc asc)
    // d=5 "z w"     → no shared gram: absent
    val docs = Seq((1L, "a b c"), (2L, "a b c d"), (3L, "a b x"),
      (4L, "b c y"), (5L, "z w")).toDF("doc_id", "text")
    val got = Retrieval.jaccardRank(docs, Seq(1L), topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq.sortBy(_._3) === Seq((1L, 2L, 1), (1L, 3L, 2), (1L, 4L, 3)))
    intercept[IllegalArgumentException](Retrieval.jaccardRank(docs, Nil, 10))
  }

  test("rrfFuse: integer 10^9 div (k+rank) sums, absent docs contribute 0") {
    val r1 = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "doc", "rank")
    val r2 = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("q", "doc", "rank")
    val got = Retrieval.rrfFuse(Seq(r1, r2), k = 60, topK = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toList.sortBy(_._3)
    val c = (r: Int) => 1000000000L / (60L + r)
    // doc 11 in both (rank 2 + rank 1) beats doc 10 (rank 1 only)
    assert(got === List(
      (11L, c(2) + c(1), 1), (10L, c(1), 2), (12L, c(2), 3)))
    // topK cuts; empty rankings rejected
    assert(Retrieval.rrfFuse(Seq(r1, r2), topK = 1).count() === 1)
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Nil))
  }

  test("real corpus: every query term's df ≤ n_docs and features join consistently") {
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val f = Retrieval.bm25Features(docs, Seq("spark", "table", "join", "vector"))
    val bad = f.filter(($"df" > $"n_docs") || ($"tf" > $"doclen")).count()
    assert(bad == 0L)
    assert(f.count() > 0L)
  }
}
