package graft.sample

import graft.SparkSpec
import graft.core.Kb
import graft.fixtures.HepatitisLikeKb
import org.apache.spark.sql.functions._

/** Distributed DeepWalk corpus: pick parity against a hand-evaluated md5
  * reference on a tiny graph, walk validity (every consecutive pair is an
  * edge), dead-end termination, rep counts, and determinism across
  * partitionings. */
class DeepWalkSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def tinyKb(edges: Seq[(String, String, String)]): Kb = {
    val nodes = edges.flatMap(e => Seq(e._1, e._3)).distinct
    Kb(
      nodes = nodes.toDF("id"),
      edges = edges.toDF("src", "pred", "dst"),
      attrs = Kb.empty(s).attrs,
      types = Kb.empty(s).types,
      tbox = graft.core.Tbox(Nil, Nil, Nil))
  }

  private def md5hex(str: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** pure-Scala replay of the pick rule: min over (md5 hex, pred, dst) */
  private def refWalk(edges: Seq[(String, String, String)], start: String,
                      rep: Int, steps: Int, seed: Long): Seq[String] = {
    val wid = s"$start#$rep"
    val out = scala.collection.mutable.Buffer(start)
    var cur = start
    var i = 1
    var done = false
    while (i <= steps && !done) {
      val cand = edges.filter(_._1 == cur)
        .map(e => (md5hex(s"$seed|$i|$wid|${e._2}|${e._3}"), e._2, e._3))
      if (cand.isEmpty) done = true
      else { cur = cand.min._3; out += cur; i += 1 }
    }
    out.toSeq
  }

  test("picks match the md5 reference; dead ends terminate") {
    // b is a dead end; a has three out-edges (two to c with different
    // preds — the (h, pred, dst) total order is load-bearing)
    val edges = Seq(
      ("a", "p", "b"), ("a", "q", "c"), ("a", "p", "c"),
      ("c", "p", "a"), ("c", "p", "b"))
    val kb = tinyKb(edges)
    val starts = Seq("a", "b", "c").toDF("id")
    val out = DeepWalk.corpus(kb, starts, reps = 2, steps = 4, seed = 7L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val byWalk = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for (n <- Seq("a", "b", "c"); r <- 0 to 1) {
      assert(byWalk(s"$n#$r") === refWalk(edges, n, r, 4, 7L), s"walk $n#$r")
    }
    // dead-end walks from b stop at step 0
    assert(byWalk("b#0") === Seq("b") && byWalk("b#1") === Seq("b"))
  }

  test("walk validity and rep counts on the fixture graph") {
    val kb = HepatitisLikeKb.kb(s).cache()
    val starts = kb.nodes.orderBy(col("id")).limit(20)
    val out = DeepWalk.corpus(kb, starts, reps = 3, steps = 5, seed = 42L).cache()
    assert(out.filter(col("step") === 0).count() === 60L) // 20 starts × 3 reps
    // every consecutive (step, step+1) pair of a walk is an original edge
    val steps = out.select(col("walk_id"), col("step"), col("node"))
    val pairs = steps.as("a").join(steps.as("b"),
        col("a.walk_id") === col("b.walk_id") && col("b.step") === col("a.step") + 1)
      .select(col("a.node").as("src"), col("b.node").as("dst"))
    val invalid = pairs.join(
      kb.edges.select("src", "dst").distinct(), Seq("src", "dst"), "left_anti")
    assert(invalid.isEmpty)
    out.unpersist()
  }

  test("skip-gram pairs: hand-checked counts and symmetry") {
    // one fixed 3-step path per walk: chain a→b→c→d (deterministic: single
    // out-edge everywhere)
    val edges = Seq(("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"))
    val kb = tinyKb(edges)
    val corpus = DeepWalk.corpus(kb, Seq("a").toDF("id"), reps = 1, steps = 3, seed = 1L)
    val pairs = DeepWalk.skipGramPairs(corpus, window = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // walk = a b c d; window 2: a sees b,c; b sees a,c,d; c sees a,b,d; d sees b,c
    val expected = Map(
      ("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "a") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "a") -> 1L, ("c", "b") -> 1L, ("c", "d") -> 1L,
      ("d", "b") -> 1L, ("d", "c") -> 1L)
    assert(pairs === expected)
    // symmetry holds on any corpus: |step diff| is symmetric in (a, b)
    val big = DeepWalk.skipGramPairs(
      DeepWalk.corpus(HepatitisLikeKb.kb(s), Seq("p1", "p2", "p3").toDF("id"),
        reps = 2, steps = 5, seed = 42L), window = 2)
    val m = big.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    m.foreach { case ((c, x), n) => assert(m(x -> c) === n, s"asym $c/$x") }
  }

  test("determinism across partitionings") {
    val kb = HepatitisLikeKb.kb(s)
    val starts = kb.nodes.orderBy(col("id")).limit(10)
    def run(parts: Int) = DeepWalk.corpus(
        kb.copy(edges = kb.edges.repartition(parts)), starts, 2, 4, 42L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(run(1) === run(11))
  }

  test("ppmi: hand-computed num/den, positive-PMI filter") {
    val pairs = Seq(("a", "b", 4L), ("a", "c", 1L), ("b", "a", 4L), ("c", "a", 1L))
      .toDF("center", "context", "cnt")
    val got = DeepWalk.ppmiPairs(pairs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(3), r.getLong(4))).toMap
    // total = 10; center sums a=5 b=4 c=1; context sums b=4 a=5 c=1
    assert(got == Map(
      ("a", "b") -> (40L, 20L), // PMI = log 2 > 0
      ("a", "c") -> (10L, 5L),
      ("b", "a") -> (40L, 20L),
      ("c", "a") -> (10L, 5L)))
  }

  test("ppmi: independent (uniform) co-occurrence has no positive-PMI pair") {
    val pairs = Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "a", 1L), ("b", "b", 1L))
      .toDF("center", "context", "cnt")
    assert(DeepWalk.ppmiPairs(pairs).count() == 0L) // every num = den = 4
  }

  test("ppmi over a real corpus: filter keeps exactly the num>den pairs") {
    val corpus = DeepWalk.corpus(HepatitisLikeKb.kb(s),
      Seq("p1", "p2", "p3").toDF("id"), reps = 2, steps = 5, seed = 42L)
    val pairs = DeepWalk.skipGramPairs(corpus, window = 2)
    val ppmi = DeepWalk.ppmiPairs(pairs).collect()
    assert(ppmi.nonEmpty)
    ppmi.foreach(r => assert(r.getLong(3) > r.getLong(4)))
    // recompute one row's num/den by hand from the raw pair table
    val m = pairs.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = m.values.sum
    val r0 = ppmi.head
    val cs = m.collect { case ((c, _), n) if c == r0.getString(0) => n }.sum
    val xs = m.collect { case ((_, x), n) if x == r0.getString(1) => n }.sum
    assert(r0.getLong(3) == m((r0.getString(0), r0.getString(1))) * total)
    assert(r0.getLong(4) == cs * xs)
  }
}
