package graft.sample

import graft.SparkSpec
import graft.core.Kb
import graft.fixtures.HepatitisLikeKb
import org.apache.spark.sql.functions._

/** node2vec biased walks: pick parity against a pure integer-arithmetic
  * reference (md5 threshold + inverse CDF), bias behavior (return weight
  * dominates when wReturn ≫), walk validity, and determinism. */
class Node2VecSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def tinyKb(edges: Seq[(String, String, String)]): Kb = {
    val nodes = edges.flatMap(e => Seq(e._1, e._3)).distinct
    Kb(nodes.toDF("id"), edges.toDF("src", "pred", "dst"),
      Kb.empty(s).attrs, Kb.empty(s).types, graft.core.Tbox(Nil, Nil, Nil))
  }

  private def md5hex(str: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** pure replay of the operator's contract */
  private def refWalk(edges: Seq[(String, String, String)], start: String,
                      rep: Int, steps: Int, w: (Int, Int, Int), seed: Long): Seq[String] = {
    val (wr, wn, wf) = w
    val adj = edges.groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3)).sorted).toMap
    val pairs = edges.map(e => (e._1, e._3)).toSet
    val wid = s"$start#$rep"
    var prev: String = null
    var cur = start
    val out = scala.collection.mutable.Buffer(start)
    var i = 1
    var done = false
    while (i <= steps && !done) {
      val cand = adj.getOrElse(cur, Nil)
      if (cand.isEmpty) done = true
      else {
        val ws = cand.map { case (_, d) =>
          if (prev == null) wn
          else if (d == prev) wr
          else if (pairs((prev, d))) wn
          else wf
        }
        val tot = ws.sum
        val thr = (java.lang.Long.parseLong(md5hex(s"$seed|$i|$wid").take(12), 16) % tot) + 1
        var cum = 0L
        var next: String = null
        cand.zip(ws).iterator.takeWhile(_ => next == null).foreach { case ((_, d), wt) =>
          cum += wt; if (cum >= thr) next = d
        }
        prev = cur; cur = next; out += cur; i += 1
      }
    }
    out.toSeq
  }

  private val edges = Seq(
    ("a", "p", "b"), ("a", "q", "c"), ("a", "r", "d"), ("b", "p", "a"),
    ("b", "p", "c"), ("c", "p", "a"), ("c", "q", "d"), ("d", "p", "a"))

  test("picks match the integer-arithmetic reference") {
    val kb = tinyKb(edges)
    val starts = Seq("a", "b", "c", "d").toDF("id")
    val out = Node2Vec.corpus(kb, starts, reps = 2, steps = 4,
        wReturn = 1, wNear = 4, wFar = 16, seed = 7L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val byWalk = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for (n <- Seq("a", "b", "c", "d"); r <- 0 to 1)
      assert(byWalk(s"$n#$r") === refWalk(edges, n, r, 4, (1, 4, 16), 7L), s"walk $n#$r")
  }

  test("bias behavior: a huge return weight makes walks oscillate") {
    // start d: one out-edge d→a (uniform first step); at a with prev = d
    // the return candidate d carries weight 100000 against 1 for b/c, so
    // the threshold (≤ tot = 100002) lands in d's cumulative span with
    // overwhelming margin at every subsequent step — the walk must bounce
    val kb = tinyKb(edges)
    val out = Node2Vec.corpus(kb, Seq("d").toDF("id"), reps = 1, steps = 5,
        wReturn = 100000, wNear = 1, wFar = 1, seed = 7L)
      .collect().sortBy(_.getInt(1)).map(_.getString(2)).toSeq
    // d → a (uniform first step), then return-dominated: a → d → a → d …
    assert(out === Seq("d", "a", "d", "a", "d", "a"))
  }

  test("walk validity and determinism across partitionings") {
    val kb = HepatitisLikeKb.kb(s).cache()
    val starts = kb.nodes.orderBy(col("id")).limit(15)
    def run(parts: Int) = Node2Vec.corpus(
        kb.copy(edges = kb.edges.repartition(parts)), starts, 2, 4, 1, 4, 16, 42L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val a = run(1)
    assert(a === run(13))
    // consecutive pairs are edges
    val steps = a.toSeq.toDF("walk_id", "step", "node")
    val pairs = steps.as("x").join(steps.as("y"),
        col("x.walk_id") === col("y.walk_id") && col("y.step") === col("x.step") + 1)
      .select(col("x.node").as("src"), col("y.node").as("dst"))
    assert(pairs.join(kb.edges.select("src", "dst").distinct(),
      Seq("src", "dst"), "left_anti").isEmpty)
  }
}
