package graft.sample

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TransE trainer laws: a hand-traced single-pair epoch, full-batch
  * determinism under repartitioning, clamp projection, epoch-over-epoch
  * hinge-loss descent on a structured fixture, and the learning signal —
  * the trained model must outrank the untrained init on the same
  * corruption draw. */
class TranseSpec extends SparkSpec {
  import spark.implicits._

  private def pairsDf(rows: Seq[(String, String, String, String, String)]) =
    rows.toDF("src", "pred", "dst", "neg_src", "neg_dst")
      .withColumn("i", lit(0))
      .select("src", "pred", "dst", "i", "neg_src", "neg_dst")

  private def embMap(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
    df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap

  test("hand-traced epoch: one violating pair updates all five roles by ±lr signs") {
    val nodes = Seq("a", "b", "x", "y").toDF("id")
    val edges = Seq(("a", "p", "b")).toDF("src", "pred", "dst")
    val neg = pairsDf(Seq(("a", "p", "b", "x", "y")))
    val cfg = Transe.Config(dim = 2, margin = 100L, lr = 3L, initBound = 8L,
      clamp = 64L, epochs = 1, seed = 7L)
    // margin=100 forces the single pair to violate regardless of init
    val e0 = embMap(Transe.initEntities(nodes, cfg))
    val r0 = embMap(Transe.initRelations(edges, cfg)
      .select(col("pred"), col("remb")))
    val (ent, rel) = Transe.train(nodes, edges, neg, cfg)
    val e1 = embMap(ent)
    val r1 = embMap(rel.select(col("pred"), col("remb")))
    def sgn(v: Long): Long = java.lang.Long.signum(v)
    val dpos = (0 to 1).map(i => sgn(e0("a")(i) + r0("p")(i) - e0("b")(i)))
    val dneg = (0 to 1).map(i => sgn(e0("x")(i) + r0("p")(i) - e0("y")(i)))
    (0 to 1).foreach { i =>
      assert(e1("a")(i) == e0("a")(i) - 3 * dpos(i))
      assert(e1("b")(i) == e0("b")(i) + 3 * dpos(i))
      assert(e1("x")(i) == e0("x")(i) + 3 * dneg(i))
      assert(e1("y")(i) == e0("y")(i) - 3 * dneg(i))
      assert(r1("p")(i) == r0("p")(i) + 3 * (dneg(i) - dpos(i)))
    }
  }

  test("non-violating pair leaves the model untouched") {
    val nodes = Seq("a", "b", "x", "y").toDF("id")
    val edges = Seq(("a", "p", "b")).toDF("src", "pred", "dst")
    val neg = pairsDf(Seq(("a", "p", "b", "x", "y")))
    // margin 0 and the SAME pair geometry: violation iff f(pos) > f(neg);
    // seed chosen so f(pos) <= f(neg) — assert that precondition, then
    // training must be the identity
    val seeds = (1L to 50L).find { s =>
      val cfg = Transe.Config(dim = 2, margin = 0L, epochs = 0, seed = s)
      val e = embMap(Transe.initEntities(nodes, cfg))
      val r = embMap(Transe.initRelations(edges, cfg))
      def f(h: String, t: String) =
        (0 to 1).map(i => math.abs(e(h)(i) + r("p")(i) - e(t)(i))).sum
      f("a", "b") <= f("x", "y")
    }
    assert(seeds.nonEmpty)
    val cfg = Transe.Config(dim = 2, margin = 0L, epochs = 1, seed = seeds.get)
    val cfg0 = cfg.copy(epochs = 0)
    val (e1, r1) = Transe.train(nodes, edges, neg, cfg)
    val (e0, r0) = Transe.train(nodes, edges, neg, cfg0)
    assert(embMap(e1) == embMap(e0))
    assert(embMap(r1.select(col("pred"), col("remb"))) ==
      embMap(r0.select(col("pred"), col("remb"))))
  }

  /** Structured fixture: a bipartite `likes` relation a_i → b_i plus
    * hub noise — enough signal for two epochs to cut the hinge loss. */
  private def fixture() = {
    val n = 40
    val edges = (0 until n).map(i => (s"a$i", "likes", s"b${i % 8}")).toDF("src", "pred", "dst")
    val nodes = ((0 until n).map(i => s"a$i") ++ (0 until 8).map(i => s"b$i")).toDF("id")
    val neg = KgeNegatives.negatives(nodes, edges, k = 1, seed = 42L)
    (nodes, edges, neg)
  }

  test("full-batch training is invariant to input partitioning") {
    val (nodes, edges, neg) = fixture()
    val cfg = Transe.Config(dim = 4, epochs = 2, seed = 42L)
    val (e1, r1) = Transe.train(nodes, edges, neg, cfg)
    val (e2, r2) = Transe.train(nodes.repartition(7), edges.repartition(5),
      neg.repartition(3), cfg)
    assert(embMap(e1) == embMap(e2))
    assert(embMap(r1.select(col("pred"), col("remb"))) ==
      embMap(r2.select(col("pred"), col("remb"))))
  }

  test("coordinates stay inside the clamp ball across epochs") {
    val (nodes, edges, neg) = fixture()
    val cfg = Transe.Config(dim = 4, epochs = 3, clamp = 9L, initBound = 8L,
      lr = 2L, seed = 42L)
    val (ent, rel) = Transe.train(nodes, edges, neg, cfg)
    val mx = ent.select(explode(col("emb")).as("v")).agg(max(abs(col("v"))))
      .head().getLong(0)
    val mr = rel.select(explode(col("remb")).as("v")).agg(max(abs(col("v"))))
      .head().getLong(0)
    assert(mx <= 9L && mr <= 9L)
  }

  test("hinge loss decreases over training and the trained model outranks init") {
    val (nodes, edges, neg) = fixture()
    val cfg = Transe.Config(dim = 8, epochs = 4, margin = 8L, seed = 42L)
    def loss(epochs: Int): Long = {
      val c = cfg.copy(epochs = epochs)
      val (e, r) = Transe.train(nodes, edges, neg, c)
      Transe.hingeLoss(neg, e, r, c).head().getLong(0)
    }
    val l0 = loss(0)
    val l4 = loss(4)
    assert(l4 < l0, s"hinge loss did not descend: $l0 -> $l4")

    def mrr(epochs: Int): Long = {
      val (e, r) = Transe.train(nodes, edges, neg, cfg.copy(epochs = epochs))
      KgeEval.metrics(Transe.transeScored(edges, neg, e, r))
        .select(col("rr_sum_micros")).head().getLong(0)
    }
    assert(mrr(4) > mrr(0), "training did not improve ranking over init")
  }

  test("transeScored carries the metrics contract columns and exact scores") {
    val (nodes, edges, neg) = fixture()
    val cfg = Transe.Config(dim = 4, epochs = 1, seed = 42L)
    val (e, r) = Transe.train(nodes, edges, neg, cfg)
    val sc = Transe.transeScored(edges, neg, e, r)
    assert(sc.columns.toSet ==
      Set("src", "pred", "dst", "cand_src", "cand_dst", "is_pos", "score"))
    // recompute one positive's score by hand from the collected model
    val em = embMap(e)
    val rm = embMap(r.select(col("pred"), col("remb")))
    val row = sc.filter(col("is_pos") === 1).orderBy("src", "dst").head()
    val (h, t) = (row.getString(row.fieldIndex("cand_src")),
      row.getString(row.fieldIndex("cand_dst")))
    val want = -(0 until 4).map(i =>
      math.abs(em(h)(i) + rm("likes")(i) - em(t)(i))).sum
    assert(row.getLong(row.fieldIndex("score")) == want)
  }
}
