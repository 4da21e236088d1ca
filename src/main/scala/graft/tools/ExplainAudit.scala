package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted plans for the hot paths — pushdown / broadcast /
  * whole-stage-codegen audit (run via sbt "runMain graft.tools.ExplainAudit"). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      df.explain("formatted")
    }

    val kb = graft.sources.TpchKg.load(spark, dir)
    show("kg_triples")(kb.triples)
    show("ce_exists_nested")(graft.expr.Eval(kb,
      graft.expr.Exists("placedBy", graft.expr.Exists("inNation",
        graft.expr.HasValue("inRegion", "r:2")))))
    show("link_stage") {
      val pages = graft.pipeline.Pages.fromDir(spark, dir)
      val m = graft.pipeline.Mentions(graft.pipeline.Extract(pages)).toDF()
      graft.pipeline.Link(m, graft.pipeline.Pages.aliases(spark))
    }
    show("minhash")(graft.dedup.Dedup.minhash(
      graft.queries.TrainingDataQueries.corpus(spark, dir)))
    show("ann_topk")(graft.sim.Ann.bruteForceTopK(
      spark.read.parquet(s"$dir/embeddings.parquet"), 0L to 9L, 5))
    // walk setup (teleport index): must contain NO WindowExec without
    // partitioning — ranks come from the bucketed two-pass (Ranks)
    show("walk_teleport_index") {
      import org.apache.spark.sql.functions._
      val h = graft.core.Determinism.detHash(42L ^ 0x77, col("id"))
      graft.core.Ranks.rankByBucketedOrder(
        kb.nodes.select(col("id"), lit(0).as("tier")),
        col("tier") * 64 + graft.core.Ranks.signedRangeBucket(h, 6),
        Seq(h, col("id")), "trn")
    }
    // LP encode negative sampling: TakeOrderedAndProject, no global window
    show("lp_encode_negsample")(graft.lp.LearningProblem.encode(kb,
      graft.lp.Lp(pos = Seq("c:1", "c:2"), neg = Nil)).kbNeg)
    // dedup verify stage: pairs join arrays (no forced broadcast), codegen
    // signature-agreement prefilter
    show("dedup_verify")(graft.dedup.Dedup.minhashLsh(
      graft.queries.TrainingDataQueries.corpus(spark, dir), 0.8))
    // winnowing: doc-partitioned sliding window over the KGramHashes expr
    show("winnow")(graft.text.TextOps.winnow(
      spark.read.parquet(s"$dir/documents.parquet")))
    // banded embedding LSH near-dup
    show("emb_near_dup")(graft.sim.Ann.nearDupPairs(
      spark.read.parquet(s"$dir/embeddings.parquet"), 0.999))
    // search-tree batched candidate scoring: the tagged retrieval union
    // aggregates by cid; the LP-scale pos/neg sides must come in as
    // BroadcastHashJoin, never SMJ over the retrieval stream
    show("search_tree_batch_eval") {
      import org.apache.spark.sql.functions._
      val elp = graft.lp.LearningProblem.encode(kb,
        graft.lp.Lp(pos = Seq("c:1", "c:2"), neg = Seq("s:1")))
      val ces: Seq[graft.expr.ClassExpr] = Seq(
        graft.expr.Named("Customer"),
        graft.expr.Exists("inNation", graft.expr.HasValue("inRegion", "r:0")))
      ces.zipWithIndex.map { case (ce, i) =>
        graft.expr.Eval(kb, ce).select(lit(i).as("cid"), col("id"))
      }.reduce(_.union(_)).distinct()
        .join(broadcast(elp.kbPos.select(col("id"), lit(1L).as("p"))), Seq("id"), "left")
        .join(broadcast(elp.kbNeg.select(col("id"), lit(1L).as("n"))), Seq("id"), "left")
        .groupBy("cid")
        .agg(count(lit(1)).as("cnt"),
          sum(coalesce(col("p"), lit(0L))).as("tp"),
          sum(coalesce(col("n"), lit(0L))).as("fp"))
    }
    spark.stop()
  }
}
