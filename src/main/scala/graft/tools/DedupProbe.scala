package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing probe for the td_dedup_minhash headline: times each
  * sub-plan of [[graft.dedup.Dedup.minhashLsh]] in isolation (one warmup +
  * best-of-2 per stage) so a bench-line investigation can see WHERE the
  * seconds go before touching the operator. Evidence tool, not a gate. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("dedup-probe").getOrCreate()
    import graft.dedup.Dedup._

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def stage(name: String)(f: => Long): Unit = {
      f // warmup
      val runs = (1 to 2).map(_ => time(f))
      println(f"[dedup-probe] $name%-28s best ${runs.map(_._2).min}%6.2f s  rows ${runs.head._1}%d")
    }

    val corpus = graft.queries.TrainingDataQueries.corpus(spark, sfDir)
    val threshold = 0.8

    stage("corpus")(corpus.count())
    stage("minhash(sig rows)")(minhash(corpus).count())
    val mh = minhash(corpus)
    val sigs = mh.groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("mh")))),
        x => x.getField("mh")).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(expr(s"transform(sequence(0, ${NumHashes / BandRows - 1}), " +
          s"b -> struct(b AS band, array_join(transform(slice(sig, b * $BandRows + 1, $BandRows), x -> cast(x AS string)), '_') AS key))")).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    stage("sigs+bands")(sigs.count())
    val agreeExpr = graft.expr.SigOps.agree(col("siga"), col("sigb"))
    val cand2 = sigs.select(col("doc_id").as("a"), col("sig").as("siga"), col("band"), col("key"))
      .join(sigs.select(col("doc_id").as("b"), col("sig").as("sigb"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("a") < col("b"))
      .filter(agreeExpr >= sigAgreeMin(threshold))
      .select("a", "b").distinct()
    stage("band join+prefilter+dist")(cand2.count())
    val slim = sigs.select(col("doc_id").as("a"), col("band"), col("key"))
      .join(sigs.select(col("doc_id").as("b"), col("band"), col("key")), Seq("band", "key"))
      .filter(col("a") < col("b"))
    stage("raw collisions (no sigs)")(slim.count())
    stage("distinct-first candidates") {
      val sigArr = sigs.select(col("doc_id"), col("sig")).distinct()
      slim.select("a", "b").distinct()
        .join(broadcast(sigArr.select(col("doc_id").as("a"), col("sig").as("siga"))), Seq("a"))
        .join(broadcast(sigArr.select(col("doc_id").as("b"), col("sig").as("sigb"))), Seq("b"))
        .filter(agreeExpr >= sigAgreeMin(threshold))
        .select("a", "b").count()
    }
    stage("shingleArrays")(graft.text.TextOps.shingleArrays(corpus).count())
    stage("jaccard verify (full)")(jaccardOf(corpus, cand2)
      .filter(col("jaccard") >= threshold).count())
    // hypothesis: the verify cost is the TWO shuffle_hash exchanges of the
    // multi-million-row pair stream, not the merge CPU — broadcast the
    // (tiny) array table into both joins and the pair stream never moves
    stage("verify w/ broadcast arrays") {
      val shArr = graft.text.TextOps.shingleArrays(corpus)
      val overlap = graft.expr.SigOps.sortedOverlapAtLeast(col("ha"), col("hb"), threshold)
      cand2
        .join(broadcast(shArr.select(col("doc_id").as("a"), col("hs").as("ha"))), Seq("a"))
        .join(broadcast(shArr.select(col("doc_id").as("b"), col("hs").as("hb"))), Seq("b"))
        .select(col("a"), col("b"), overlap.cast("long").as("i"),
          size(col("ha")).cast("long").as("na"), size(col("hb")).cast("long").as("nb"))
        .filter(col("i") >= 0)
        .select(col("a"), col("b"),
          round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 5).as("jaccard"))
        .filter(col("jaccard") >= threshold).count()
    }
    stage("minhashLsh end-to-end")(minhashLsh(corpus, threshold).count())

    // ---- r6: decompose the candidate-generation 6.7 s ----
    // materialized index (the engine's actual starting point)
    val sigsCk = lshIndex(corpus).localCheckpoint(true)
    stage("slim join from ck (count)") {
      sigsCk.select(col("doc_id").as("a"), col("band"), col("key"))
        .join(sigsCk.select(col("doc_id").as("b"), col("band"), col("key")),
          Seq("band", "key"))
        .filter(col("a") < col("b")).count()
    }
    stage("slim distinct from ck") {
      sigsCk.select(col("doc_id").as("a"), col("band"), col("key"))
        .join(sigsCk.select(col("doc_id").as("b"), col("band"), col("key")),
          Seq("band", "key"))
        .filter(col("a") < col("b")).select("a", "b").distinct().count()
    }
    stage("wide join+prefilter (no dist)") {
      sigsCk.select(col("doc_id").as("a"), col("sig").as("siga"), col("band"), col("key"))
        .join(sigsCk.select(col("doc_id").as("b"), col("sig").as("sigb"), col("band"), col("key")),
          Seq("band", "key"))
        .filter(col("a") < col("b"))
        .filter(agreeExpr >= sigAgreeMin(threshold)).count()
    }
    stage("cand from ck (engine shape)") {
      sigsCk.select(col("doc_id").as("a"), col("sig").as("siga"), col("band"), col("key"))
        .join(sigsCk.select(col("doc_id").as("b"), col("sig").as("sigb"), col("band"), col("key")),
          Seq("band", "key"))
        .filter(col("a") < col("b"))
        .filter(agreeExpr >= sigAgreeMin(threshold))
        .select("a", "b").distinct().count()
    }
    // no candidate distinct at all: verify the (duplicated) collision pairs
    // and dedup the tiny surviving set at the end
    stage("no-dist verify (dup pairs)") {
      val cand = sigsCk.select(col("doc_id").as("a"), col("sig").as("siga"), col("band"), col("key"))
        .join(sigsCk.select(col("doc_id").as("b"), col("sig").as("sigb"), col("band"), col("key")),
          Seq("band", "key"))
        .filter(col("a") < col("b"))
        .filter(agreeExpr >= sigAgreeMin(threshold))
        .select("a", "b")
      jaccardOf(corpus, cand)
        .filter(col("jaccard") >= threshold).distinct().count()
    }
    // skew hypothesis: the collision fanout lives in a few fat join tasks,
    // so distinct's PARTIAL hash-aggregate runs serially there. An explicit
    // hash exchange on (a, b) before the aggregate moves rows first (cheap)
    // and dedups in parallel.
    stage("repart(a,b) distinct from ck") {
      sigsCk.select(col("doc_id").as("a"), col("sig").as("siga"), col("band"), col("key"))
        .join(sigsCk.select(col("doc_id").as("b"), col("sig").as("sigb"), col("band"), col("key")),
          Seq("band", "key"))
        .filter(col("a") < col("b"))
        .filter(agreeExpr >= sigAgreeMin(threshold))
        .select("a", "b").repartition(col("a"), col("b")).distinct().count()
    }
    stage("repart(256) distinct from ck") {
      sigsCk.select(col("doc_id").as("a"), col("sig").as("siga"), col("band"), col("key"))
        .join(sigsCk.select(col("doc_id").as("b"), col("sig").as("sigb"), col("band"), col("key")),
          Seq("band", "key"))
        .filter(col("a") < col("b"))
        .filter(agreeExpr >= sigAgreeMin(threshold))
        .select("a", "b").repartition(256, col("a"), col("b")).distinct().count()
    }
    spark.stop()
  }
}
