package graft.sample

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GnnSamplingSpec extends SparkSpec {
  import spark.implicits._

  // a small two-tier graph with a hub: h has 40 out-neighbors, each leaf
  // links onward to one of 8 sinks
  private lazy val edges = {
    val hub = (0 until 40).map(i => ("h", "p", s"l$i"))
    val onward = (0 until 40).map(i => (s"l$i", "q", s"s${i % 8}"))
    (hub ++ onward).toDF("src", "pred", "dst")
  }
  private lazy val seeds = Seq("h").toDF("id")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getString(4))).toSet

  test("fanout bounds hold per node per layer") {
    val out = GnnSampling.fanoutSample(edges, seeds, Seq(5, 2))
    val over = out.groupBy("layer", "node").count()
      .filter(col("count") > when(col("layer") === 1, 5).otherwise(2))
    assert(over.count() === 0)
    // layer 1: hub has 40 candidates, exactly 5 survive
    assert(out.filter(col("layer") === 1).count() === 5)
  }

  test("layer-2 frontier is exactly the sampled layer-1 neighbors") {
    val out = GnnSampling.fanoutSample(edges, seeds, Seq(5, 2))
    val f1 = out.filter(col("layer") === 1).select(col("nbr")).distinct()
      .collect().map(_.getString(0)).toSet
    val l2src = out.filter(col("layer") === 2).select(col("node")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(l2src.subsetOf(f1))
    // every layer-1 neighbor has candidates (the hub edge back at least)
    assert(l2src === f1)
  }

  test("bounded aggregator equals the window-rank reference") {
    val sym = edges.select(col("src").as("node"), col("pred"),
        col("dst").as("nbr"), lit("f").as("dir"))
      .unionAll(edges.select(col("dst").as("node"), col("pred"),
        col("src").as("nbr"), lit("r").as("dir")))
    val rk = md5(concat_ws("|", lit(42L), lit(1), col("dir"),
      col("node"), col("pred"), col("nbr")))
    val sep = ""
    val packed = concat_ws(sep, rk, col("pred"), col("nbr"), col("dir"))
    val ref = sym.join(seeds.select(col("id").as("node")), Seq("node"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("node").orderBy(packed)))
      .filter(col("rn") <= 5)
      .select(lit(1).as("layer"), col("node"), col("pred"), col("nbr"), col("dir"))
    val got = GnnSampling.fanoutSample(edges, seeds, Seq(5)).select(
      col("layer"), col("node"), col("pred"), col("nbr"), col("dir"))
    assert(rows(got) === rows(ref))
  }

  test("byte-identical at different parallelism") {
    val a = rows(GnnSampling.fanoutSample(edges.repartition(1), seeds, Seq(3, 2)))
    val b = rows(GnnSampling.fanoutSample(edges.repartition(13), seeds, Seq(3, 2)))
    assert(a === b)
  }

  test("direction column distinguishes reversed candidates") {
    // seed on a sink: all its candidates are in-edges → dir 'r'
    val out = GnnSampling.fanoutSample(edges, Seq("s0").toDF("id"), Seq(3))
    assert(out.count() === 3)
    assert(out.filter(col("dir") =!= "r").count() === 0)
  }

  test("MinKStrings keeps k smallest distinct under any merge order") {
    val agg = new GnnSampling.MinKStrings(3)
    val vals = Seq("d", "b", "e", "b", "a", "c", "a")
    val single = vals.foldLeft(agg.zero)(agg.reduce)
    assert(single.toSeq === Seq("a", "b", "c"))
    val (l, r) = vals.splitAt(3)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq === Seq("a", "b", "c"))
    assert(agg.merge(agg.zero, single).toSeq === Seq("a", "b", "c"))
  }
}
