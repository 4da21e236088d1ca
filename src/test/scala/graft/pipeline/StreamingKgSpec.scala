package graft.pipeline

import graft.SparkSpec

/** Continuous KG construction parity: StreamingKg (file-source stream,
  * stream-static broadcast link, watermarked triple dedup, AvailableNow)
  * produces exactly the batch pipeline's canonical triple set. */
class StreamingKgSpec extends SparkSpec {

  test("streaming triples == batch triples (AvailableNow parity)") {
    val sf = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("stream_kg_spec_").toString
    Pages.fromDir(spark, sf).write.mode("overwrite").parquet(s"$base/pages")

    val batch = KgPipeline.run(spark, sf, KgPipeline.tempDir("stream_kg_batch_"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    val streamed = StreamingKg.runAvailableNow(
      spark, s"$base/pages", s"$base/out", s"$base/ck", delay = "7 days")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("the streaming plan is actually streaming and dedup state is keyed") {
    val sf = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("stream_kg_plan_").toString
    Pages.fromDir(spark, sf).write.mode("overwrite").parquet(s"$base/pages")
    val schema = spark.read.parquet(s"$base/pages").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/pages")
    val df = StreamingKg.triples(stream, Pages.aliases(spark))
    assert(df.isStreaming)
    // watermark must survive the stage chain (else state grows unbounded)
    assert(df.queryExecution.analyzed.toString.contains("EventTimeWatermark")
      || df.queryExecution.logical.toString.contains("EventTimeWatermark"))
  }
}
