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

  test("canonical-map refresh: restart with a new dictionary, no re-emits") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("stream_kg_refresh_").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

    // backlog part 1: doc_ids [0, 50) — includes doc 12 ("Entity 12" →
    // entB_12, canonical entA_12 under the shipped dictionary)
    Pages.fromDocuments(docs.filter(col("doc_id") < 50))
      .write.mode("append").parquet(s"$base/pages")
    val run1 = rows(StreamingKg.runAvailableNow(
      spark, s"$base/pages", s"$base/out", s"$base/ck", delay = "7 days"))
    assert(run1.contains(("entA_12", "bornIn", "city_12")))
    assert(!run1.exists(_._1 == "ent0_12"))

    // dictionary refresh: a new better-scored candidate id for "Ent 12"
    // joins the entity-12 alias block; "ent0_12" < "entA_12" so the block's
    // canonical id CHANGES for everything linked after the restart
    val v2 = Pages.aliases(spark)
      .unionAll(spark.createDataFrame(Seq(("Ent 12", "ent0_12", 0.95)))
        .toDF("surface", "entity_id", "score"))

    // backlog part 2: doc_ids [100, 160) — includes doc 109 (109 % 97 = 12,
    // "Entity 12" surface); restart against the SAME checkpoint
    Pages.fromDocuments(docs.filter(col("doc_id") >= 100 && col("doc_id") < 160))
      .write.mode("append").parquet(s"$base/pages")
    val run2 = rows(StreamingKg.runAvailableNow(
      spark, s"$base/pages", s"$base/out", s"$base/ck", delay = "7 days",
      aliasesOverride = Some(v2)))

    // new triples canonicalize under the refreshed dictionary (109 % 31 = 16)
    assert(run2.contains(("ent0_12", "bornIn", "city_16")))
    // already-emitted rows survive unchanged and exactly once: the sink
    // grew by the new batch only, and nothing is duplicated across restart
    assert(run1.toSet.subsetOf(run2.toSet))
    assert(run2.size === run2.toSet.size)
    assert(run2.size > run1.size)
  }

  test("durable canonical map: TableIO-stored map drives the stream across restart") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("stream_kg_durable_").toString
    val io = new graft.core.ParquetTableIO(spark, s"$base/store")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

    // cycle start: compute the map ONCE, store it durably, run the query
    // from the STORED copy (not executor-resident localCheckpoint state)
    Canonicalize.writeDurableMap(io, Pages.aliases(spark), "canonical_map")
    Pages.fromDocuments(docs.filter(col("doc_id") < 50))
      .write.mode("append").parquet(s"$base/pages")
    val run1 = rows(StreamingKg.runAvailableNow(
      spark, s"$base/pages", s"$base/out", s"$base/ck", delay = "7 days",
      canonicalMapOverride = Some(Canonicalize.readDurableMap(io, "canonical_map"))))
    assert(run1.contains(("entA_12", "bornIn", "city_12")))

    // SCD refresh cadence: recompute the map from the updated dictionary,
    // OVERWRITE the stored table, restart against the same checkpoint with
    // the re-read map — only unprocessed pages see the new canonical ids
    val v2 = Pages.aliases(spark)
      .unionAll(spark.createDataFrame(Seq(("Ent 12", "ent0_12", 0.95)))
        .toDF("surface", "entity_id", "score"))
    Canonicalize.writeDurableMap(io, v2, "canonical_map")
    Pages.fromDocuments(docs.filter(col("doc_id") >= 100 && col("doc_id") < 160))
      .write.mode("append").parquet(s"$base/pages")
    val run2 = rows(StreamingKg.runAvailableNow(
      spark, s"$base/pages", s"$base/out", s"$base/ck", delay = "7 days",
      aliasesOverride = Some(v2),
      canonicalMapOverride = Some(Canonicalize.readDurableMap(io, "canonical_map"))))

    // post-restart links canonicalize under the refreshed stored map …
    assert(run2.contains(("ent0_12", "bornIn", "city_16")))
    // … while everything emitted before the restart survives exactly once
    assert(run1.toSet.subsetOf(run2.toSet))
    assert(run2.size === run2.toSet.size)
    assert(run2.size > run1.size)
  }

  test("merge sink: incremental restart appends only new pages; full replay appends nothing") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("stream_kg_merge_").toString
    val io = new graft.core.ParquetTableIO(spark, s"$base/store")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    // drain backlog part 1 into the store
    Pages.fromDocuments(docs.filter(col("doc_id") < 50))
      .write.mode("append").parquet(s"$base/pages")
    val run1 = edges(StreamingKg.runMergeAvailableNow(
      spark, s"$base/pages", io, "kg", s"$base/ck", delay = "7 days"))
    assert(run1.nonEmpty)

    // append part 2, restart against the SAME checkpoint: only the new
    // pages' triples merge, and the store grows to the union
    Pages.fromDocuments(docs.filter(col("doc_id") >= 100 && col("doc_id") < 160))
      .write.mode("append").parquet(s"$base/pages")
    val run2 = edges(StreamingKg.runMergeAvailableNow(
      spark, s"$base/pages", io, "kg", s"$base/ck", delay = "7 days"))
    assert(run1.subsetOf(run2))
    assert(run2.size > run1.size)

    // worst-case at-least-once: replay EVERYTHING with a wiped checkpoint —
    // the store is unchanged and the replay's lineage rows are all (0, 0)
    val lineageRowsBefore = io.read("kg/merge_lineage").count()
    val run3 = edges(StreamingKg.runMergeAvailableNow(
      spark, s"$base/pages", io, "kg", s"$base/ck_replay", delay = "7 days"))
    assert(run3 === run2)
    val replayRows = io.read("kg/merge_lineage")
      .orderBy(col("recorded_at")).collect().drop(lineageRowsBefore.toInt)
    assert(replayRows.nonEmpty)
    assert(replayRows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))

    // store-side tables stay consistent: nodes = edge endpoints
    val endpoints = run2.flatMap(e => Set(e._1, e._3))
    assert(ids(io.read("kg/nodes")) === endpoints)
  }

  test("streaming host graph: incremental restart, replay no-op, batch parity") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("stream_hg_spec_").toString
    val io = new graft.core.ParquetTableIO(spark, s"$base/store")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def hg(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    // drain part 1, then append part 2 and restart on the same checkpoint:
    // counts grow incrementally (no recount of part 1)
    Pages.fromDocuments(docs.filter(col("doc_id") < 50))
      .write.mode("append").parquet(s"$base/pages")
    val run1 = hg(StreamingKg.runHostGraphAvailableNow(
      spark, s"$base/pages", io, "wg", s"$base/ck"))
    assert(run1.nonEmpty)
    Pages.fromDocuments(docs.filter(col("doc_id") >= 100 && col("doc_id") < 160))
      .write.mode("append").parquet(s"$base/pages")
    val run2 = hg(StreamingKg.runHostGraphAvailableNow(
      spark, s"$base/pages", io, "wg", s"$base/ck"))

    // parity: the summed partials equal the batch quotient over all pages
    val batch = hg(LinkGraph.hostGraph(
      LinkGraph.links(spark.read.parquet(s"$base/pages")).toDF()))
    assert(run2 === batch)
    assert(run2.map(_._3).sum > run1.map(_._3).sum)

    // worst-case at-least-once: wiped checkpoint replays every batch —
    // the store must not grow and the graph must not change
    val rowsBefore = io.read("wg/host_counts").count()
    val run3 = hg(StreamingKg.runHostGraphAvailableNow(
      spark, s"$base/pages", io, "wg", s"$base/ck_replay"))
    assert(run3 === run2)
    assert(io.read("wg/host_counts").count() === rowsBefore)

    // compaction folds the partials without changing the graph, and keeps
    // replayed OLD batch ids skippable (compacted_ids), so a post-compaction
    // wiped-checkpoint replay still appends nothing
    val folded = StreamingKg.compactHostCounts(io, "wg")
    assert(folded < rowsBefore)
    assert(hg(StreamingKg.hostGraphFromStore(io, "wg")) === run2)
    val run4 = hg(StreamingKg.runHostGraphAvailableNow(
      spark, s"$base/pages", io, "wg", s"$base/ck_replay2"))
    assert(run4 === run2)
    assert(io.read("wg/host_counts").count() === folded)
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
