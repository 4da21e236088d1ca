package graft

import graft.pipeline.{KgPipeline, Lineage}
import java.nio.file.Files

/** The spark-submit entry point: end-to-end run into a store, idempotent
  * replay (a second full run appends nothing), and per-stage resume (a
  * re-run against the same checkpoint dir recomputes no stage). */
class RunKgSpec extends SparkSpec {

  private lazy val s = spark
  private val data = "/root/testdata/sf0.001"

  private def capture(args: Array[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos)) { RunKg.main(args) }
    bos.toString("UTF-8").linesIterator.toSeq.last
  }

  test("full run lands the pipeline's triples; replay and resume are no-ops") {
    val store = Files.createTempDirectory("runkg_store_").toString
    val ck1 = Files.createTempDirectory("runkg_ck1_").toString

    val json1 = capture(Array(data, store, ck1))
    val expected = KgPipeline.run(s, data, ck1).count() // triples stage is distinct
    assert(json1.contains(s""""store_edges": $expected"""))
    assert(json1.contains(s""""new_edges": $expected"""))
    assert(json1.contains(""""pages": """) && json1.contains(""""triples": """))

    // replay: the SAME segment through a FRESH checkpoint dir (crash replay
    // / duplicate submission) — exactly-once store semantics, zero appends
    val ck2 = Files.createTempDirectory("runkg_ck2_").toString
    val json2 = capture(Array(data, store, ck2))
    assert(json2.contains(""""new_edges": 0""") && json2.contains(""""new_nodes": 0"""))
    assert(json2.contains(s""""store_edges": $expected"""))

    // resume: re-run against ck1 — every stage marker is already set, so no
    // stage recomputes and no lineage rows are appended
    val before = Lineage.read(s, ck1).count()
    capture(Array(data, store, ck1))
    assert(Lineage.read(s, ck1).count() === before)
  }

  test("argument validation") {
    intercept[IllegalArgumentException] { RunKg.main(Array("one", "two")) }
  }
}
