package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming first-occurrence dedup: cross-micro-batch state, checkpoint
  * idempotence, and incremental restarts that admit only new keys. */
class StreamDedupSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def keys(dir: String): Set[String] =
    spark.read.parquet(dir).collect().map(_.getString(0)).toSet

  private def md5of(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedup holds across micro-batches, replays, and admits only new keys") {
    val base = java.nio.file.Files.createTempDirectory("sdedup_").toString
    // two staged part files → two micro-batches; "b" duplicates ACROSS them
    val inDir = s"$base/in"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(inDir)
    Seq((3L, "b"), (4L, "c"), (5L, "c")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(inDir)
    val got1 = StreamDedup.firstKeysOnce(s, inDir, s"$base/out", s"$base/ck")
      .collect().map(_.getString(0)).toSet
    assert(got1 === Set("a", "b", "c").map(md5of))

    // replay against the same checkpoint: nothing new appended
    StreamDedup.firstKeysOnce(s, inDir, s"$base/out", s"$base/ck")
    assert(keys(s"$base/out") === Set("a", "b", "c").map(md5of))

    // incremental file: one already-seen key, one new key → only "d" lands
    Seq((6L, "a"), (7L, "d")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(inDir)
    StreamDedup.firstKeysOnce(s, inDir, s"$base/out", s"$base/ck")
    assert(keys(s"$base/out") === Set("a", "b", "c", "d").map(md5of))
  }
}
