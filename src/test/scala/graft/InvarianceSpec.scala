package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** North-rule per-row invariant: operator outputs are identical at any
  * input partitioning (the sandbox stand-in for "identical on any cluster
  * size"). Exercises the round-2 operators end-to-end. */
class InvarianceSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def docs = {
    import spark.implicits._
    (0 until 120).map { i =>
      (i.toLong, s"document $i with shared template text body segment ${i % 7} and suffix ${i % 3}")
    }.toDF("doc_id", "text")
  }

  test("winnow / minhashLsh / sessionize / ivf invariant to partitioning") {
    val d1 = docs.repartition(13)
    val d2 = docs.coalesce(1)
    assert(canon(graft.text.TextOps.winnow(d1)) === canon(graft.text.TextOps.winnow(d2)))
    assert(canon(graft.dedup.Dedup.minhashLsh(d1, 0.8)) ===
      canon(graft.dedup.Dedup.minhashLsh(d2, 0.8)))

    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val events = (0 until 300).map { i =>
      (i.toLong, new java.sql.Timestamp(base.getTime + (i * 7919L % 9000) * 60000L),
        (i % 9).toLong, "e", (i % 13) * 0.25, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(canon(graft.streaming.Sessions.sessionize(events.repartition(11), 30)) ===
      canon(graft.streaming.Sessions.sessionize(events.coalesce(1), 30)))

    val vecs = (0 until 80).map { i =>
      (i.toLong, (0 until 16).map(d => math.cos(i * 13 + d * 3).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    assert(canon(graft.sim.Ann.ivfTopK(vecs.repartition(9), 0L to 4L, 3)) ===
      canon(graft.sim.Ann.ivfTopK(vecs.coalesce(1), 0L to 4L, 3)))
  }
}
