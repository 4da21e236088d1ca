package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The JVM mirrors of the xxhash64 draw family must be BYTE-EXACT vs the
  * in-plan columns: the walk loop partitions its frontier and pre-computes
  * teleport landing ranks on the driver with them, so a single mismatched
  * bit silently changes sampler outputs (or, worse, makes an isin pruning
  * filter drop a legitimate join row). Fuzz the parity over longs (both
  * signs, extremes) and strings (empty, unicode, long). */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private val longKeys: Seq[Long] =
    Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L) ++
      (1 to 200).map(i => i * 2654435761L - 1000)
  private val strKeys: Seq[String] =
    Seq("", "a", "node_1", "ü-ünïcode-☃", "x" * 500) ++
      (1 to 200).map(i => s"ent_${i}_${"ab" * (i % 9)}")
  private val seeds = Seq(0L, 42L, -7L, 1234567890123L)

  test("detHashJvm/detRandJvm match the SQL columns for LONG keys") {
    val df = longKeys.toDF("k")
    for (seed <- seeds) {
      val got = df.select(col("k"),
        Determinism.detHash(seed, col("k")).as("h"),
        Determinism.detRand(seed, col("k")).as("r")).collect()
      got.foreach { r =>
        val k = r.getLong(0)
        assert(r.getLong(1) === Determinism.detHashJvm(seed, k), s"detHash($seed, $k)")
        assert(r.getDouble(2) === Determinism.detRandJvm(seed, k), s"detRand($seed, $k)")
      }
    }
  }

  test("detHashJvm matches the SQL column for STRING keys") {
    val df = strKeys.toDF("k")
    for (seed <- seeds) {
      val got = df.select(col("k"), Determinism.detHash(seed, col("k")).as("h")).collect()
      got.foreach { r =>
        assert(r.getLong(1) === Determinism.detHashJvm(seed, r.getString(0)),
          s"detHash($seed, '${r.getString(0).take(20)}')")
      }
    }
  }

  test("xxhashJvm matches bare xxhash64 for STRING keys (bucket formula)") {
    val got = strKeys.toDF("k")
      .select(col("k"), xxhash64(col("k")).as("h")).collect()
    got.foreach { r =>
      assert(r.getLong(1) === Determinism.xxhashJvm(r.getString(0)))
    }
    // and the full bucket expression pmod(xxhash64(k), B)
    val b = strKeys.toDF("k")
      .select(col("k"), pmod(xxhash64(col("k")), lit(16)).cast("int").as("b")).collect()
    b.foreach { r =>
      assert(r.getInt(1) === Determinism.pmodJvm(Determinism.xxhashJvm(r.getString(0)), 16).toInt)
    }
  }
}
