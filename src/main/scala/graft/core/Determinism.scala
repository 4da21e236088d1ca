package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded, data-keyed pseudo-randomness (SURVEY §4.3 "seeded randomness").
  *
  * Every random draw in the engine is a pure function of (data key, seed) —
  * never of partition id, task attempt, or `rand()` without seed keyed by
  * row order. This is what makes outputs byte-identical at local[8] vs
  * local[32] and across resumes, which the north rule requires.
  *
  * Two families:
  *  - [[detHash]] — xxhash64 over the key columns + seed; full 64-bit
  *    dispersion; used internally by samplers / MinHash / salting.
  *  - [[lcg]] — a Lehmer-style multiplicative congruential generator over a
  *    numeric key. Deliberately expressible in portable SQL (no xxhash64 in
  *    DuckDB), so operators whose "random" order must be verified by the
  *    external oracle use this family. Period/quality are adequate for
  *    sampling orders (it is a bijection on [0, M)).
  */
object Determinism {

  /** 64-bit deterministic hash of the given key columns under a seed. */
  def detHash(seed: Long, keys: Column*): Column =
    xxhash64((lit(seed) +: keys): _*)

  /** Uniform double in [0,1) derived from key columns + seed. */
  def detRand(seed: Long, keys: Column*): Column =
    (pmod(detHash(seed, keys: _*), lit(1000000007L)).cast("double")) / lit(1000000007.0)

  /** Geometric(p) sample (support 1,2,...) from a deterministic uniform:
    * floor(log(1-u)/log(1-p)) + 1 — used by ForestFire burn counts
    * (reference classic_samplers.py:379 np.random.geometric). */
  def detGeometric(p: Double, seed: Long, keys: Column*): Column =
    (floor(log(lit(1.0) - detRand(seed, keys: _*)) / math.log(1.0 - p)) + 1).cast("int")

  /** LCG parameters (Park–Miller-ish; fits in int64 without overflow for
    * keys < ~8e9): ord(k) = (k * A + seed) mod M. */
  val LcgA = 1103515245L
  val LcgM = 2147483647L

  def lcg(key: Column, seed: Long): Column =
    pmod(pmod(key.cast("long"), lit(LcgM)) * lit(LcgA) + lit(seed), lit(LcgM))

  /** DuckDB mirror of [[lcg]] for oracle queries (pre-mod keeps the
    * multiply inside int64 for any key). */
  def lcgDuck(keyExpr: String, seed: Long): String = {
    val k = s"((CAST($keyExpr AS BIGINT) % $LcgM + $LcgM) % $LcgM)"
    s"(($k * $LcgA + $seed) % $LcgM + $LcgM) % $LcgM"
  }

  /** Portable 48-bit integer from a STRING key: the first 12 hex chars of
    * md5 read base-16 — the draw family Node2Vec established for keys that
    * aren't numeric (md5 hex strings are byte-identical in Spark and
    * DuckDB; [[lcg]] covers numeric keys). */
  def md5Int(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 12), 16, 10).cast("long")

  /** DuckDB mirror of [[md5Int]]: positional hex-digit sum over
    * md5($keyExpr) (DuckDB has no base-16 conv). */
  def md5IntDuck(keyExpr: String): String = {
    val h = s"md5($keyExpr)"
    (1 to 12).map(i =>
      s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1) * CAST(${math.pow(16, 12 - i).toLong} AS BIGINT)")
      .mkString("(", " + ", ")")
  }
}
