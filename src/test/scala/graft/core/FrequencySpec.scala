package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-pass exact heavy hitters: the whole point is that the Misra–Gries
  * candidate pass may THROW AWAY most of the key space per partition and
  * the output must still be exactly {keys : count·k > n} for ANY
  * partitioning — so every case here runs with k far below the number of
  * distinct keys (the decrement path is binding) and re-checks against a
  * naive exact groupBy. */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[String], k: Int): Map[String, Long] = {
    val n = rows.size
    rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  private def engine(rows: Seq[String], k: Int, parts: Int): Map[String, Long] =
    Frequency.heavyHitters(rows.toDF("tok").repartition(parts), "tok", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("heavyHitters: exact on a skewed stream with k=3 (MG decrements binding)") {
    // 60×a, 25×b, rest a long tail of singletons — k=3 keeps ≤2 counters
    val rows = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++ (1 to 35).map(i => s"t$i")
    val expected = naive(rows, 3)
    assert(expected === Map("a" -> 60L)) // n=120, n/3=40: only 'a' qualifies
    for (parts <- Seq(1, 3, 16)) assert(engine(rows, 3, parts) === expected, s"parts=$parts")
  }

  test("heavyHitters: threshold is strict (count·k > n, not ≥)") {
    val rows = Seq.fill(25)("x") ++ (1 to 75).map(i => s"t$i") // x: 25 = n/4 exactly
    assert(engine(rows, 4, 5) === Map.empty)
    val rows2 = Seq.fill(26)("x") ++ (1 to 74).map(i => s"t$i")
    assert(engine(rows2, 4, 5) === Map("x" -> 26L))
  }

  test("heavyHitters: adversarial layout — a heavy key scattered thin") {
    // 'h' is heavy globally (40/100) but each partition sees it mixed with
    // the tail, exercising the per-partition superset guarantee
    val rows = new scala.util.Random(7)
      .shuffle(Seq.fill(40)("h") ++ (1 to 60).map(i => s"t$i"))
    val expected = naive(rows, 5)
    assert(expected.keySet === Set("h"))
    for (parts <- Seq(2, 7, 32)) assert(engine(rows, 5, parts) === expected)
  }

  test("heavyHitters: empty result and null keys excluded") {
    val uniform = (1 to 50).map(i => s"u$i")
    assert(engine(uniform, 10, 4) === Map.empty)
    val withNulls = (Seq.fill(30)(Some("a")) ++ Seq.fill(20)(Option.empty[String]))
      .toDF("tok")
    val got = Frequency.heavyHitters(withNulls, "tok", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 30L)) // nulls neither counted nor reported
  }

  test("freqSpectrum: frequency-of-frequencies exact, nulls excluded") {
    val rows = (Seq.fill(5)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c") ++
      Seq("d", "e", "f")).map(Option(_)) ++ Seq.fill(4)(Option.empty[String])
    val got = Frequency.freqSpectrum(rows.toDF("tok").repartition(3), "tok")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(5L -> 2L, 2L -> 1L, 1L -> 3L))
  }
}
