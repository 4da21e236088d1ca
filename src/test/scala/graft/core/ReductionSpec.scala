package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Transitive reduction: shortcut removal, closure∘reduction identities,
  * DAG-only contract. */
class ReductionSpec extends SparkSpec {
  import spark.implicits._

  private def red(es: (String, String)*): Set[(String, String)] =
    Entailment.transitiveReduction(es.toSeq.toDF("src", "dst")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("shortcut edge removed; diamond untouched") {
    assert(red(("a", "b"), ("b", "c"), ("a", "c")) ===
      Set(("a", "b"), ("b", "c")))
    assert(red(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")) ===
      Set(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")))
  }

  test("reduction of a chain's full closure recovers exactly the chain") {
    val chain = (0 until 30).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val closed = Entailment.transitiveClosure(chain.toDF("src", "dst"))
    val got = Entailment.transitiveReduction(closed).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === chain.toSet)
  }

  test("reduction(closure(x)) = reduction(x) on a seeded random DAG") {
    val rnd = new scala.util.Random(5)
    // DAG by construction: edges only i → j with i < j
    val es = (0 until 120).map { _ =>
      val i = rnd.nextInt(25); val j = rnd.nextInt(25)
      (math.min(i, j), math.max(i, j))
    }.filter(p => p._1 != p._2).distinct
      .map(p => (f"v${p._1}%02d", f"v${p._2}%02d"))
    val direct = red(es: _*)
    val viaClosure = Entailment.transitiveReduction(
      Entailment.transitiveClosure(es.toDF("src", "dst"))).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(direct === viaClosure)
    // and closing the reduction gives back the closure of the input
    val c1 = Entailment.transitiveClosure(es.toDF("src", "dst")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val c2 = Entailment.transitiveClosure(direct.toSeq.toDF("src", "dst"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(c1 === c2)
  }

  test("cycle raises — condense first") {
    intercept[IllegalStateException](red(("a", "b"), ("b", "a")))
  }
}
