package graft

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * oracle key must have a query (the gate compares them pairwise). */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val q = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(q)
    assert(missing.isEmpty, s"oracles without queries: $missing")
    assert(q.size >= 55)
  }
}
