package graft

/** Driver-contract smoke: entry() yields rows; every declared query runs
  * on sf0.001 and every oracle key has a matching query. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query is oracle-checked — zero rows-only keys") {
    // the README/SURVEY claim: the driver gate hash-compares EVERY key.
    // A new query without an oracle silently downgrades to a weaker
    // rows-only check; fail here instead.
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"query without oracle: $unchecked")
  }

  test("reference and training query names never collide") {
    // SparkEntry merges the two maps with ++ — a duplicate key would
    // silently shadow the reference query
    val dup = graft.queries.ReferenceQueries.queries.keySet
      .intersect(graft.queries.TrainingQueries.queries.keySet)
    assert(dup.isEmpty, s"colliding query names: $dup")
  }

  test("all queries execute and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }
}
