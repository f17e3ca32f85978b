package graft

/** Driver-gate smoke: every registered query runs at sf0.001, returns the
  * columns its oracle (if any) will be compared on, and non-pair queries
  * return rows. Catches a broken queries/oracle wiring inside `sbt test`
  * instead of at the driver's Verify run.
  */
class QueriesSmokeSpec extends SparkSpec {

  // pair/threshold queries may legitimately be empty at the smallest SF
  private val mayBeEmpty = Set(
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding_exact", "dedup_embedding_lsh")

  test("every oracled query name exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf())
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names: ${df.columns.mkString(",")}")
    }
  }

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
