package graft

/** Every declared query must run end-to-end at sf0.001 and agree with its
  * declared oracle key set (the value-level check is the driver's DuckDB
  * gate; this spec catches runtime regressions early). */
class QueriesSmokeSpec extends SparkSpec {

  test("every oracle refers to a declared query; every query has an oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set.empty[String])
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with a stable non-empty schema") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
      spark.catalog.clearCache()
    }
  }
}
