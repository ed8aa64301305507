package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory survives on tmpfs — clear both
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val dir = new java.io.File(s"/dev/shm/graft-warehouse/$name")
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("co-bucketed tables join with zero exchanges") {
    dropTable("b_orders")
    dropTable("b_lineitem")
    val orders = Tables.orders(spark, sf0001)
    val lineitem = Tables.lineitem(spark, sf0001)
    TableIO.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8,
      sortCols = Seq("o_orderkey"))
    TableIO.writeBucketed(lineitem, "b_lineitem", Seq("l_orderkey"), 8,
      sortCols = Seq("l_orderkey"))

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"join sides should be exchange-free (bucketed):\n$plan")

    // and the result matches the unbucketed plan
    val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
