package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{ForeignKeys, VersionedTable}

object SemiDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("semidbg").toString
    val fact = base + "/fact"; val dim = base + "/dim"
    VersionedTable.write((1L to 100L).map(i => (i, i % 10, i)).toDF("id", "fk", "v"), fact, statsCols = Seq("id"))
    VersionedTable.write((0L to 9L).map(k => (k, "g" + k % 3)).toDF("pk", "g"), dim, statsCols = Seq("pk"))
    ForeignKeys.declare(spark, fact, Seq("fk"), dim, Seq("pk"))
    val q = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, dim).select(col("pk")),
        col("fk") === col("pk"), "left_semi")
    println("=== analyzed ===")
    println(q.queryExecution.analyzed)
    println("=== optimized ===")
    println(q.queryExecution.optimizedPlan)
    // manual probe of the rule
    val rule = graft.sql.GraftJoinElimination(spark)
    println("=== rule on analyzed ===")
    println(rule(q.queryExecution.analyzed))
    spark.stop()
  }
}
