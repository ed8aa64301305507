package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canary against harness testdata regeneration (VERDICT r7 #2).
  *
  * Round 7 lost 22 of 70 oracle queries and 30 tests because the harness
  * regenerated `/root/testdata` with a different physical encoding for
  * `events.ts` and the loader supported exactly one case. This spec pins the
  * NORMALIZED schema every `Tables` loader must yield, so the next
  * regeneration costs one red test that names the drifted column instead of
  * 31% of the query surface dying with cryptic analysis errors.
  *
  * Expectations are the LOADER-OUTPUT contract (what every query downstream
  * assumes), not the raw file encoding — the loader is allowed to adapt to
  * new physical encodings (see Tables.events) as long as the normalized
  * shape holds.
  */
class TestdataDriftSpec extends SparkSpec {

  /** table name -> loader-output (column -> expected type). */
  private val contract: Map[String, Map[String, DataType]] = Map(
    "region"   -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
                      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
                      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
                      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part"     -> Map("p_partkey" -> LongType, "p_name" -> StringType,
                      "p_brand" -> StringType, "p_type" -> StringType,
                      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders"   -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
                      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
                      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
                      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
                      "l_shipdate" -> TimestampNTZType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
                       "lang" -> StringType, "source" -> StringType,
                       "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType, containsNull = true),
                        "label" -> IntegerType),
    // Loader-normalized: whatever the file ships, events() must yield a
    // zoned TimestampType (the downstream contract for every events query).
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
                    "user_id" -> LongType, "event_type" -> StringType,
                    "value" -> DoubleType, "props" -> StringType)
  )

  private def loaderFor(name: String) = name match {
    case "events" => Tables.events(spark, sf0001)
    case other    => Tables.table(spark, sf0001, other)
  }

  for ((name, cols) <- contract.toSeq.sortBy(_._1)) {
    test(s"testdata drift canary: $name") {
      val schema = loaderFor(name).schema
      val drifted = cols.toSeq.sortBy(_._1).flatMap { case (colName, expected) =>
        schema.fields.find(_.name == colName) match {
          case None =>
            Some(s"$name.$colName: MISSING (expected $expected)")
          case Some(f) if f.dataType != expected =>
            Some(s"$name.$colName: DRIFTED to ${f.dataType} (expected $expected)")
          case _ => None
        }
      }
      assert(drifted.isEmpty,
        s"\nTESTDATA DRIFT DETECTED — the harness regenerated /root/testdata with a " +
        s"new encoding. Update the adaptive loader in sources/Tables.scala " +
        s"(and this contract) for:\n  ${drifted.mkString("\n  ")}")
    }
  }

  test("events loader normalizes every supported physical encoding of ts") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("drift-events").toString

    // TIMESTAMP_NTZ (the current harness encoding): loader must cast to
    // TimestampType with the UTC wall clock preserved as the instant.
    val ntzDir = s"$tmp/ntz"
    spark.sql(
      "SELECT 1L AS event_id, TIMESTAMP_NTZ'2026-01-02 03:04:05.123456' AS ts, " +
      "7L AS user_id, 'view' AS event_type, 1.5 AS value, '{}' AS props")
      .write.parquet(s"$ntzDir/events.parquet")
    val ntz = Tables.events(spark, ntzDir)
    assert(ntz.schema("ts").dataType == TimestampType)
    val got = ntz.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].head()
    assert(got == "2026-01-02 03:04:05.123456")

    // TimestampType: passthrough, value untouched.
    val tzDir = s"$tmp/tz"
    spark.sql(
      "SELECT 1L AS event_id, TIMESTAMP'2026-01-02 03:04:05.123456' AS ts, " +
      "7L AS user_id, 'view' AS event_type, 1.5 AS value, '{}' AS props")
      .write.parquet(s"$tzDir/events.parquet")
    val tz = Tables.events(spark, tzDir)
    assert(tz.schema("ts").dataType == TimestampType)
    assert(tz.select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].head()
      == "2026-01-02 03:04:05.123456")

    // Raw INT64 (what TIMESTAMP(NANOS) reads as under the legacy conf):
    // loader rebuilds micros from nanos.
    val nanosDir = s"$tmp/nanos"
    Seq((1L, 1767323045123456789L, 7L, "view", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$nanosDir/events.parquet")
    val nanos = Tables.events(spark, nanosDir)
    assert(nanos.schema("ts").dataType == TimestampType)
    assert(nanos.select(unix_micros($"ts")).as[Long].head() == 1767323045123456L)
  }

  test("events loader fails loudly (naming the type) on an unknown ts encoding") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("drift-mutated").toString
    Seq((1L, "2026-01-02T03:04:05Z", 7L, "view", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, tmp) }
    assert(e.getMessage.contains("StringType"))
    assert(e.getMessage.contains("Tables.events"))
  }
}
