package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.creatorops.{Bronze, Fixtures, Gold, Silver}

/** ScalaCheck properties over the pipeline invariants (SURVEY.md §5):
  * generated random inputs, structural guarantees that must hold for ALL of
  * them — complementing the example-based specs.
  */
class PropertySpec extends SparkSpec {

  /** deterministic-enough sampling from a ScalaCheck Gen (plain scalacheck,
    * no scalatestplus bridge in the offline dep set) */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val eventTypeGen = Gen.oneOf(
    graft.creatorops.EventSchema.EventTypes ++ Seq("bogus", "nope"))
  private val versionGen = Gen.chooseNum(-1, 3)
  private val scoreGen = Gen.chooseNum(-50.0, 150.0)

  private val eventGen: Gen[String] = for {
    id <- Gen.alphaNumStr.map(s => "E" + s.take(8))
    t <- eventTypeGen
    v <- versionGen
    score <- scoreGen
  } yield Fixtures.valid(id = id, eventType = t, version = v,
    metrics = f"""{"engagementScore": "$score%.2f"}""")

  test("property: good ∪ rejects partitions every bronze row, for any input") {
    samples(Gen.listOfN(30, eventGen), 5).filter(_.nonEmpty).foreach { lines =>
      {
        val bronze = Bronze.ingest(spark, Seq(Fixtures.writeNdjson(lines)))
        val r = Silver.transform(bronze, dedupe = false)
        assert(r.events.count() + r.rejects.count() == lines.size.toLong)
      }
    }
  }

  test("property: dropoff_rate always in [0,1] and consistent with counts") {
    samples(Gen.listOfN(40, eventGen), 5).filter(_.nonEmpty).foreach { lines =>
      {
        val silver = Silver.transform(
          Bronze.ingest(spark, Seq(Fixtures.writeNdjson(lines)))).events
        val rows = Gold.dropoffRate(silver, asOf = lit("2026-02-01").cast("date"))
          .select("dropoff_rate", "dropoff_events", "total_events").collect()
        rows.foreach { r =>
          val rate = r.getDouble(0)
          assert(rate >= 0.0 && rate <= 1.0)
          assert(r.getLong(2) == 0L || rate == r.getLong(1).toDouble / r.getLong(2))
        }
      }
    }
  }

  test("property: band10 output is always null or a multiple of 10 in [0,100]") {
    samples(Gen.nonEmptyListOf(Gen.option(Gen.chooseNum(-1e6, 1e6))), 10).foreach { xs =>
      {
        import spark.implicits._
        val got = xs.toDF("s").select(Gold.band10(col("s"))).collect()
          .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
        got.zip(xs).foreach {
          case (None, x) => assert(x.isEmpty)
          case (Some(b), _) =>
            assert(b >= 0.0 && b <= 100.0 && b % 10.0 == 0.0)
        }
      }
    }
  }

  test("property: copy-on-write upsert ≡ full merge, for any clustering and update set") {
    import graft.sources.VersionedTable
    // random base layouts (clustered and not, with and without stats) ×
    // random update key sets (inside / outside / straddling file bounds):
    // the file-granular merge must be value-identical to the naive
    // anti-join ∪ updates merge in every case
    val layoutGen = Gen.oneOf("range", "random", "nostats")
    val caseGen = for {
      layout <- layoutGen
      lo <- Gen.chooseNum(0, 900)
      span <- Gen.chooseNum(1, 150)
      outside <- Gen.chooseNum(0, 5) // extra pure-insert keys
    } yield (layout, lo, span, outside)
    samples(caseGen, 6).foreach { case (layout, lo, span, outside) =>
      val path = java.nio.file.Files.createTempDirectory("cowprop").toString + "/t"
      val base = spark.range(0, 1000).select(
        col("id"), concat(lit("v"), col("id")).as("v"))
      layout match {
        case "range" =>
          VersionedTable.write(base.repartitionByRange(5, col("id")), path, Seq("id"))
        case "random" =>
          VersionedTable.write(base.repartition(5), path, Seq("id"))
        case "nostats" =>
          VersionedTable.write(base.repartition(5), path, Nil)
      }
      val updates = spark.range(lo, lo + span)
        .unionAll(spark.range(2000, 2000 + outside))
        .select(col("id"), lit("UP").as("v"))
      VersionedTable.upsert(updates, path, Seq("id"))
      val got = VersionedTable.read(spark, path)
      val want = base.join(updates.select("id"), Seq("id"), "left_anti").unionByName(updates)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"layout=$layout lo=$lo span=$span outside=$outside")
    }
  }

  test("property: DELETE ≡ filter, for any predicate band and layout") {
    import graft.sources.VersionedTable
    val caseGen = for {
      clustered <- Gen.oneOf(true, false)
      lo <- Gen.chooseNum(-100, 1000)
      span <- Gen.chooseNum(1, 300)
    } yield (clustered, lo, span)
    samples(caseGen, 5).foreach { case (clustered, lo, span) =>
      val path = java.nio.file.Files.createTempDirectory("delprop").toString + "/t"
      val base = spark.range(0, 1000).select(
        col("id"), concat(lit("v"), col("id")).as("v"))
      VersionedTable.write(
        if (clustered) base.repartitionByRange(5, col("id")) else base.repartition(5),
        path, Seq("id"))
      val pred = col("id").between(lo, lo + span)
      VersionedTable.delete(spark, path, pred)
      val got = VersionedTable.read(spark, path)
      val want = base.filter(!pred)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"clustered=$clustered lo=$lo span=$span")
    }
  }

  test("property: dedupe is idempotent and keeps exactly one row per event_id") {
    samples(Gen.chooseNum(1, 4), 3).foreach { copies =>
      val lines = (1 to copies).flatMap(_ =>
        Seq(Fixtures.valid(id = "A"), Fixtures.valid(id = "B")))
      val bronze = Bronze.ingest(spark, Seq(Fixtures.writeNdjson(lines)))
      val once = Silver.transform(bronze).events
      assert(once.select("event_id").distinct().count() == once.count())
      assert(once.count() == 2L)
    }
  }
}
