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
