package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Ingest
import graft.sources.Tables

class IngestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("eventsWindowed: scan-typed window equals the post-normalization filter AND pushes down") {
    val d = "/root/testdata/sf0.001"
    val windowed = Tables.eventsWindowed(spark, d, "2024-01-10", "2024-01-17")
    val want = Tables.events(spark, d)
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
              col("ts") < lit("2024-01-17").cast("timestamp"))
    assert(windowed.count() === want.count())
    assert(windowed.agg(round(sum("value"), 2)).as[Double].collect()
      === want.agg(round(sum("value"), 2)).as[Double].collect())
    // the whole point: both bounds reach the parquet scan as long predicates
    val scan = windowed.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ts,") && scan.contains("LessThan(ts,"),
      s"window bounds not pushed to scan:\n$scan")
  }

  test("typedEvents: date/derived-time casts, floor-int value, JSON prop") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-03-05 17:30:00"), 10L, "click", 12.9, """{"k": 7}"""),
      (2L, Timestamp.valueOf("2024-11-30 00:00:01"), 11L, "view", -0.5, """{"x": 1}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Ingest.typedEvents(df).orderBy("event_id")
      .as[(Long, java.sql.Date, Int, Int, Int, Option[Int], String)].collect()
    assert(got(0) === ((1L, java.sql.Date.valueOf("2024-03-05"), 2024, 3, 12, Some(7), "click")))
    // floor(-0.5) = -1 (truncation-toward-zero would give 0); missing key → null
    assert(got(1) === ((2L, java.sql.Date.valueOf("2024-11-30"), 2024, 11, -1, None, "view")))
  }

  test("epochSecondsToTimestamp: seconds → timestamp, null-preserving") {
    val df = Seq(Some(1704067200L), None).toDF("epoch")
    val got = Ingest.epochSecondsToTimestamp(df, "epoch", "event_ts")
      .select("event_ts").as[Option[Timestamp]].collect()
    assert(got(0) === Some(Timestamp.valueOf("2024-01-01 00:00:00")))
    assert(got(1) === None)
  }
}
