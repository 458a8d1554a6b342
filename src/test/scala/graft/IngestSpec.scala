package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ingest

class IngestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

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
