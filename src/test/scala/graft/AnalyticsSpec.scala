package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

class AnalyticsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L, "click", 5.0),
    (2L, ts("2024-01-01 11:30:00"), 100L, "view", 10.0),
    (3L, ts("2024-01-02 09:00:00"), 200L, "click", 20.0),
    (4L, ts("2024-01-02 23:59:59"), 300L, "purchase", 40.0),
    (5L, ts("2024-01-08 00:00:00"), 200L, "click", 2.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("dailyCounts: per-day count and sum") {
    val got = Analytics.dailyCounts(events).orderBy("day")
      .as[(java.sql.Date, Long, Double)].collect()
    assert(got === Array(
      (java.sql.Date.valueOf("2024-01-01"), 2L, 15.0),
      (java.sql.Date.valueOf("2024-01-02"), 2L, 60.0),
      (java.sql.Date.valueOf("2024-01-08"), 1L, 2.0)))
  }

  test("distributionWithPct: counts and global percentages") {
    val got = Analytics.distributionWithPct(events, "event_type")
      .orderBy("event_type").as[(String, Long, Double)].collect()
    assert(got === Array(("click", 3L, 60.0), ("purchase", 1L, 20.0), ("view", 1L, 20.0)))
  }

  test("distributionWithPct: drops null and empty keys") {
    val df = Seq(Some("a"), Some("a"), None, Some("")).toDF("k")
    val got = Analytics.distributionWithPct(df, "k").as[(String, Long, Double)].collect()
    assert(got === Array(("a", 2L, 100.0)))
  }

  test("groupedStats: count/sum/avg per derived key") {
    val got = Analytics.groupedStats(events, pmod(col("user_id"), lit(100L)), "g", "value")
      .orderBy("g").as[(Long, Long, Double, Double)].collect()
    assert(got === Array((0L, 5L, 77.0, 15.4)))
  }

  test("timeBucketStats: weekly buckets with distinct ids") {
    val got = Analytics.timeBucketStats(events, "week")
      .orderBy("week").as[(java.sql.Date, Long, Double, Double, Long)].collect()
    // 2024-01-01 is a Monday: first four rows in week of Jan 1, last in week of Jan 8.
    assert(got === Array(
      (java.sql.Date.valueOf("2024-01-01"), 4L, 75.0, 18.75, 3L),
      (java.sql.Date.valueOf("2024-01-08"), 1L, 2.0, 2.0, 1L)))
  }

  test("rolling7d: rolling mean over the daily series") {
    val got = Analytics.rolling7d(events).orderBy("day")
      .as[(java.sql.Date, Long, Double)].collect()
    assert(got.map(_._2).toSeq === Seq(2L, 2L, 1L))
    // 7-ROW window over the 3-day series: [2], [2,2], [2,2,1]
    assert(got.map(_._3).toSeq === Seq(2.0, 2.0, 5.0 / 3))
  }

  test("topNByValue: deterministic top-N with threshold") {
    val got = Analytics.topNByValue(events, 2, 5.0)
      .as[(Long, Long, String, Double)].collect()
    assert(got === Array((4L, 300L, "purchase", 40.0), (3L, 200L, "click", 20.0)))
  }

  test("valueBuckets: CASE bucketing") {
    val got = Analytics.valueBuckets(events).orderBy("bucket")
      .as[(String, Long)].collect()
    assert(got === Array(("1-10", 3L), ("11-25", 1L), ("26-50", 1L)))
  }

  test("reportBundle: one grouping-sets pass emits every report section") {
    // props: empty on event 1 (a missing-field hit), JSON elsewhere
    val e = events.withColumn("props",
      when(col("event_id") === 1L, lit(""))
        .otherwise(lit("""{"k":2.0}""")))
    val got = Analytics.reportBundle(e, pmod(col("user_id"), lit(3L)),
        Seq(col("value") * 2 -> "avg_double"))
      .select("section", "key", "event_count", "total_value",
        "missing_props", "avg_double")
      .as[(String, String, Long, Double, Long, Double)].collect()
    val bySection = got.groupBy(_._1)
    // quality: exactly one global row with the missing-field counters
    val quality = bySection("quality")
    assert(quality === Array(("quality", "ALL", 5L, 77.0, 1L, 30.8)))
    // daily: one row per day, counts match dailyCounts semantics
    val daily = bySection("daily").map(r => r._2 -> r._3).toMap
    assert(daily === Map(
      "2024-01-01" -> 2L, "2024-01-02" -> 2L, "2024-01-08" -> 1L))
    // event_type: the distribution section
    val types = bySection("event_type").map(r => r._2 -> r._3).toMap
    assert(types === Map("click" -> 3L, "view" -> 1L, "purchase" -> 1L))
    // region: user_id % 3 cohorts
    val regions = bySection("region").map(r => r._2 -> r._3).toMap
    assert(regions === Map("0" -> 1L, "1" -> 2L, "2" -> 2L))
    // weekly: Jan 1 2024 is a Monday, Jan 8 starts the next ISO week
    val weekly = bySection("weekly").map(r => r._2 -> r._3).toMap
    assert(weekly === Map("2024-01-01" -> 4L, "2024-01-08" -> 1L))
    // nothing beyond the five sections, and the pass is one aggregate:
    assert(got.length === 1 + 3 + 2 + 3 + 3)
    // cross-section conservation: every per-key section partitions the
    // same bounded scan, so each section's counts and value-sums must
    // total the quality row's — a wrong grouping set can't hide
    val (gCount, gSum) = (quality.head._3, quality.head._4)
    for (s <- Seq("daily", "weekly", "event_type", "region")) {
      assert(bySection(s).map(_._3).sum === gCount, s"$s count conservation")
      assert(math.abs(bySection(s).map(_._4).sum - gSum) < 1e-9, s"$s sum conservation")
    }
  }

  test("reportBundle: presence counters ride every row; topN unions the event-row section") {
    // props: empty on event 1, JSON elsewhere → 4 of 5 props present
    val e = events.withColumn("props",
      when(col("event_id") === 1L, lit(""))
        .otherwise(lit("""{"k":2.0}""")))
    val got = Analytics.reportBundle(e, pmod(col("user_id"), lit(3L)),
        Seq(col("value") * 2 -> "avg_double"), topN = 2, topMin = 5.0)
      .select("section", "key", "event_count", "total_value",
        "event_type_present", "props_present", "avg_double")
      .as[(String, String, Long, Double, Long, Long, Double)].collect()
    val bySection = got.groupBy(_._1)
    // presence counters on the global row (the actor_query analogue)
    val quality = bySection("quality").head
    assert((quality._5, quality._6) === ((5L, 4L)),
      "5 event_types present, 4 non-empty props")
    // and on a per-day row (free riders on every grouping set)
    val day1 = bySection("daily").find(_._2 == "2024-01-01").get
    assert((day1._5, day1._6) === ((2L, 1L)))
    // top_events: value >= 5 desc, id-asc tie-break, limit 2 → events 4, 3;
    // per-row measures land in the aggregate columns
    val top = bySection("top_events").sortBy(_._2)
    assert(top.map(r => (r._2, r._3, r._4, r._5, r._6, r._7)).toSeq === Seq(
      ("3", 1L, 20.0, 1L, 1L, 40.0),
      ("4", 1L, 40.0, 1L, 1L, 80.0)))
    // the five aggregate sections are untouched by the union
    assert(bySection("daily").map(_._3).sum === 5L)
  }

  test("topPerGroup: rank-1 row per group with tie-break") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (2L, 12L, 1.0))
      .toDF("g", "id", "v")
    val got = Analytics.topPerGroup(df, "g", "v", "id")
      .orderBy("g").as[(Long, Long, Double)].collect()
    // equal v=5.0: lower id wins (asc tie-break)
    assert(got === Array((1L, 10L, 5.0), (2L, 12L, 1.0)))
  }
}
