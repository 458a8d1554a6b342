package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

class QualitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world", "en"),
    (2L, "", "en"),
    (3L, null.asInstanceOf[String], ""),
    (4L, "bonjour", null.asInstanceOf[String])
  ).toDF("id", "text", "lang")

  test("completenessProfile: null/empty per column in one pass") {
    val got = Quality.completenessProfile(docs, Seq("text", "lang"))
      .orderBy("column_name")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got === Array(
      ("lang", 1L, 1L, 2L, 50.0),
      ("text", 1L, 1L, 2L, 50.0)))
  }

  test("rangeValidation: bounds, nulls, min/max") {
    val df = Seq(Some(-5.0), Some(0.0), Some(10.0), Some(99.0), None).toDF("v")
    val got = Quality.rangeValidation(df, "v", 0.0, 50.0)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(got === Array((5L, 1L, 1L, 4L, -5.0, 99.0)))
  }

  test("domainValidation: expected-set flag + dominance alert") {
    val df = (Seq.fill(9)("a") ++ Seq("weird")).toDF("k")
    val got = Quality.domainValidation(df, "k", Seq("a", "b"))
      .orderBy("k").as[(String, Long, Int, Double, Int)].collect()
    assert(got === Array(
      ("a", 9L, 1, 90.0, 1),      // 90% > 80% → dominant
      ("weird", 1L, 0, 10.0, 0))) // unexpected category flagged 0
  }

  test("duplicateGroups: only multiplicity>1 groups survive") {
    val df = Seq(("u1", "click"), ("u1", "click"), ("u2", "view")).toDF("u", "t")
    val got = Quality.duplicateGroups(df, Seq("u", "t"))
      .as[(String, String, Long)].collect()
    assert(got === Array(("u1", "click", 2L)))
  }

  test("presenceCounts: conditional non-null-non-empty counters") {
    val got = Quality.presenceCounts(docs, Seq("text", "lang"))
      .as[(Long, Long, Long)].collect()
    assert(got === Array((2L, 2L, 4L)))
  }

  test("valueValidation: single-pass distribution sanity stats") {
    val df = Seq(-1.0, 0.0, 5.0, 20.0, 60.0, 2000.0).toDF("v")
    val r = Quality.valueValidation(df, "v").collect()(0)
    assert(r.getAs[Long]("total_records") === 6L)
    assert(r.getAs[Long]("negative_count") === 1L)
    assert(r.getAs[Long]("extreme_count") === 1L)
    assert(r.getAs[Long]("zero_count") === 1L)
    assert(r.getAs[Long]("low_count") === 1L)
    assert(r.getAs[Long]("moderate_count") === 1L)
    assert(r.getAs[Long]("high_count") === 2L)
    assert(r.getAs[Double]("min_value") === -1.0)
    assert(r.getAs[Double]("max_value") === 2000.0)
  }

  test("schemaValidation: ok / type_mismatch / missing from pure schema") {
    val got = Quality.schemaValidation(docs,
      Seq("id" -> "bigint", "text" -> "string", "lang" -> "int", "ghost" -> "double"))
      .as[(String, String, String, String)].collect()
    assert(got === Array(
      ("id", "bigint", "bigint", "ok"),
      ("text", "string", "string", "ok"),
      ("lang", "int", "string", "type_mismatch"),
      ("ghost", "double", "", "missing")))
  }

  test("quarantine: rule tags, valid/invalid split, stats rollup") {
    import org.apache.spark.sql.functions._
    val rules = Seq(
      "no_text" -> (col("text").isNotNull && col("text") =!= ""),
      "no_lang" -> (col("lang").isNotNull && col("lang") =!= ""))
    val tagged = Quality.quarantine(docs, rules)
    val byId = tagged.select("id", "violations").as[(Long, Seq[String])].collect().toMap
    assert(byId(1L) === Seq())
    assert(byId(2L) === Seq("no_text"))
    assert(byId(3L) === Seq("no_text", "no_lang"))
    assert(byId(4L) === Seq("no_lang"))
    assert(Quality.validRows(tagged).columns.toSeq === docs.columns.toSeq)
    assert(Quality.validRows(tagged).count() === 1)
    assert(Quality.invalidRows(tagged).count() === 3)
    val stats = Quality.quarantineStats(docs, rules)
      .as[(Long, Long, Long, Long)].collect().head
    assert(stats === ((4L, 1L, 2L, 2L)))
  }

  test("partitionDateCheck: per-partition integrity counters, null ts is invalid") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lake = Seq(
      (1L, ts("2024-01-01 10:00:00"), "2024-01-01"), // ok
      (2L, ts("2024-01-01 23:30:00"), "2024-01-01"), // ok
      (3L, ts("2024-01-02 00:30:00"), "2024-01-01"), // event date ≠ partition
      (4L, null.asInstanceOf[java.sql.Timestamp], "2024-01-02"), // null ts
      (5L, ts("2024-01-02 12:00:00"), "2024-01-02"), // ok
      (6L, ts("2024-01-03 08:00:00"), "2024-01-03")  // clean partition
    ).toDF("event_id", "ts", "p")
      .withColumn("p", to_date(col("p")))
    val got = Quality.partitionDateCheck(lake, "p")
      .orderBy("expected_date")
      .as[(java.sql.Date, Long, Long, Long, Boolean)].collect()
    assert(got === Array(
      (java.sql.Date.valueOf("2024-01-01"), 3L, 1L, 2L, false),
      (java.sql.Date.valueOf("2024-01-02"), 2L, 1L, 1L, false),
      (java.sql.Date.valueOf("2024-01-03"), 1L, 0L, 1L, true)))
    // type-robust: a STRING partition column (the day=... dir form) gives
    // the same verdicts, and an unparseable partition fails all its rows
    val strLake = Seq(
      (1L, ts("2024-01-03 08:00:00"), "2024-01-03"),
      (2L, ts("2024-01-04 09:00:00"), "garbage")
    ).toDF("event_id", "ts", "p")
    val got2 = Quality.partitionDateCheck(strLake, "p")
      .orderBy("expected_date")
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got2 === Array(
      ("2024-01-03", 1L, 0L, 1L, true),
      ("garbage", 1L, 1L, 1L, false)))
  }
}
