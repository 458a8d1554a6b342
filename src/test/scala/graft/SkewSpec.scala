package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // hot key "a" carries 90% of the rows — the shape salting exists for
  private lazy val skewed = (1 to 900).map(i => ("a", i.toDouble)) ++
    (1 to 50).map(i => ("b", i.toDouble)) ++ Seq(("c", 7.0))

  test("saltedStats matches the unsalted groupBy exactly") {
    val df = skewed.toDF("k", "v")
    val got = Skew.saltedStats(df, col("k"), "k", "v", salt = 8)
      .orderBy("k").as[(String, Long, Double, Double, Double, Double)].collect()
    val want = df.groupBy("k").agg(
        count(lit(1)).as("event_count"), sum("v").as("total_value"),
        avg("v").as("avg_value"), min("v").as("min_value"), max("v").as("max_value"))
      .orderBy("k").as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got === want)
  }

  test("saltedStats spreads a hot key over multiple salt buckets") {
    val df = skewed.toDF("k", "v")
    // the implementation's own salt formula (saltCol is package-visible so
    // this test cannot drift from what saltedStats actually does)
    val buckets = df.groupBy(col("k"), Skew.saltCol(8, Seq(col("k"), col("v"))))
      .count().filter(col("k") === "a").count()
    assert(buckets > 1, "hot key stayed in one bucket — salt has no effect")
  }

  test("saltedStats on a MapType column falls back to hashable columns") {
    // xxhash64 over a map fails analysis; the default whole-row salt must
    // skip the map field instead of hard-failing a previously-working input
    val df = skewed.toDF("k", "v")
      .withColumn("m", map(col("k"), col("v")))
    val got = Skew.saltedStats(df, col("k"), "k", "v", salt = 8)
      .orderBy("k").as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got.length === 3 && got.map(_._2).sum === 951L)
  }

  test("saltedStats with caller-named saltOn column matches direct groupBy") {
    val df = skewed.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      .toDF("k", "v", "rid")
    val got = Skew.saltedStats(df, col("k"), "k", "v", salt = 8,
        saltOn = Seq(col("rid")))
      .orderBy("k").as[(String, Long, Double, Double, Double, Double)].collect()
    val want = df.groupBy("k").agg(
        count(lit(1)).as("event_count"), sum("v").as("total_value"),
        avg("v").as("avg_value"), min("v").as("min_value"), max("v").as("max_value"))
      .orderBy("k").as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got === want)
  }

  test("saltedJoin matches the plain inner join") {
    val fact = skewed.toDF("k", "v")
    val build = Seq(("a", 10), ("b", 20), ("d", 40)).toDF("k", "w")
    val got = Skew.saltedJoin(fact, build, "k", salt = 4)
      .select("k", "v", "w").as[(String, Double, Int)].collect().sorted
    val want = fact.join(build, Seq("k"))
      .select("k", "v", "w").as[(String, Double, Int)].collect().sorted
    assert(got === want)
    assert(got.length === 950) // 900 a-rows + 50 b-rows; c/d unmatched
  }
}
