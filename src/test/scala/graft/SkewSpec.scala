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

  test("AQE splits a synthetically hot join key at runtime (skew=true)") {
    // The engine's skew story is two-tier: AQE splits skewed sort-merge
    // partitions at runtime (GraftSession turns skewJoin on), and
    // Skew.saltedJoin is the plan-level tool for what AQE doesn't cover.
    // This DEMONSTRATES tier 1 instead of asserting it: a key carrying
    // ~99% of the fact rows floods one shuffle partition, and the final
    // adaptive plan must show the join ran with skew=true — with the
    // salted join returning the identical result as tier-2 equivalence.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // shrink AQE's skew thresholds to test scale (defaults are sized for
      // 256MB+ cluster partitions); disable broadcast so the join shuffles
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // md5 payload keeps the hot partition big AFTER shuffle compression
      // (a constant key + tiny double would lz4 down below the threshold)
      val fact = spark.range(0, 200000).select(
        when(pmod(col("id"), lit(100)) =!= 0, lit("hot"))
          .otherwise(concat(lit("k"), pmod(col("id"), lit(50)))).as("k"),
        md5(col("id").cast("string")).as("v"))
      val build = spark.range(0, 50)
        .select(concat(lit("k"), col("id")).as("k"), col("id").as("w"))
        .unionByName(Seq(("hot", -1L)).toDF("k", "w"))
      val joined = fact.join(build, Seq("k"))
      val n = joined.queryExecution.toRdd.count() // materialize THIS plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$plan")
      // tier-2 equivalence: the salted join computes the same result
      val salted = Skew.saltedJoin(fact, build, "k", salt = 8)
      assert(salted.count() === n)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
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
