package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.Sink

class BucketedSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("writeBucketed: joins on the bucket key plan with no Exchange") {
    val events = (1 to 2000).map(i => (i.toLong, (i % 50).toLong, i * 1.5))
      .toDF("event_id", "user_id", "value")
    val users = (0 until 50).map(i => (i.toLong, s"user_$i")).toDF("user_id", "name")
    Sink.writeBucketed(events, "ev_bucketed", Seq("user_id"), buckets = 8)
    Sink.writeBucketed(users, "us_bucketed", Seq("user_id"), buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("ev_bucketed").join(spark.table("us_bucketed"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be co-located (no shuffle):\n$plan")
      assert(joined.count() === 2000)
      // correctness: same result as the unbucketed join
      val want = events.join(users, "user_id").count()
      assert(joined.count() === want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("writeBucketed: groupBy on the bucket key needs no exchange before partial agg") {
    Sink.writeBucketed(
      (1 to 1000).map(i => ((i % 20).toLong, i.toDouble)).toDF("user_id", "value"),
      "agg_bucketed", Seq("user_id"), buckets = 4)
    val agg = spark.table("agg_bucketed").groupBy("user_id").agg(sum("value"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy on bucket key should reuse the bucket partitioning:\n$plan")
    assert(agg.count() === 20)
  }
}
