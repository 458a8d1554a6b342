package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRule

class RangeJoinRuleSpec extends AnyFunSuite with SparkSpec {

  // a genuinely fresh session (same context) with graft extensions active:
  // getOrCreate() returns the existing default session and would silently
  // skip withExtensions, so the default is cleared around creation
  private lazy val ext: SparkSession = {
    SparkSpec.session // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions).getOrCreate()
    finally {
      SparkSession.setDefaultSession(SparkSpec.session)
      SparkSession.setActiveSession(SparkSpec.session)
    }
  }

  private def frames(s: SparkSession) = {
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val values = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("id", "v")
    val intervals = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 95
      (i.toLong, lo, lo + rnd.nextDouble() * 10)
    }.toDF("iid", "lo", "hi")
    (values, intervals)
  }

  test("rule rewrites BETWEEN theta-join to a grid equi-join; results unchanged") {
    val (values, intervals) = frames(ext)
    ext.conf.set(RangeJoinRule.GridConf, "5.0")
    try {
      val joined = values.join(intervals, col("v") >= col("lo") && col("v") <= col("hi"))
      val optimized = joined.queryExecution.optimizedPlan
      assert(optimized.collect { case g: Generate => g }.nonEmpty,
        s"expected explode(sequence) in the rewritten plan:\n$optimized")
      assert(!joined.queryExecution.executedPlan.toString.contains("BroadcastNestedLoop"),
        "rewritten join must not plan as a nested loop")
      // results must match the un-rewritten join on the plain session
      val pairs = (df: org.apache.spark.sql.DataFrame) =>
        df.select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val got = pairs(joined)
      val (v2, i2) = frames(spark) // shared session: no extensions
      val want = pairs(v2.join(i2, col("v") >= col("lo") && col("v") <= col("hi")))
      assert(got === want)
      assert(got.nonEmpty)
    } finally ext.conf.unset(RangeJoinRule.GridConf)
  }

  test("rule is inert without the grid conf and on equi-joins") {
    val (values, intervals) = frames(ext)
    // no conf → untouched theta join
    val theta = values.join(intervals, col("v") >= col("lo") && col("v") <= col("hi"))
    assert(theta.queryExecution.optimizedPlan.collect { case g: Generate => g }.isEmpty)
    // conf set, but an equality conjunct present → untouched
    ext.conf.set(RangeJoinRule.GridConf, "5.0")
    try {
      val equi = values.join(intervals,
        col("id") === col("iid") && col("v") >= col("lo") && col("v") <= col("hi"))
      assert(equi.queryExecution.optimizedPlan.collect { case g: Generate => g }.isEmpty)
    } finally ext.conf.unset(RangeJoinRule.GridConf)
  }
}
