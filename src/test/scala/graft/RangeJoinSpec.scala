package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("rangeJoin matches the BETWEEN theta-join on random intervals") {
    val rnd = new scala.util.Random(11)
    val values = (1 to 400).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("id", "v")
    val intervals = (1 to 60).map { i =>
      val lo = rnd.nextDouble() * 95
      (i.toLong, lo, lo + rnd.nextDouble() * 12) // widths 0..12, grid 5
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(values, "v", intervals, "lo", "hi", grid = 5.0)
      .select("id", "iid").as[(Long, Long)].collect().sorted
    val want = values.join(intervals, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("id", "iid").as[(Long, Long)].collect().sorted
    assert(got === want)
    assert(got.nonEmpty, "test data produced no matches — not exercising the join")
  }

  test("rangeJoin produces no duplicate pairs (one cell per value)") {
    val values = Seq((1L, 10.0)).toDF("id", "v")
    // interval spanning many grid cells must still match once
    val intervals = Seq((1L, 0.0, 100.0)).toDF("iid", "lo", "hi")
    assert(RangeJoin.rangeJoin(values, "v", intervals, "lo", "hi", grid = 2.0).count() === 1)
  }

  test("rangeJoin boundary semantics are inclusive-inclusive") {
    val values = Seq((1L, 5.0), (2L, 10.0), (3L, 10.000001)).toDF("id", "v")
    val intervals = Seq((7L, 5.0, 10.0)).toDF("iid", "lo", "hi")
    val ids = RangeJoin.rangeJoin(values, "v", intervals, "lo", "hi", grid = 5.0)
      .select("id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L))
  }

  test("rangeJoin handles negative domains (floor-consistent cells)") {
    val values = Seq((1L, -7.5), (2L, -0.1), (3L, 0.0), (4L, 3.0)).toDF("id", "v")
    val intervals = Seq((1L, -10.0, -5.0), (2L, -1.0, 1.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(values, "v", intervals, "lo", "hi", grid = 4.0)
      .select("id", "iid").as[(Long, Long)].collect().sorted
    assert(got === Array((1L, 1L), (2L, 2L), (3L, 2L)))
  }
}
