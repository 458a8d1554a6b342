package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.FatalityModel

class FatalityModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("targetEncode: smoothed encoding, golden values") {
    // cat a: n=2 mean=10; cat b: n=1 mean=40; global mean=20, s=10
    val df = Seq(("a", 10.0), ("a", 10.0), ("b", 40.0)).toDF("cat", "v")
    val got = FatalityModel.targetEncode(df, "cat", "v")
      .select("cat", "cat_target_encoded").distinct()
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - (2 * 10.0 + 10 * 20.0) / 12) < 1e-9)
    assert(math.abs(got("b") - (1 * 40.0 + 10 * 20.0) / 11) < 1e-9)
  }

  test("targetEncode: NULL category still receives its encoding (null-safe join)") {
    val df = Seq(Some("a"), Some("a"), None).map(c => (c.orNull, 30.0)).toDF("cat", "v")
    val got = FatalityModel.targetEncode(df, "cat", "v")
    assert(got.filter(col("cat").isNull && col("cat_target_encoded").isNotNull).count() === 1L)
  }

  test("targetEncodeCV: encoding for a row excludes its own fold (leakage-safe)") {
    // Two folds; cat 'a' has value 0.0 in fold 0 and 100.0 in fold 1. If
    // fold-0 rows saw their own fold, the encoding would pull toward 0.
    val df = Seq(
      (0L, "a", 0.0), (2L, "a", 0.0),    // fold 0 (id % 2)
      (1L, "a", 100.0), (3L, "a", 100.0) // fold 1
    ).toDF("event_id", "cat", "v")
    val got = FatalityModel.targetEncodeCV(df, "cat", "v",
        pmod(col("event_id"), lit(2L)), folds = 2, smoothing = 0)
      .select(col("__fold"), col("cat_target_encoded_cv"))
      .distinct().as[(Long, Double)].collect().toMap
    // smoothing=0 → fold-0 rows get exactly the fold-1 mean and vice versa
    assert(got(0L) === 100.0)
    assert(got(1L) === 0.0)
  }

  test("distanceFromCenter: euclidean distance from the median center") {
    val df = Seq((0.0, 0.0), (0.0, 0.0), (3.0, 4.0)).toDF("x", "y")
    val got = FatalityModel.distanceFromCenter(df, "x", "y")
      .select("dist_from_center").as[Double].collect().sorted
    // median center = (0,0): distances 0, 0, 5
    assert(got === Array(0.0, 0.0, 5.0))
  }

  test("riskLevel boundaries and crosstab rollup") {
    val pred = Seq(
      (25.0, 25.0), (12.0, 4.0), (7.0, 7.0), (1.0, 11.0)
    ).toDF("value", "predicted_value")
    val ct = FatalityModel.riskCrosstab(pred, "value", "predicted_value")
      .as[(String, String, Long)].collect().toSet
    assert(ct === Set(
      ("Critical", "Critical", 1L),
      ("High", "Low", 1L),
      ("Medium", "Medium", 1L),
      ("Low", "High", 1L)))
  }

  test("trainAndEvaluate: end-to-end GBT with sweep on a small frame") {
    val rnd = new scala.util.Random(7)
    val events = (1 to 400).map { i =>
      val et = Seq("click", "view", "purchase")(i % 3)
      val base = Map("click" -> 5.0, "view" -> 15.0, "purchase" -> 30.0)(et)
      (i.toLong, new java.sql.Timestamp(1704067200000L + i * 3600000L),
        (i % 50).toLong, et, base + rnd.nextGaussian(), s"""{"k": ${i % 9}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = FatalityModel.trainAndEvaluate(events)
    val m = r.metrics.collect()(0)
    assert(m.getAs[Long]("n_test") > 0L)
    assert(m.getAs[Double]("rmse") < 10.0, "model should beat a wild guess on separable data")
    assert(Set(3, 4).contains(m.getAs[Int]("best_max_depth")))
    assert(Set(10, 20).contains(m.getAs[Int]("best_max_iter")))
    assert(r.predictions.count() === m.getAs[Long]("n_test"))
  }

  test("sampleGrid: seeded n_iter sampling is deterministic and cost-bounding") {
    import org.apache.spark.ml.param.ParamMap
    import org.apache.spark.ml.regression.GBTRegressor
    import org.apache.spark.ml.tuning.ParamGridBuilder
    val gbt = new GBTRegressor()
    val grid: Array[ParamMap] = new ParamGridBuilder()
      .addGrid(gbt.maxDepth, Array(2, 3, 4, 5, 6))
      .addGrid(gbt.maxIter, Array(5, 10, 20, 40))
      .build() // 20 configs
    val a = FatalityModel.sampleGrid(grid, 6, seed = 99L)
    val b = FatalityModel.sampleGrid(grid, 6, seed = 99L)
    assert(a.length === 6, "n_iter bounds the sweep cost")
    assert(a.toSeq === b.toSeq, "same seed → same sampled configs")
    assert(a.toSet.subsetOf(grid.toSet), "samples come from the grid, no invention")
    assert(a.distinct.length === 6, "sampling without replacement")
    val c = FatalityModel.sampleGrid(grid, 6, seed = 100L)
    assert(a.toSeq !== c.toSeq, "different seed → different draw")
    assert(FatalityModel.sampleGrid(grid, 25, seed = 1L).toSeq === grid.toSeq,
      "n_iter >= |grid| degrades to the exhaustive sweep untouched")
  }
}
