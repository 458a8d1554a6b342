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

  // One fit shared by the e2e, feature-importance, and save/load gates —
  // three tests, one training pass.
  private lazy val sharedFit: FatalityModel.ModelResult = {
    val rnd = new scala.util.Random(7)
    val events = (1 to 400).map { i =>
      val et = Seq("click", "view", "purchase")(i % 3)
      val base = Map("click" -> 5.0, "view" -> 15.0, "purchase" -> 30.0)(et)
      (i.toLong, new java.sql.Timestamp(1704067200000L + i * 3600000L),
        (i % 50).toLong, et, base + rnd.nextGaussian(), s"""{"k": ${i % 9}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    FatalityModel.trainAndEvaluate(events)
  }

  test("trainAndEvaluate: end-to-end GBT with sweep on a small frame") {
    val r = sharedFit
    val m = r.metrics.collect()(0)
    assert(m.getAs[Long]("n_test") > 0L)
    assert(m.getAs[Double]("rmse") < 10.0, "model should beat a wild guess on separable data")
    assert(Set(3, 4).contains(m.getAs[Int]("best_max_depth")))
    assert(Set(10, 20).contains(m.getAs[Int]("best_max_iter")))
    assert(r.predictions.count() === m.getAs[Long]("n_test"))
  }

  test("featureImportance: named slots, simplex normalization, ordered") {
    val fi = FatalityModel.featureImportance(sharedFit)
      .as[(String, Double, Double)].collect()
    // 3 one-hot slots (3 event types; keep-slot dropped by dropLast) + 7
    // numeric features
    assert(fi.length === 10)
    val names = fi.map(_._1).toSet
    assert(Set("cohort", "hour_of_day", "day_of_week", "month", "prop_k",
      "dist_from_center", "event_type_target_encoded").subsetOf(names))
    assert(names.count(_.startsWith("event_type_oh_")) === 3,
      "one-hot slots carry their category label")
    assert(fi.forall(_._2 >= 0.0), "importances are non-negative")
    assert(math.abs(fi.map(_._3).sum - 100.0) < 1e-6, "pct sums to 100")
    assert(fi.map(-_._2).toSeq === fi.map(-_._2).toSeq.sorted,
      "rows ordered importance-descending")
    // the event type IS the signal in this frame (value = f(event_type) + noise):
    // its slots must dominate the importance mass
    val etMass = fi.filter(f => f._1.startsWith("event_type")).map(_._3).sum
    assert(etMass > 50.0, s"event_type features should dominate, got $etMass%")
  }

  test("saveModel/loadModel: reload reproduces predictions bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    try {
      FatalityModel.saveModel(sharedFit, dir)
      val (prep, gbt) = FatalityModel.loadModel(dir)
      // gate frame: the shared fit's own test fold, re-prepared by the
      // RELOADED pipeline and scored by the RELOADED GBT
      val gate = sharedFit.predictions.select("event_id").limit(50)
      def score(p: org.apache.spark.ml.PipelineModel,
                m: org.apache.spark.ml.regression.GBTRegressionModel) = {
        val rnd = new scala.util.Random(7)
        val events = (1 to 400).map { i =>
          val et = Seq("click", "view", "purchase")(i % 3)
          val base = Map("click" -> 5.0, "view" -> 15.0, "purchase" -> 30.0)(et)
          (i.toLong, new java.sql.Timestamp(1704067200000L + i * 3600000L),
            (i % 50).toLong, et, base + rnd.nextGaussian(), s"""{"k": ${i % 9}}""")
        }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        val feats = FatalityModel.prepareFeatures(events).na.fill(0.0)
        m.transform(p.transform(feats))
          .select(col("event_id"), col("prediction"))
      }
      val a = score(sharedFit.prep, sharedFit.model)
        .as[(Long, Double)].collect().toMap
      val b = score(prep, gbt).as[(Long, Double)].collect().toMap
      assert(a.keySet === b.keySet)
      // bit-identical: same trees, same thresholds, same arithmetic
      a.foreach { case (id, v) => assert(v === b(id), s"event $id diverged") }
      assert(gate.count() > 0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively(): Unit
    }
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
