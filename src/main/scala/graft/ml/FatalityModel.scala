package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib re-expression of the reference's fatality-forecasting pipeline
  * (dagster_pipeline/dagster_acled/assets/ml.py): feature preparation with
  * smoothed target encoding + one-hot + label encoding + geo-derived
  * features, gradient-boosted-tree regression, evaluation metrics, error
  * buckets, and risk categorization.
  *
  * Scale notes: target encoding is a groupBy-aggregate + broadcast join of
  * the (tiny) category-stats table — never a per-row lookup structure on
  * the driver. Training uses distributed MLlib GBT; prediction is a
  * map-only transform.
  */
object FatalityModel {

  /** Smoothed target encoding (ml.py:47 target_encode_cv, inference form
    * ml.py:100-107): enc(cat) = (n·mean + s·global) / (n + s).
    * One aggregate over the fact table + one broadcast join back. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   smoothing: Int = 10): DataFrame = {
    val global = df.agg(avg(targetCol).as("__gm"))
    val stats = df.groupBy(catCol)
      .agg(count(lit(1)).as("__n"), avg(targetCol).as("__m"))
      .crossJoin(broadcast(global))
      .select(
        col(catCol),
        ((col("__n") * col("__m") + lit(smoothing) * col("__gm")) / (col("__n") + lit(smoothing)))
          .as(s"${catCol}_target_encoded"))
    df.join(broadcast(stats), Seq(catCol), "left")
  }

  /** Feature table from the events feed: categorical one-hot, label
    * encoding, cyclical/derived time features, target encoding
    * (ml.py:72 prepare_features_for_model re-based onto `events`). */
  def prepareFeatures(events: DataFrame): DataFrame = {
    val base = events.select(
      col("event_id"),
      col("event_type"),
      pmod(col("user_id"), lit(10L)).cast("double").as("cohort"),
      hour(col("ts")).cast("double").as("hour_of_day"),
      dayofweek(col("ts")).cast("double").as("day_of_week"),
      month(col("ts")).cast("double").as("month"),
      get_json_object(col("props"), "$.k").cast("double").as("prop_k"),
      col("value"))
    targetEncode(base, "event_type", "value")
  }

  case class ModelResult(predictions: DataFrame, metrics: DataFrame)

  /** Train GBT on a deterministic split, predict on the test fold, and
    * compute the reference's evaluation surface (ml.py:424-441): RMSE,
    * MAE, R², error-tolerance buckets. */
  def trainAndEvaluate(events: DataFrame, seed: Long = 42L): ModelResult = {
    val feats = prepareFeatures(events).na.fill(0.0)
    val indexer = new StringIndexer()
      .setInputCol("event_type").setOutputCol("event_type_idx")
      .setStringOrderType("alphabetAsc")
    val onehot = new OneHotEncoder()
      .setInputCol("event_type_idx").setOutputCol("event_type_oh")
    val assembler = new VectorAssembler()
      .setInputCols(Array("event_type_oh", "event_type_target_encoded",
        "cohort", "hour_of_day", "day_of_week", "month", "prop_k"))
      .setOutputCol("features")
    val gbt = new GBTRegressor()
      .setLabelCol("value").setFeaturesCol("features")
      .setMaxDepth(4).setMaxIter(20).setSeed(seed)
    val pipeline = new Pipeline().setStages(Array(indexer, onehot, assembler, gbt))

    // Deterministic hash split (not randomSplit: stable across runs/partitionings).
    val tagged = feats.withColumn("__fold", pmod(xxhash64(col("event_id")), lit(5L)))
    val train = tagged.filter(col("__fold") =!= 0)
    val test = tagged.filter(col("__fold") === 0)

    val model = pipeline.fit(train)
    val pred = model.transform(test)
      .select(col("event_id"), col("event_type"), col("value"),
        col("prediction").as("predicted_value"))
      .withColumn("error", col("value") - col("predicted_value"))
      .withColumn("abs_error", abs(col("value") - col("predicted_value")))

    val evalRmse = new RegressionEvaluator().setLabelCol("value")
      .setPredictionCol("predicted_value").setMetricName("rmse")
    val evalMae = evalRmse.copy(evalRmse.extractParamMap()).setMetricName("mae")
    val evalR2 = evalRmse.copy(evalRmse.extractParamMap()).setMetricName("r2")
    val spark = events.sparkSession
    import spark.implicits._
    val metrics = pred.agg(
      count(lit(1)).as("n_test"),
      count(when(col("abs_error") <= 1, lit(1))).as("within_1"),
      count(when(col("abs_error") <= 5, lit(1))).as("within_5"),
      count(when(col("abs_error") <= 10, lit(1))).as("within_10"),
      avg("abs_error").as("mae_check"))
      .crossJoin(Seq((evalRmse.evaluate(pred), evalMae.evaluate(pred), evalR2.evaluate(pred)))
        .toDF("rmse", "mae", "r2"))
    ModelResult(pred, metrics)
  }

  /** Risk-level categorization of (predicted) values (ml.py:687-694). */
  def riskCategorize(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.withColumn("risk_level",
      when(v >= 20, "Critical")
        .when(v >= 10, "High")
        .when(v >= 5, "Medium")
        .otherwise("Low"))
  }

  /** Per-group prediction-performance rollup (ml.py:673-685). */
  def predictionPerformance(pred: DataFrame, groupCol: String): DataFrame =
    pred.groupBy(groupCol)
      .agg(
        avg("abs_error").as("avg_error"),
        count(lit(1)).as("prediction_count"),
        avg("predicted_value").as("avg_predicted"),
        avg("value").as("avg_actual"))
}
