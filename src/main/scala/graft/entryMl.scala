package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.ml.FatalityModel
import graft.operators._
import graft.sources.{Jsonl, Sink, Tables}
import graft.streaming.{EventStream, IncrementalStream}

import EntryOps._

/** The supervised-model tier: target encoding, feature prep, the GBT
  * fatality model and its evaluation/introspection queries.
  *
  * Registration slice of the [[SparkEntry]] driver contract — query
  * lambdas and their DuckDB oracle replays, split per tier (r15) so the
  * contract file stops being the single merge bottleneck. Entry text is
  * unchanged from the monolithic registration. */
private[graft] object MlEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §C ML pipeline ------------------------------------------------
    "target_encode" -> ((s, d) =>
      FatalityModel.targetEncode(
          Tables.events(s, d).select("event_type", "value"), "event_type", "value")
        .select(col("event_type"), col("event_type_target_encoded"))
        .distinct()),
    "target_encode_cv" -> ((s, d) =>
      // Fold tag is `event_id % 5` (portable to the DuckDB oracle, unlike
      // xxhash64); encoding rounded to 4dp for engine-portable hashing.
      FatalityModel.targetEncodeCV(
          Tables.events(s, d).select("event_id", "event_type", "value"),
          "event_type", "value", pmod(col("event_id"), lit(5L)))
        .select(col("event_type"), col("__fold").as("fold"),
          round(col("event_type_target_encoded_cv"), 4).as("encoded_cv"))
        .distinct()),
    "feature_prep" -> ((s, d) =>
      FatalityModel.prepareFeatures(Tables.events(s, d))),
    "fatality_model" -> ((s, d) => trainedModel(s, d).metrics),
    "risk_categorize" -> ((s, d) =>
      FatalityModel.riskCategorize(Tables.events(s, d), "value")
        .groupBy("risk_level").agg(count(lit(1)).as("cnt"))),
    "prediction_perf" -> ((s, d) =>
      // Per-group eval rollup (ml.py:673-685) off the memoized fit. The
      // fit is deterministic on the fixed gate config (seeded GBT +
      // xxhash64 fold split + fixed coalesce; two independent cold-JVM
      // trainings produced bit-identical predictions, r16 adjudication)
      // and the rollup sums 4dp-scaled Longs (order-independent), so the
      // r7 float-reduction-order flakiness is gone and the result pins
      // as a golden oracle.
      FatalityModel.predictionPerformance(trainedModel(s, d).predictions, "event_type")),
    "risk_crosstab" -> ((s, d) => {
      // Actual-vs-predicted risk-level confusion rollup (ml.py:693-694):
      // categorize both sides of the shared test-fold predictions.
      // Deterministic for the same reason as prediction_perf (frozen
      // fit → bit-stable predictions → stable threshold compares), so
      // golden-pinned in r16.
      val pred = trainedModel(s, d).predictions
      FatalityModel.riskCrosstab(pred, "value", "predicted_value")
    }),
    "model_feature_importance" -> ((s, d) =>
      // GBT feature-importance surface (ml.py:446-469; importance_pct
      // normalization ml.py:515): one row per assembled feature slot from
      // the memoized fit — importance desc, feature-name tiebreak. Rounded
      // for the artifact; rows-only (rides the GBT fit, like C3/C5/C6),
      // with model_feature_importance_check as the second-engine gate.
      FatalityModel.featureImportance(trainedModel(s, d))
        .select(col("feature"), round(col("importance"), 6).as("importance"),
          round(col("importance_pct"), 1).as("importance_pct"))),
    "model_feature_importance_check" -> ((s, d) => {
      // The SQL-checkable structural surface of the importance table:
      // DuckDB independently derives the expected slot count (one one-hot
      // slot per distinct event_type — handleInvalid=keep adds a reserved
      // slot, dropLast removes it — plus the 7 numeric features), and the
      // invariants are pinned TRUE: importances non-negative, pct
      // normalization sums to 100 within fp tolerance.
      val fi = FatalityModel.featureImportance(trainedModel(s, d))
      fi.agg(count(lit(1)).as("n_features"),
          min("importance").as("__min"),
          sum("importance_pct").as("__pct"))
        .select(col("n_features"),
          (col("__min") >= 0.0).as("nonneg_ok"),
          (abs(col("__pct") - 100.0) < 0.001).as("pct_total_ok"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "feature_prep" ->
      // Full second-engine replay of the ML feature table: modular cohort,
      // calendar features (DuckDB dayofweek is Sunday=0 → +1 for Spark's
      // Sunday=1), JSON prop extraction, median-centered distance, and
      // smoothed target encoding. percentile_approx(0.5, acc=10000)
      // matches quantile_disc exactly on these low-cardinality features
      // (cohort 0-9, hour 0-23) at the gate corpus — verified
      // column-for-column with zero diff.
      """WITH base AS (
           SELECT event_id, event_type,
             CAST(user_id % 10 AS DOUBLE) AS cohort,
             CAST(hour(ts) AS DOUBLE) AS hour_of_day,
             CAST(dayofweek(ts) + 1 AS DOUBLE) AS day_of_week,
             CAST(month(ts) AS DOUBLE) AS month,
             CAST(json_extract_string(props, '$.k') AS DOUBLE) AS prop_k,
             value
           FROM events),
         center AS (
           SELECT quantile_disc(cohort, 0.5) AS cx,
                  quantile_disc(hour_of_day, 0.5) AS cy FROM base),
         withdist AS (
           SELECT b.*, sqrt(pow(b.cohort - c.cx, 2)
             + pow(b.hour_of_day - c.cy, 2)) AS dist_from_center
           FROM base b CROSS JOIN center c),
         gm AS (SELECT avg(value) AS g FROM base),
         stats AS (
           SELECT event_type,
             (count(*) * avg(value) + 10 * (SELECT g FROM gm))
               / (count(*) + 10) AS event_type_target_encoded
           FROM base GROUP BY event_type)
         SELECT w.event_id, w.event_type, w.cohort, w.hour_of_day,
           w.day_of_week, w.month, w.prop_k, w.value, w.dist_from_center,
           s.event_type_target_encoded
         FROM withdist w
         LEFT JOIN stats s ON w.event_type IS NOT DISTINCT FROM s.event_type""",
    "target_encode" ->
      """WITH g AS (SELECT avg(value) AS gm FROM events),
            s AS (SELECT event_type, count(*) AS n, avg(value) AS m
                  FROM events GROUP BY event_type)
         SELECT s.event_type,
           (s.n * s.m + 10 * g.gm) / (s.n + 10) AS event_type_target_encoded
         FROM s CROSS JOIN g""",
    "target_encode_cv" ->
      """WITH fc AS (
           SELECT event_type, event_id % 5 AS fold,
             count(*) AS n_fc, sum(value) AS s_fc
           FROM events GROUP BY 1, 2)
         SELECT DISTINCT event_type, fold,
           round((sum(s_fc) OVER (PARTITION BY event_type) - s_fc
                  + 10 * ((sum(s_fc) OVER () - sum(s_fc) OVER (PARTITION BY fold))
                          / (sum(n_fc) OVER () - sum(n_fc) OVER (PARTITION BY fold))))
                 / (sum(n_fc) OVER (PARTITION BY event_type) - n_fc + 10), 4) AS encoded_cv
         FROM fc""",
    "risk_categorize" ->
      """SELECT CASE WHEN value >= 20 THEN 'Critical'
                     WHEN value >= 10 THEN 'High'
                     WHEN value >= 5 THEN 'Medium'
                     ELSE 'Low' END AS risk_level,
           count(*) AS cnt
         FROM events GROUP BY 1""",
    "prediction_perf" ->
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change OR
      // JDK/env change by dumping the query and pasting the rows] GBT
      // predictions can't replay in DuckDB; determinism adjudicated r16
      // (two cold-JVM fits bit-identical, order-independent integer-sum
      // rollup) — but only SAME-MACHINE: a toolchain bump (JDK, BLAS)
      // can legitimately move the fit's float path, so a red gate after
      // an env change is calibration, not regression (the
      // compression_ratio convention).
      """SELECT * FROM (VALUES
           ('click',    36.8274, CAST(426 AS BIGINT), 49.8018, 51.3087),
           ('error',    39.5054, CAST(406 AS BIGINT), 48.9214, 51.7447),
           ('purchase', 36.2130, CAST(411 AS BIGINT), 48.1079, 49.6950),
           ('signup',   39.0341, CAST(373 AS BIGINT), 50.0981, 54.6598),
           ('view',     36.6711, CAST(368 AS BIGINT), 48.6141, 49.3468))
         AS t(event_type, avg_error, prediction_count, avg_predicted, avg_actual)""",
    "risk_crosstab" ->
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — same determinism basis
      // and re-derive-on-SF-or-JDK/env-change convention as
      // prediction_perf] All test-fold predictions land >= 20
      // (avg_predicted ~49 per group), so the predicted side is uniformly
      // Critical at this corpus — the actual side spreads across the four
      // thresholds.
      """SELECT * FROM (VALUES
           ('Critical', 'Critical', CAST(1334 AS BIGINT)),
           ('High',     'Critical', CAST(264 AS BIGINT)),
           ('Low',      'Critical', CAST(196 AS BIGINT)),
           ('Medium',   'Critical', CAST(190 AS BIGINT)))
         AS t(actual_risk_level, predicted_risk_level, cnt)""",
    "model_feature_importance_check" ->
      // DuckDB's half: the assembled slot count is derivable from the data
      // alone — one one-hot slot per distinct non-null event_type (the
      // indexer's keep-slot is dropped by dropLast) + the 7 numeric
      // features (target_encoded, cohort, hour_of_day, day_of_week, month,
      // prop_k, dist_from_center). The two invariant booleans are pinned
      // TRUE: a fitted GBT's importances are a non-negative simplex, so
      // the percent normalization must close to 100.
      """SELECT CAST(count(DISTINCT event_type) + 7 AS BIGINT) AS n_features,
           true AS nonneg_ok, true AS pct_total_ok
         FROM events"""
  )
}
