package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The curation funnel — the stage-by-stage survivor census every
  * data-curation run publishes before training: how many documents enter,
  * and how many each quality gate removes, in gate order. This is the
  * one-page answer to "where did my corpus go?" and the number that
  * decides whether a rule is mis-calibrated (a stage that drops 99% is a
  * bug, not a filter) — the reference publishes per-stage record counts
  * through its asset checks (checks:700-860); at corpus scale the same
  * census is the pipeline's primary dashboard.
  *
  * Stage order mirrors production curation economics — cheap map-only
  * gates first so expensive stages see fewer docs:
  *   raw → gopher_rules (map-only bitmap) → lm_keep (bigram-LM NLL gate)
  *   → exact_dedup (min-id per content hash) → domain_cap (diversity).
  *
  * Scale shape: each stage is the already-gated operator (D33, D31, D1,
  * D32) applied to the previous stage's survivor frame; the census
  * aggregates each frame to ONE row (map-side-combinable count), so the
  * funnel's own cost is the stages themselves plus four 1-row aggs. The
  * LM trains on the RAW corpus (self-scoring outlier setup), not the
  * survivor slice, so the gate order doesn't perturb the model.
  */
object Curation {

  /** One row per stage: (stage, stage_name, n_docs, n_dropped) with
    * n_dropped relative to the previous stage. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             domainCol: String, nllKeep: Double = 6.0,
             cap: Int = 10): DataFrame = {
    val spark = docs.sparkSession

    val s0 = docs.select(col(idCol), col(textCol), col(domainCol))

    // stage 1: Gopher rule bitmap, keep pass_all
    val s1 = s0.join(
      TextOps.gopherQualityRules(s0, idCol, textCol)
        .filter(col("pass_all")).select(col("doc_id").as(idCol)),
      Seq(idCol))

    // stage 2: LM keep — model trained on the RAW corpus
    val s2 = s1.join(
      NgramLm.score(s0, idCol, textCol, nllKeep = nllKeep)
        .filter(col("keep")).select(col("doc_id").as(idCol)),
      Seq(idCol))

    // stage 3: exact dedup (min id per content hash) among survivors
    val s3 = Dedup.exactByHash(s2, textCol, idCol)

    // stage 4: per-domain cap among survivors
    val s4 = Sample.domainCap(s3, idCol, domainCol, cap).drop("rk")

    val counts = Seq(
      (0, "raw", s0), (1, "gopher_rules", s1), (2, "lm_keep", s2),
      (3, "exact_dedup", s3), (4, "domain_cap", s4)
    ).map { case (i, name, df) =>
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(i).as("stage"), lit(name).as("stage_name"), col("n_docs"))
    }.reduce(_ unionByName _)

    import org.apache.spark.sql.expressions.Window
    // the census frame is 5 rows; the single-partition lag window is free
    val w = Window.orderBy("stage")
    counts
      .withColumn("n_dropped",
        coalesce(lag(col("n_docs"), 1).over(w) - col("n_docs"), lit(0L)))
  }
}
