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
    * n_dropped relative to the previous stage.
    *
    * Execution shape: each stage's SURVIVOR-ID frame (ids only — bytes
    * per row, never text) is persisted and counted ONCE; the census is
    * then assembled from the five counted longs on the driver (O(stages)
    * rows — the bounded-collect pattern). The lazy alternative — five
    * chained frames each union'd into one census plan — recomputes every
    * shared stage per branch: the first cut audited at 48 parquet scans
    * and 24 token explodes for one query, ~15 corpus passes at scale. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             domainCol: String, nllKeep: Double = 6.0,
             cap: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val s0 = docs.select(col(idCol), col(textCol), col(domainCol))
    val n0 = s0.count()

    // the cached id frames release in a finally: a failing stage (a lost
    // executor, a bad input tripping a require) must not leak up to
    // three corpus-sized-id cache entries for the session's lifetime
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def track(df: DataFrame): DataFrame = { cached += df.persist(); df }
    try {
      // stage 1: Gopher rule bitmap, keep pass_all — skinny id frame
      val ids1 = track(TextOps.gopherQualityRules(s0, idCol, textCol)
        .filter(col("pass_all")).select(col(idCol).as("doc_id")))
      val n1 = ids1.count()

      // stage 2: LM keep — model trained on the RAW corpus, but only the
      // stage-1 SURVIVORS pay the scoring join (the stage-ordering
      // economics the header promises). scoreAgainst on a corpus subset
      // equals self-scoring for it: every survivor bigram is in the raw
      // model, so the backoff never fires and verdicts are identical.
      val surv1 = s0.join(ids1.select(col("doc_id").as(idCol)), Seq(idCol))
      val ids2 = track(NgramLm.scoreAgainst(s0, surv1, idCol, textCol,
          nllKeep = nllKeep)
        .filter(col("keep")).select(col("doc_id")))
      val n2 = ids2.count()

      // stage 3: exact dedup (min id per content hash) among survivors —
      // one join back to the corpus for text, id+domain carried forward
      val ids3 = track(Dedup.exactByHash(
          s0.join(ids2.select(col("doc_id").as(idCol)), Seq(idCol)),
          textCol, idCol)
        .select(col(idCol).as("doc_id"), col(domainCol)))
      val n3 = ids3.count()

      // stage 4: per-domain cap over the (id, domain) survivor frame
      val n4 = Sample.domainCap(ids3, "doc_id", domainCol, cap).count()

      val ns = Seq(0L -> ("raw", n0), 1L -> ("gopher_rules", n1),
        2L -> ("lm_keep", n2), 3L -> ("exact_dedup", n3),
        4L -> ("domain_cap", n4))
      ns.zip(n0 +: ns.map(_._2._2)).map { case ((i, (name, n)), prev) =>
        (i.toInt, name, n, prev - n)
      }.toDF("stage", "stage_name", "n_docs", "n_dropped")
    } finally {
      cached.foreach(_.unpersist())
      Dedup.unpersistIntermediates()
    }
  }
}
