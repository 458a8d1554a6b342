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

  /** The PER-DOCUMENT companion to [[funnel]] — the "why was my doc
    * dropped" ledger a curation run publishes beside the census: one row
    * per input doc with each gate's verdict and the first failing stage.
    * Stage semantics are the funnel's STAGED ones, not independent
    * gates: a later gate's flag is NULL for docs that never reached it —
    * deliberately, because two of the verdicts are SET-dependent
    * (canonicity is min-id within the stage-2 survivor set; the cap rank
    * is within stage-3 survivors), so an "independent" flag would be a
    * different, misleading number. `count(drop_stage = s)` therefore
    * reconciles exactly with the funnel's n_dropped at s — spec-pinned.
    *
    * Scale shape: identical to the funnel (each stage is the gated
    * operator on the previous survivor frame, skinny id frames persisted
    * once) plus four left joins of id-only frames to assemble the flags
    * — no stage is recomputed per flag column. */
  def provenance(docs: DataFrame, idCol: String, textCol: String,
                 domainCol: String, nllKeep: Double = 6.0,
                 cap: Int = 10): DataFrame = {
    val s0 = docs.select(col(idCol), col(textCol), col(domainCol))
    // persistTracked, not a local persist/finally: the RESULT is lazy
    // (unlike the funnel, which counts eagerly), and each stage's id
    // frame appears in the plan both as a flag join AND inside every
    // later stage's lineage — uncached, the final plan would recompute
    // gopher 4x and the LM scoring 3x (the 48-scan shape the funnel's
    // census already retired). The harness releases tracked frames
    // between queries (Dedup.unpersistIntermediates).
    val ids1 = Dedup.persistTracked(
      TextOps.gopherQualityRules(s0, idCol, textCol)
        .filter(col("pass_all")).select(col(idCol).as("doc_id")))
    val surv1 = s0.join(ids1.select(col("doc_id").as(idCol)), Seq(idCol))
    val ids2 = Dedup.persistTracked(
      NgramLm.scoreAgainst(s0, surv1, idCol, textCol, nllKeep = nllKeep)
        .filter(col("keep")).select(col("doc_id")))
    val ids3 = Dedup.persistTracked(
      Dedup.exactByHash(
          s0.join(ids2.select(col("doc_id").as(idCol)), Seq(idCol)),
          textCol, idCol)
        .select(col(idCol).as("doc_id"), col(domainCol)))
    val ids4 = Sample.domainCap(ids3, "doc_id", domainCol, cap)
      .select(col("doc_id"))
    // flag columns derive from the staged memberships with NULL below
    // the first failure, never re-evaluating a gate
    s0.select(col(idCol).as("doc_id"))
      .join(ids1.withColumn("__g", lit(true)), Seq("doc_id"), "left")
      .join(ids2.withColumn("__l", lit(true)), Seq("doc_id"), "left")
      .join(ids3.select(col("doc_id"), lit(true).as("__c")),
        Seq("doc_id"), "left")
      .join(ids4.withColumn("__k", lit(true)), Seq("doc_id"), "left")
      // three-state STRING verdicts, not nullable booleans: 'not_reached'
      // is a first-class value in this ledger (the staged semantics make
      // it the honest answer below the first failure), and an explicit
      // state string survives every downstream surface a NULL boolean
      // trips over (CSV exports, cross-engine hash compares)
      .select(
        col("doc_id"),
        when(col("__g").isNotNull, "pass").otherwise("fail")
          .as("pass_gopher"),
        when(col("__g").isNull, "not_reached")
          .when(col("__l").isNotNull, "pass").otherwise("fail")
          .as("pass_lm"),
        when(col("__l").isNull, "not_reached")
          .when(col("__c").isNotNull, "pass").otherwise("fail")
          .as("is_canonical"),
        when(col("__c").isNull, "not_reached")
          .when(col("__k").isNotNull, "pass").otherwise("fail")
          .as("within_cap"),
        when(col("__g").isNull, "gopher_rules")
          .when(col("__l").isNull, "lm_keep")
          .when(col("__c").isNull, "exact_dedup")
          .when(col("__k").isNull, "domain_cap")
          .otherwise("kept").as("drop_stage"),
        col("__k").isNotNull.as("keep"))
  }
}
