package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the bookkeeping step of an incremental curation
  * loop: given two versions of a corpus (yesterday's lake, today's crawl
  * refresh), emit exactly what changed. The reference runs this loop
  * through its poll-for-new-data sensor + per-partition re-materialization
  * (sensors.py:21-57, base_assets.py:150-230 — "what partitions need
  * rework?"); at corpus scale the same question is asked per DOCUMENT, and
  * the answer feeds everything downstream: only `added`/`changed` docs
  * re-enter dedup/filter/embedding, only `removed` docs trigger index
  * tombstones.
  *
  * Scale shape: both sides are immediately projected to
  * (id, 16-byte md5 content hash) — the join never ships document text,
  * so the shuffle is O(|ids|·24B) regardless of corpus byte size. The
  * `unchanged` mass (at 100 TB, ~all of it) is filtered out BEFORE the
  * result materializes: the output is the delta, which is what a
  * downstream incremental pass consumes. One full-outer hash join on the
  * id = one shuffle per side; with both lakes bucketed by id
  * (Sink.writeBucketed) even that exchange disappears.
  */
object Snapshot {

  /** Row-level delta between `prev` and `curr`: one row per doc whose
    * membership or content changed — status ∈ added | removed | changed,
    * with both content hashes (null on the missing side). */
  def diff(prev: DataFrame, curr: DataFrame, idCol: String,
           contentCol: String): DataFrame = {
    // explicit presence markers, not hash-nullness: a doc with NULL
    // content hashes to NULL, which must read as "present, content null"
    // — never as "row absent" (that would book it added/removed forever)
    val p = prev.select(col(idCol).as("id"),
      md5(col(contentCol)).as("prev_hash"), lit(true).as("__in_prev"))
    val c = curr.select(col(idCol).as("id"),
      md5(col(contentCol)).as("curr_hash"), lit(true).as("__in_curr"))
    p.join(c, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__in_prev").isNull, lit("added"))
          .when(col("__in_curr").isNull, lit("removed"))
          .when(!(col("prev_hash") <=> col("curr_hash")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("id").as(idCol), col("status"),
        col("prev_hash"), col("curr_hash"))
  }

  /** One-row census of a diff — counts per status plus the unchanged
    * remainder (derivable only here, where both totals are in hand); the
    * number a pipeline pins per refresh to catch a step change (a crawler
    * suddenly rewriting 40% of the corpus is an incident, not an update). */
  def diffSummary(prev: DataFrame, curr: DataFrame, idCol: String,
                  contentCol: String): DataFrame = {
    val p = prev.select(col(idCol).as("id"),
      md5(col(contentCol)).as("prev_hash"), lit(true).as("__in_prev"))
    val c = curr.select(col(idCol).as("id"),
      md5(col(contentCol)).as("curr_hash"), lit(true).as("__in_curr"))
    p.join(c, Seq("id"), "full_outer")
      .agg(
        sum(when(col("__in_prev").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__in_curr").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__in_prev").isNotNull && col("__in_curr").isNotNull &&
          !(col("prev_hash") <=> col("curr_hash")), 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("__in_prev").isNotNull && col("__in_curr").isNotNull &&
          (col("prev_hash") <=> col("curr_hash")), 1L).otherwise(0L))
          .as("n_unchanged"))
  }
}
