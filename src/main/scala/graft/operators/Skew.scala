package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (one country/event-type dominating the
  * feed — the reference's distribution check exists precisely because ACLED
  * data skews hard toward a few regions, acled_checks.py:886).
  *
  * AQE's skew-join handling only splits sort-merge join partitions at
  * runtime; these operators are the plan-level tools for the cases AQE
  * doesn't cover: hash aggregation whose reduce side would see one giant
  * key, and shuffle joins where one fact key floods a single task.
  */
object Skew {

  /** Deterministic row-spread salt in [0, n): hashes the row's CONTENT
    * (all columns), so a hot key's rows scatter across n reduce buckets
    * with no runtime randomness AND no dependence on task/partition
    * assignment — `monotonically_increasing_id` would reassign ids on a
    * mid-stage task retry, re-shuffling a hot key differently across
    * attempts. Content hashing is stable under retries; exact duplicate
    * rows share a bucket, which only matters if one literal row dominates. */
  private def saltCol(n: Int, rowCols: Seq[Column]): Column =
    pmod(xxhash64(rowCols: _*), lit(n.toLong)).cast("int")

  /** Two-phase salted stats aggregation: phase 1 aggregates (key, salt) —
    * a hot key's rows land on up to `salt` different reducers — phase 2
    * combines the per-salt partials into final count/sum/avg/min/max.
    * Results are identical to a direct groupBy (avg recombined as
    * sum/count, not averaged averages). */
  def saltedStats(df: DataFrame, keyCol: Column, keyName: String,
                  valueCol: String, salt: Int = 16): DataFrame = {
    val partial = df
      .groupBy(keyCol.as(keyName), saltCol(salt, df.columns.toSeq.map(col)).as("__salt"))
      .agg(
        count(lit(1)).as("__cnt"), sum(valueCol).as("__sum"),
        min(valueCol).as("__min"), max(valueCol).as("__max"))
    partial.groupBy(keyName)
      .agg(
        sum("__cnt").as("event_count"),
        sum("__sum").as("total_value"),
        (sum("__sum") / sum("__cnt")).as("avg_value"),
        min("__min").as("min_value"),
        max("__max").as("max_value"))
  }

  /** Salted inner equi-join for a skewed fact side: the fact gets a salt in
    * [0, salt), the (small but not broadcast-small) build side is replicated
    * `salt`× with an exploded salt index, and the join key becomes
    * (key, salt) — a hot fact key now spreads over `salt` tasks instead of
    * flooding one. Build-side cost is `salt`× its row count; pick salt so
    * replicated-build still fits the shuffle comfortably. */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(salt, fact.columns.toSeq.map(col)))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
