package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling operators, re-expressing the reference's asset
  * checks (dagster_pipeline/dagster_acled/asset_checks/acled_checks.py,
  * base_checks.py; assets/base_assets.py:242-263 missing-data breakdown)
  * as single-pass Spark aggregations.
  *
  * Every profile here is ONE full-scan aggregate with conditional counters
  * — at 100 TB that is one map-side-combined pass, never N per-column
  * passes. Long-format outputs are produced by unpivoting the single
  * aggregated row (driver-side-tiny), not by re-scanning per column.
  */
object Quality {

  /** Per-column null + empty-string completeness profile
    * (base_assets.py:246-259, acled_checks.py:645 critical_fields_query).
    * One scan; output = one row per profiled column. */
  def completenessProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"${c}__null"),
        count(when(col(c).cast("string") === "", lit(1))).as(s"${c}__empty"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the 1-row aggregate into (column_name, null_count, empty_count,
    // total_missing, missing_pct) via stack — no extra scan.
    val stackArgs = cols
      .map(c => s"'$c', `${c}__null`, `${c}__empty`")
      .mkString(", ")
    row.selectExpr(
        s"stack(${cols.size}, $stackArgs) as (column_name, null_count, empty_count)",
        "__total")
      .withColumn("total_missing", col("null_count") + col("empty_count"))
      .withColumn("missing_pct",
        round(col("total_missing") * lit(100.0) / col("__total"), 1))
      .drop("__total")
  }

  /** Numeric range validation with out-of-range counts + observed min/max
    * (acled_checks.py:747 coordinates_query). */
  def rangeValidation(df: DataFrame, valueCol: String, lo: Double, hi: Double): DataFrame = {
    val v = col(valueCol)
    df.agg(
      count(lit(1)).as("total_records"),
      count(when(v < lo, lit(1))).as("below_range"),
      count(when(v > hi, lit(1))).as("above_range"),
      count(when(v.isNotNull, lit(1))).as("non_null_records"),
      min(v).as("min_value"),
      max(v).as("max_value"))
  }

  /** Categorical domain validation: per-category counts flagged against an
    * expected set (acled_checks.py:824 event-type domain check), plus the
    * distribution-dominance alert (acled_checks.py:886-897: flag any
    * category holding more than `dominancePct` of the rows). The expected
    * set rides along as a literal — no join needed; the pct window runs
    * over the already-aggregated (tiny) frame. */
  def domainValidation(df: DataFrame, key: String, expected: Seq[String],
                       dominancePct: Double = 80.0): DataFrame =
    df.filter(col(key).isNotNull && col(key) =!= "")
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("is_expected",
        when(col(key).isin(expected: _*), lit(1)).otherwise(lit(0)))
      .withColumn("pct",
        round(col("cnt") * lit(100.0) /
          sum("cnt").over(org.apache.spark.sql.expressions.Window.partitionBy()), 2))
      .withColumn("is_dominant",
        when(col("pct") > dominancePct, lit(1)).otherwise(lit(0)))

  /** Duplicate-group detection by key fields (acled_checks.py:480
    * duplicate_records_check, polars `is_duplicated`). Returns the
    * duplicated key groups with their multiplicities. */
  def duplicateGroups(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Conditional presence counts (report.py:89 actor_query). */
  def presenceCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map { c =>
      count(when(col(c).isNotNull && col(c).cast("string") =!= "", lit(1)))
        .as(s"${c}_present")
    } :+ count(lit(1)).as("total_records")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Value-distribution sanity stats in one pass (acled_checks.py:961
    * fatalities_query: range buckets + negative/extreme counters + min/max/
    * avg/sum). */
  def valueValidation(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.agg(
      count(lit(1)).as("total_records"),
      count(when(v.isNotNull, lit(1))).as("records_with_value"),
      count(when(v < 0, lit(1))).as("negative_count"),
      count(when(v > 1000, lit(1))).as("extreme_count"),
      count(when(v === 0, lit(1))).as("zero_count"),
      count(when(v >= 1 && v <= 10, lit(1))).as("low_count"),
      count(when(v > 10 && v <= 50, lit(1))).as("moderate_count"),
      count(when(v > 50, lit(1))).as("high_count"),
      min(v).as("min_value"),
      max(v).as("max_value"),
      avg(v).as("avg_value"),
      sum(v).as("total_value"))
  }

  /** Required-columns/type contract check (base_checks.py
    * required-columns gate): one row per required column with its presence
    * and type status. Pure schema inspection — no scan at all. */
  def schemaValidation(df: DataFrame, required: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val actual = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
    required.map { case (name, expected) =>
      val at = actual.get(name)
      val status = at match {
        case None                  => "missing"
        case Some(t) if t == expected => "ok"
        case Some(_)               => "type_mismatch"
      }
      (name, expected, at.getOrElse(""), status)
    }.toDF("column_name", "expected_type", "actual_type", "status")
  }

  /** Event-date-vs-partition consistency check (acled_checks.py:195
    * acled_event_date_partition_check, a BLOCKING check in the reference):
    * every row stored in a daily partition must carry an event timestamp
    * whose date equals the partition's date — the invariant a backfill
    * that partitions by *processing* time instead of *event* time breaks.
    * Output: one row per partition with the reference check's metadata
    * (expected_date = the partition value, invalid_dates = rows whose
    * event date differs, unique_dates_count, and the pass/fail verdict).
    *
    * One groupBy on the partition column — at lake scale the groups are
    * days-of-history, so the shuffle moves a handful of counters per day,
    * and on a lake laid out by that same column the scan-side partial
    * aggregation already collapses each file to one row. Null event
    * timestamps count as invalid (null-safe compare): a row that can't
    * prove it belongs in the partition fails the check. */
  def partitionDateCheck(df: DataFrame, partitionCol: String,
                         tsCol: String = "ts"): DataFrame = {
    val eventDate = to_date(col(tsCol))
    // try_to_date on the partition column makes the compare type-robust:
    // a date passes through unchanged, a `day=2024-01-01`-style STRING
    // partition value parses, and an unparseable value becomes null —
    // failing every row in that partition (null-safe compare), which is
    // the right verdict for a partition whose identity can't be read.
    // (try_, not to_date: ANSI mode makes the plain cast THROW on
    // malformed input — an integrity CHECK must report, never abort.)
    val partDate = try_to_date(col(partitionCol))
    df.groupBy(col(partitionCol).as("expected_date"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(when(!(eventDate <=> partDate), lit(1)))
          .as("invalid_dates"),
        countDistinct(eventDate).as("unique_dates_count"))
      .withColumn("ok", col("invalid_dates") === 0)
  }

  /** Row-level validation gate: tag each row with the names of the rules it
    * violates (`rules` maps rule name → OK-predicate; a NULL predicate
    * counts as a violation). Valid rows carry an empty array — split with
    * [[validRows]]/[[invalidRows]] for the load/quarantine fork the
    * reference's checks imply (blocking checks stop the load;
    * non-blocking ones route rows aside). Single pass, pure projection. */
  def quarantine(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame =
    df.withColumn("violations",
      array_compact(array(rules.map { case (name, ok) =>
        when(!coalesce(ok, lit(false)), lit(name))
      }: _*)))

  def validRows(tagged: DataFrame): DataFrame =
    tagged.filter(size(col("violations")) === 0).drop("violations")

  def invalidRows(tagged: DataFrame): DataFrame =
    tagged.filter(size(col("violations")) > 0)

  /** One-row rollup of a quarantine ruleset: total, valid, and per-rule
    * violation counts — the check-result summary the reference's asset
    * checks publish. One conditional-counter scan. */
  def quarantineStats(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val tagged = quarantine(df, rules)
    val aggs = Seq(
      count(lit(1)).as("total_records"),
      count(when(size(col("violations")) === 0, lit(1))).as("valid_records")) ++
      rules.map { case (name, _) =>
        count(when(array_contains(col("violations"), name), lit(1))).as(s"${name}_cnt")
      }
    tagged.agg(aggs.head, aggs.tail: _*)
  }
}
