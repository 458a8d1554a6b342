package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver testdata layout
  * (`<sfDir>/<table>.parquet`).
  *
  * Plain `spark.read.parquet` so Catalyst column pruning and predicate
  * pushdown reach the scan — callers select/filter and the parquet reader
  * only materializes what the plan needs (verify with
  * `.explain("formatted")`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events feed carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's vectorized reader rejects. Read them as raw nanos longs and
    * truncate to microsecond timestamps — exactly what engines with µs
    * timestamps (DuckDB, Spark itself) store, so downstream date math is
    * bit-identical with the oracle. Projection happens in the scan's
    * codegen stage; no extra pass. */
  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Guarded fallback for externally-built sessions (the driver's bare
    * smoke session): GraftSession asserts the nanos-as-long reader mapping
    * at build/tune time, so for graft-built sessions this never mutates.
    * Memoized per session (weak keys — sessions are never retained), so
    * per-query paths touch the conf at most once per session lifetime. */
  private val nanosChecked =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  private def ensureNanosAsLong(s: SparkSession): Unit =
    if (nanosChecked.putIfAbsent(s, java.lang.Boolean.TRUE) == null &&
        !s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Events bounded to [start, end) with the predicate applied ON THE RAW
    * NANOS LONG, before the µs conversion: a plain long comparison reaches
    * the parquet scan (`PushedFilters` → row-group/file pruning), where the
    * same bound written against `timestamp_micros(ts div 1000)` stays a
    * post-scan filter — the difference between reading a week and scanning
    * 100 TB. Bounds are UTC `yyyy-MM-dd[ HH:mm:ss]` strings; because both
    * bounds are whole microseconds, the long predicate is exactly
    * equivalent to the post-truncation timestamp predicate. */
  def eventsWindowed(s: SparkSession, d: String, start: String, end: String): DataFrame = {
    ensureNanosAsLong(s)
    def nanos(x: String): Long = {
      val ldt =
        if (x.length == 10) java.time.LocalDate.parse(x).atStartOfDay()
        else java.time.LocalDateTime.parse(x.replace(' ', 'T'))
      ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    }
    load(s, d, "events")
      .filter(col("ts") >= lit(nanos(start)) && col("ts") < lit(nanos(end)))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
