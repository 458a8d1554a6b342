package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** The events feed's `ts` column has shipped in two parquet encodings:
    * native `timestamp[us]` (current testdata — arrives as TIMESTAMP or
    * TIMESTAMP_NTZ depending on isAdjustedToUTC) and legacy
    * TIMESTAMP(NANOS), which Spark's vectorized reader only accepts as a
    * raw nanos long (`spark.sql.legacy.parquet.nanosAsLong`). Branch on
    * the scanned type: native timestamps are normalized to session-local
    * TimestampType (identity under the UTC session timezone GraftSession
    * pins), legacy nanos are truncated to microseconds. Either way the
    * projection rides the scan's codegen stage; no extra pass. */
  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    val raw = load(s, d, "events")
    tsCodec(raw).normalize(raw)
  }

  /** The ONE dispatch on the scanned `ts` type. Both events entry points
    * route through it, so a new encoding (or a fix to an existing one)
    * lands in `events` and `eventsWindowed` in lockstep — round 10 showed
    * what a divergence here costs (47 queries silently unrunnable).
    * `bound` produces a literal OF THE SCANNED TYPE so window predicates
    * stay in `PushedFilters`; `normalize` is the post-filter projection to
    * session-local TimestampType (identity under the pinned UTC zone). */
  private final case class TsCodec(
      bound: java.time.LocalDateTime => Column,
      normalize: DataFrame => DataFrame)
  private def tsCodec(raw: DataFrame): TsCodec =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // legacy TIMESTAMP(NANOS)
        TsCodec(
          ldt => lit(ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L),
          df => df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
      case org.apache.spark.sql.types.TimestampType =>
        TsCodec(
          ldt => lit(java.sql.Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC))),
          identity)
      case org.apache.spark.sql.types.TimestampNTZType =>
        // reinterpret as UTC instant (session tz is UTC)
        TsCodec(
          ldt => lit(ldt),
          df => df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType)))
      case other =>
        // Fail FAST and by name: a silently-mishandled ts encoding is the
        // exact divergence class behind the round-10 incident (47 queries
        // unrunnable). A new testdata encoding must land here explicitly.
        throw new IllegalStateException(
          s"events.ts scanned as unsupported type $other — add an explicit " +
            "TsCodec arm (known: LongType nanos, TimestampType, TimestampNTZType)")
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

  /** Events bounded to [start, end) with the predicate applied ON THE
    * SCANNED COLUMN, before any normalizing projection: a comparison
    * against a literal of the scan's own type reaches the parquet reader
    * (`PushedFilters` → row-group/file pruning), where the same bound
    * written against a converted column stays a post-scan filter — the
    * difference between reading a week and scanning 100 TB. Bounds are UTC
    * `yyyy-MM-dd[ HH:mm:ss]` strings; both bounds are whole seconds, so
    * the typed predicates are exactly equivalent across encodings. */
  def eventsWindowed(s: SparkSession, d: String, start: String, end: String): DataFrame = {
    ensureNanosAsLong(s)
    def ldt(x: String): java.time.LocalDateTime =
      if (x.length == 10) java.time.LocalDate.parse(x).atStartOfDay()
      else java.time.LocalDateTime.parse(x.replace(' ', 'T'))
    val raw = load(s, d, "events")
    val codec = tsCodec(raw)
    codec.normalize(
      raw.filter(col("ts") >= codec.bound(ldt(start)) &&
        col("ts") < codec.bound(ldt(end))))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
