package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed-ingest normalization: the reference's cast/normalize step between
  * raw fetch and warehouse load (base_assets.py:120-141 — date casts,
  * strict-off numeric casts, epoch-seconds → millisecond timestamp).
  *
  * Pure per-row projections — fully codegen'd, pipelined into the scan,
  * zero shuffles.
  */
object Ingest {

  /** Normalize the events feed: date/derived-time columns, integral value,
    * JSON property extraction. `floor` before the int cast pins truncation
    * semantics (plain double→int casts differ across engines). */
  def typedEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      to_date(col("ts")).as("event_date"),
      year(col("ts")).as("year"),
      month(col("ts")).as("month"),
      floor(col("value")).cast("int").as("value_int"),
      get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
      col("event_type"))

  /** Epoch-seconds → timestamp conversion used by the reference for its
    * `event_timestamp` column (base_assets.py:132-140). */
  def epochSecondsToTimestamp(df: DataFrame, epochCol: String, out: String): DataFrame =
    df.withColumn(out,
      when(col(epochCol).isNotNull, timestamp_seconds(col(epochCol).cast("long"))))
}
