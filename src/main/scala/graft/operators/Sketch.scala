package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the scale substitutes for exact
  * `count(DISTINCT)` and exact percentiles (the reference computes pandas
  * `nunique()`/`describe()` per group, ml.py:240; at 100 TB those are
  * HyperLogLog and KLL/GK sketches or nothing: exact distinct shuffles
  * every key, exact percentiles sort the world).
  *
  * Both functions are single-pass partial aggregates: each partition folds
  * into a constant-size sketch, sketches merge on the reduce side —
  * shuffle volume is O(groups × sketch size), independent of row count.
  */
object Sketch {

  /** Per-group profile: count, HLL distinct of `idCol` (±`rsd` relative
    * error), and approximate p50/p95/p99 of `valueCol`. */
  def approxProfile(df: DataFrame, groupCol: Column, groupName: String,
                    idCol: String, valueCol: String,
                    rsd: Double = 0.02): DataFrame =
    df.groupBy(groupCol.as(groupName))
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col(idCol), rsd).as("approx_distinct"),
        percentile_approx(col(valueCol), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col(valueCol), lit(0.95), lit(10000)).as("p95"),
        percentile_approx(col(valueCol), lit(0.99), lit(10000)).as("p99"))
}
