package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Local mode mirrors a multi-executor cluster via partitioning: AQE handles
  * runtime re-planning (skew joins, partition coalescing), shuffle
  * partitions are sized for the local core count (the 200 default is a
  * cluster-size knob), and auto-broadcast keeps dimension-table joins
  * shuffle-free.
  */
object GraftSession {
  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed (bucketed) tables live in scratch space, never the repo cwd
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /** Apply graft runtime tuning to an externally-created session (the driver
    * builds its own bare session for Verify/Bench). Session-scoped SQL confs
    * only — master/memory are fixed at creation. */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    // Session-build-time home for the nanos-timestamp reader mapping
    // (Tables.events re-asserts the same constant for externally-built
    // sessions, e.g. the driver's smoke-check session).
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
