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

  /** Production streaming state tuning: RocksDB-backed keyed state instead
    * of the default in-JVM-heap HDFSBackedStateStore. At scale the state of
    * windowed aggs / dedup / sessionization outgrows executor heaps —
    * RocksDB keeps it off-heap + on local disk with incremental (changelog)
    * checkpointing, the standard choice for large stateful streams. Confs
    * are read at stream start, so call before `.start()`. */
  def tuneStreaming(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    spark
  }

  /** Apply graft runtime tuning to an externally-created session (the driver
    * builds its own bare session for Verify/Bench). Session-scoped SQL confs
    * only — master/memory are fixed at creation. */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    // Day/week bucketing and the tz-naive DuckDB oracle both assume UTC;
    // an externally-built session on a non-UTC host must not disagree.
    c.set("spark.sql.session.timeZone", "UTC")
    // Session-build-time home for the nanos-timestamp reader mapping
    // (Tables.events re-asserts the same constant for externally-built
    // sessions, e.g. the driver's smoke-check session).
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
