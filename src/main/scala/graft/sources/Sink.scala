package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Partitioned parquet sinks — the write side of the reference pipeline,
  * re-expressed for a data lake instead of S3-objects + Postgres.
  *
  * The reference materializes one object per daily partition
  * (base_assets.py:150 `acled_data_to_s3` keyed by partition date) and then
  * upserts rows into Postgres by event key (base_assets.py:207
  * `ON CONFLICT (event_id_cnty) DO UPDATE`). On Spark at lake scale the
  * equivalents are:
  *
  *  - [[writePartitioned]]: date-partitioned parquet with *dynamic*
  *    partition overwrite — re-materializing a day replaces exactly that
  *    day's files and leaves every other partition untouched (Dagster's
  *    idempotent partitioned-asset contract).
  *  - [[upsertPartitioned]]: latest-wins merge by key that reads, merges,
  *    and rewrites ONLY the partitions the update batch touches. At 100 TB
  *    the update batch touches a handful of days; rewriting the whole table
  *    (or shuffling it) per load would be the scale bug.
  */
object Sink {

  /** Write `df` as parquet partitioned by `partitionCol`, replacing only the
    * partitions present in `df` (dynamic overwrite). Rows are repartitioned
    * by the partition column first so each day is written by one task —
    * without this every task holding any row of a day emits its own file
    * per day (tasks × days small files, the classic partitioned-write
    * mistake at scale). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(path)
  }

  /** Latest-wins upsert of `updates` into the partitioned parquet table at
    * `path` — Postgres `ON CONFLICT (keys) DO UPDATE` semantics with
    * `orderCol` (+ `tieBreak`) deciding the winner.
    *
    * Assumes the partition value is stable per key (true for the reference:
    * an event's date never moves across loads), so the merge only needs the
    * partitions present in the update batch: existing rows there are
    * unioned with the updates, deduped by key, and exactly those partitions
    * are replaced. The merged slice is staged to a side directory (Spark
    * correctly refuses a plan that reads the same files an overwrite is
    * deleting) and then each staged partition directory is SWAPPED into the
    * table — delete the stale partition dir, rename the staged one in — so
    * the merged rows are written exactly once. The previous implementation
    * re-wrote the staging output through a second Spark job: 2× write
    * amplification on every touched partition of every merge.
    */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                        keys: Seq[String], orderCol: String, tieBreak: String,
                        partitionCol: String): Unit = {
    val tableDir = new java.io.File(path.stripPrefix("file:"))
    if (!tableDir.exists()) {
      writePartitioned(updates, path, partitionCol)
      return
    }
    // Partition values in the batch: bounded by the table's partition count
    // (days), so the driver-side collect is O(days), never O(rows).
    val touched = updates.select(partitionCol).distinct().collect().map(_.get(0))
    if (touched.isEmpty) return
    val existing = spark.read.parquet(path)
      .filter(col(partitionCol).isin(touched: _*))   // partition pruning
      .select(updates.columns.map(col): _*)
    val merged = Dedup.latestWins(
      existing.unionByName(updates), keys, orderCol, tieBreak)
    val staging = path.stripSuffix("/") + "__staging"
    writePartitioned(merged, staging, partitionCol)
    // Atomic-per-partition swap: `day=X` dirs carry their own partition
    // value, so renaming them under the table root is all "commit" means —
    // no second write job, no name re-derivation (values with URL-escaped
    // encodings move correctly because the directory name IS the encoding).
    val stagingDir = new java.io.File(staging.stripPrefix("file:"))
    stagingDir.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .foreach { part =>
        val target = new java.io.File(tableDir, part.getName)
        deleteRecursively(target)
        java.nio.file.Files.move(part.toPath, target.toPath)
      }
    deleteRecursively(stagingDir)
  }

  /** Bucketed+sorted managed copy of a table: hash-bucketed on the join
    * keys so every subsequent join/aggregation on those keys is
    * CO-LOCATED — the physical plan carries no Exchange on the bucketed
    * side(s). This is the lake-layout half of shuffle discipline: pay the
    * shuffle once at write time, never again per query (Spark's answer to
    * the reference's indexed Postgres table). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int, path: Option[String] = None): Unit = {
    val spark = df.sparkSession
    // A table dir left by a previous session blocks CTAS even in overwrite
    // mode (a fresh in-memory catalog has no claim on the location):
    // drop the catalog entry AND clear the orphan location first.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = path.getOrElse(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/${table.toLowerCase}")
    reset(loc)
    val w = df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    // explicit path → external table (sessions with a cwd-default
    // warehouse, e.g. the driver's bare Verify session, stay scratch-clean)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Drop a sink table (scratch/test lifecycles). */
  def reset(path: String): Unit =
    deleteRecursively(new java.io.File(path.stripPrefix("file:")))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
