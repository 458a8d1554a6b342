package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *
  * All directory manipulation goes through the Hadoop [[FileSystem]] API
  * resolved from the session's Hadoop conf, so the same code commits on
  * `file:`, `hdfs://`, and `s3a://` tables (rename is atomic-per-dir on
  * local/HDFS; on object stores it degrades to copy-commit with the same
  * ordering guarantees — for heavy S3 traffic front this with a
  * manifest-committing table format).
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
    * table — one write job per merge, no second overwrite pass.
    *
    * Crash safety (SINGLE-WRITER, not snapshot isolation): the swap never
    * destroys the only copy of a row. Per partition the order is (1) rename
    * the live `day=X` dir to a tombstone OUTSIDE the table root, (2) rename
    * the staged dir in, (3) delete the tombstone — so a crash at any instant
    * leaves either the old or the new dir recoverable in full. A CONCURRENT
    * READER, however, can observe the partition missing between (1) and (2)
    * — reader-visible atomicity needs a manifest-committing table format,
    * and two concurrent merges on one table are NOT safe.
    * Entry first heals leftovers of an interrupted run: orphaned
    * tombstones whose live partition vanished are renamed back (restoring
    * the pre-merge rows a replay must read), and a stale staging dir is
    * cleared so it can never be swapped into the table as old data.
    */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                        keys: Seq[String], orderCol: String, tieBreak: String,
                        partitionCol: String): Unit = {
    val fs = fileSystem(spark, path)
    val tableDir = new Path(path)
    val staging = new Path(path.stripSuffix("/") + "__staging")
    val tombs = new Path(path.stripSuffix("/") + "__tombstone")
    // Heal an interrupted previous merge BEFORE reading `existing`:
    //  - a tombstone with no live partition is the surviving pre-merge copy
    //    → move it back so this merge sees those rows;
    //  - a stale staging dir holds a previous batch's output → delete it,
    //    otherwise dynamic overwrite would leave its untouched days behind
    //    and the swap would resurrect them as current data.
    if (fs.exists(tombs)) {
      fs.listStatus(tombs).filter(_.isDirectory).foreach { t =>
        val live = new Path(tableDir, t.getPath.getName)
        if (!fs.exists(live)) rename(fs, t.getPath, live)
        else fs.delete(t.getPath, true)
      }
      fs.delete(tombs, true)
    }
    fs.delete(staging, true)
    if (!fs.exists(tableDir)) {
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
    writePartitioned(merged, staging.toString, partitionCol)
    swapStaged(fs, tableDir, staging, tombs)
  }

  /** Atomic-per-partition swap of staged partition dirs into the table:
    * `day=X` dirs carry their own partition value, so renaming them under
    * the table root is all "commit" means — no second write job, no name
    * re-derivation (values with URL-escaped encodings move correctly
    * because the directory name IS the encoding). Tombstone-protected per
    * partition (see [[upsertPartitioned]]'s crash-safety contract). */
  private def swapStaged(fs: FileSystem, tableDir: Path, staging: Path,
                         tombs: Path): Unit = {
    val staged = fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    if (staged.nonEmpty) fs.mkdirs(tombs)
    staged.foreach { part =>
      val name = part.getPath.getName
      val target = new Path(tableDir, name)
      val tomb = new Path(tombs, name)
      if (fs.exists(target)) rename(fs, target, tomb)
      rename(fs, part.getPath, target)
      fs.delete(tomb, true)
    }
    fs.delete(tombs, true)
    fs.delete(staging, true)
  }

  /** Small-file compaction — the lake-maintenance pass every streamed or
    * micro-batched ingest eventually owes: each partition directory whose
    * data-file count exceeds `maxFilesPerPartition` is rewritten by ONE
    * task into one file (the same one-task-per-partition invariant
    * [[writePartitioned]] establishes at write time), and swapped in with
    * the upsert path's tombstone-protected rename, so readers never see a
    * partially compacted partition and a crash strands no data. Untouched
    * partitions are not rewritten — the rewrite cost scales with the
    * fragmented fraction, not the table. Returns the per-partition audit
    * frame (partition value, files_before, files_after, n_rows AFTER the
    * pass) — row counts must be invariant, which is the correctness gate.
    *
    * Driver-side material is O(partitions) directory listings — bounded
    * by days-of-history like the upsert's touched-partition discovery. A
    * partition too large for one file belongs in
    * [[writePartitionedSorted]]'s range-split layout instead; compaction
    * restores the small-file invariant, it does not re-shard. */
  def compactPartitions(spark: SparkSession, path: String, partitionCol: String,
                        maxFilesPerPartition: Int = 1): DataFrame = {
    val fs = fileSystem(spark, path)
    val tableDir = new Path(path)
    def dataFiles(p: Path): Int = fs.listStatus(p).count { f =>
      f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith(".")
    }
    def partDirs() = fs.listStatus(tableDir)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    // Spark writes null (and empty-string) partition values to the
    // __HIVE_DEFAULT_PARTITION__ dir and reads that dir back as null, so
    // the dir name is the storage layer's OWN null encoding — we keep it
    // as the audit join key (a value-level sentinel can't collide here:
    // any data value that maps to this dir is read back as null by Spark
    // itself) and select on isNull rather than a cast (cast of null is
    // null, so an isin filter would silently skip the partition).
    val nullDir = "__HIVE_DEFAULT_PARTITION__"
    def decode(name: String): String =
      java.net.URLDecoder.decode(name.substring(name.indexOf('=') + 1), "UTF-8")
    val before = partDirs().map(p => p.getPath.getName -> dataFiles(p.getPath)).toMap
    val needy = before.filter(_._2 > maxFilesPerPartition).keys.toSeq
    if (needy.nonEmpty) {
      val staging = new Path(path.stripSuffix("/") + "__staging")
      val tombs = new Path(path.stripSuffix("/") + "__tombstone")
      fs.delete(staging, true)
      val (needyNull, needyVals) = needy.map(decode).partition(_ == nullDir)
      val sel = {
        val byValue =
          if (needyVals.nonEmpty) Some(col(partitionCol).cast("string").isin(needyVals: _*))
          else None
        val byNull =
          if (needyNull.nonEmpty) Some(col(partitionCol).isNull) else None
        (byValue ++ byNull).reduce(_ || _)
      }
      spark.read.parquet(path)
        .filter(sel) // pruned
        .repartition(col(partitionCol)) // one task → one file per partition
        .write.mode("overwrite").partitionBy(partitionCol)
        .parquet(staging.toString)
      swapStaged(fs, tableDir, staging, tombs)
    }
    val after = partDirs().map(p => p.getPath.getName -> dataFiles(p.getPath)).toMap
    import spark.implicits._
    val audit = before.keys.toSeq.sorted
      .map(n => (decode(n), before(n), after.getOrElse(n, 0)))
      .toDF("__part", "files_before", "files_after")
    spark.read.parquet(path)
      .groupBy(coalesce(col(partitionCol).cast("string"), lit(nullDir)).as("__part"))
      .agg(count(lit(1)).as("n_rows"))
      .join(broadcast(audit), Seq("__part"))
      .select(
        when(col("__part") === nullDir, lit(null).cast("string"))
          .otherwise(col("__part")).as(partitionCol),
        col("n_rows"), col("files_before"), col("files_after"))
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

  /** Range-sorted layout: repartitionByRange on the sort keys (each output
    * file owns one contiguous key range) + sortWithinPartitions (rows
    * ordered inside each file), so every parquet row group carries TIGHT
    * min/max stats on those keys. A later range predicate (the time-bounded
    * report, the incremental re-read) is then answered by row-group
    * SKIPPING at scan time — files and row groups outside the range are
    * never decompressed. The third leg of the layout story next to daily
    * partitioning (coarse pruning) and bucketing (co-located joins):
    * partition for the coarse cut, sort for the fine cut. SinkSpec measures
    * the effect directly: the same range filter reads orders of magnitude
    * fewer rows off a sorted layout than an unsorted one. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  files: Int = 32): Unit = {
    val cols = sortCols.map(df.col)
    df.repartitionByRange(files, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** 2-D Morton (Z-order) key: interleaves the low 16 bits of two
    * non-negative integer columns (classic magic-mask bit spread — five
    * codegen'd bitwise ops per dimension, no UDF, no custom expression)
    * so rows close in BOTH dimensions land close in ONE sort order.
    * Callers quantize their natural domains to 16 bits first (a day
    * index, a user bucket); the z-value itself is never stored or
    * filtered on — it only drives layout, the scan still prunes on the
    * NATURAL columns' row-group min/max. */
  def zValue2(a: Column, b: Column): Column = {
    def spread(c: Column): Column = {
      val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
      val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
      x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** 3-D Morton key: interleaves the low 21 bits of three non-negative
    * integer columns (every third bit position), the same magic-mask
    * spread as [[zValue2]] with 3-way constants. The canonical production
    * clustering is exactly three dims — time × region × key — and the
    * 63-bit result still fits a signed long. */
  def zValue3(a: Column, b: Column, c: Column): Column = {
    def spread(x: Column): Column = {
      val x0 = x.cast("long").bitwiseAND(lit(0x1FFFFFL))
      val x1 = x0.bitwiseOR(shiftleft(x0, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
      val x4 = x3.bitwiseOR(shiftleft(x3, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
      x4.bitwiseOR(shiftleft(x4, 2)).bitwiseAND(lit(0x1249249249249249L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1)).bitwiseOR(shiftleft(spread(c), 2))
  }

  /** Z-ordered layout: the multi-dimensional extension of [[writeSorted]]
    * (Delta/Iceberg's OPTIMIZE ZORDER re-expressed as plain Spark).
    * A 1-D range sort gives ONE column tight row-group min/max; a query
    * bounding a DIFFERENT column skips nothing. Z-order clusters on the
    * Morton interleave of two quantized dimensions, so every file/row
    * group covers a small TILE of the (a, b) plane and carries tight
    * stats on BOTH natural columns — a predicate on either (or both)
    * skips at scan time. The z-expression drives `repartitionByRange` +
    * `sortWithinPartitions` directly and is never materialized into the
    * output. At 100 TB this is the difference between "time-bounded
    * queries are cheap" and "time-OR-key-bounded queries are cheap"
    * from one copy of the table.
    *
    * Dimensions are RANGE-QUANTIZED to the 16-bit Morton domain from
    * their actual min/max (one map-side-combined agg + a two-value
    * driver collect — the same stats pass Delta's OPTIMIZE runs), so
    * callers pass natural columns and the layout is correct at ANY
    * domain width. Passing a raw wide column through [[zValue2]]'s
    * `& 0xFFFF` would alias distant values into the same tile and
    * silently void the clustering — exactly the failure mode the
    * quantization exists to prevent. */
  def writeZOrdered(df: DataFrame, path: String, dimA: Column, dimB: Column,
                    files: Int = 32): Unit = {
    val Seq(qa, qb) = quantized(df, Seq(dimA, dimB), bits = 16)
    writeByZ(df, path, zValue2(qa, qb), files)
  }

  /** Three-dimensional [[writeZOrdered]] — time × region × key, the
    * clustering a 100 TB fact table actually wants. Same stats-pass
    * quantization, 21 bits per dimension through [[zValue3]]. */
  def writeZOrdered3(df: DataFrame, path: String, dimA: Column, dimB: Column,
                     dimC: Column, files: Int = 32): Unit = {
    val Seq(qa, qb, qc) = quantized(df, Seq(dimA, dimB, dimC), bits = 21)
    writeByZ(df, path, zValue3(qa, qb, qc), files)
  }

  /** Range-quantize each dimension to `bits` from its actual min/max —
    * one map-side-combined agg, one 2·N-value driver collect. Constant
    * dimensions (hi == lo) quantize to 0 rather than dividing by zero. */
  private def quantized(df: DataFrame, dims: Seq[Column], bits: Int): Seq[Column] = {
    val aggs = dims.flatMap(d => Seq(min(d).cast("double"), max(d).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val maxQ = ((1L << bits) - 1).toDouble
    dims.zipWithIndex.map { case (d, i) =>
      val lo = Option(row.get(2 * i)).fold(0.0)(_.asInstanceOf[Double])
      val hi = Option(row.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double])
      if (hi <= lo) lit(0L)
      else floor((d.cast("double") - lit(lo)) * lit(maxQ / (hi - lo))).cast("long")
    }
  }

  private def writeByZ(df: DataFrame, path: String, z: Column, files: Int): Unit =
    df.repartitionByRange(files, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)

  /** The composed lake layout a production table actually uses: daily
    * partition directories for the COARSE cut (partition pruning removes
    * whole days from the file listing, before any I/O) + range-sorted rows
    * WITHIN each partition for the FINE cut (every parquet row group
    * carries tight min/max on `sortCols`, so an intra-day predicate skips
    * row groups at scan time). The two prunes multiply: a "last hour of
    * one day" query off a 100 TB table lists one directory and
    * decompresses a handful of row groups (reference base_assets.py:150
    * writes the daily objects; report.py:37 bounds reads by a time
    * window — this layout serves both from one copy).
    *
    * One `repartitionByRange(files, partitionCol +: sortCols)` drives
    * BOTH properties: tasks own contiguous (partition, sort-key) ranges,
    * so each day's files come from at most a couple of tasks (no
    * tasks×days small-file explosion) and `sortWithinPartitions` orders
    * rows inside every file. Dynamic overwrite keeps the daily-reload
    * idempotence of [[writePartitioned]]: re-materializing a day replaces
    * exactly that day's directory. */
  def writePartitionedSorted(df: DataFrame, path: String, partitionCol: String,
                             sortCols: Seq[String], files: Int = 32): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val cols = (partitionCol +: sortCols).map(df.col)
    df.repartitionByRange(files, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(path)
  }

  /** Deterministic shard assignment for [[exportShards]]: the first 4 hex
    * digits of md5(id) mod nShards — pure key arithmetic, so it replays
    * bit-for-bit in any engine (the same trick as the token_budget_sample
    * draw order) and re-running the export moves NOTHING. */
  def shardAssign(idCol: Column, nShards: Int): Column =
    conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10)
      .cast("long") % nShards

  /** Training-shard export — the last step of a curation pipeline: a
    * DETERMINISTIC global shuffle of the corpus into `nShards` fixed
    * shards, one file per shard, each shard internally ordered by the
    * md5 draw key (documents that sat adjacent in the lake end up spread
    * across shards and positions — the "shuffle your training data"
    * contract, reproducible run over run because the permutation is pure
    * key arithmetic, not an RNG).
    *
    * Writes `partitionBy(shard)` parquet and returns the MANIFEST read
    * back from the WRITTEN tree (never from the input plan): per shard,
    * doc count, whitespace-token count, and an order-insensitive content
    * checksum (sum of md5-prefix values mod 1e9+7 — modular so a
    * billion-row shard cannot overflow the Long sum under ANSI). A
    * training job consumes shards by manifest; the checksum pins that
    * what landed on disk is what the source held.
    *
    * Scale shape: one hash shuffle on the shard id (every row of a shard
    * lands in one task — `repartition(col)` guarantees co-location, so
    * each shard directory gets exactly one file), one sort within each
    * task, and the manifest aggregation map-side-combines to nShards
    * rows. nShards bounds file count AND per-task memory: size it so
    * corpus/nShards fits a task's spill budget (at 100 TB and 4096
    * shards that's ~25 GB/shard — an external sort, which Spark's task
    * sort handles by spilling; push nShards up to trade file count for
    * task memory). */
  def exportShards(spark: SparkSession, df: DataFrame, path: String,
                   nShards: Int, idCol: String, textCol: String): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val keyed = df
      .withColumn("shard", shardAssign(col(idCol), nShards))
      .withColumn("__order", md5(col(idCol).cast("string")))
    // sort leads with the partition column: FileFormatWriter REQUIRES
    // task rows ordered by partition cols (a hash task can hold several
    // shards) and injects its own non-order-preserving sort when the
    // incoming order doesn't already satisfy that — leading with `shard`
    // makes the one sort here serve both the writer's requirement and
    // the draw order
    keyed
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__order"))
      .drop("__order")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(filter(split(col(textCol), "\\s+"), w => w =!= "")))
          .cast("long").as("n_tokens"),
        sum(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long") % 1000000007L).as("checksum"))
  }

  /** Packed-token-stream export — the seam between curation and training
    * closed: the (shard, seq_id, pos, token_id) stream a training job
    * memory-maps, landed as one parquet file per shard with rows in
    * stream order, plus a MANIFEST recomputed from the WRITTEN tree
    * (the [[exportShards]] contract: what the manifest pins is what is
    * on disk, not what the input plan promised).
    *
    * The manifest checksum is position-weighted — Σ (pos+1)·token_id
    * mod 1e9+7 — so it pins every token to its stream position: a
    * swapped pair, a shifted sequence, or a dropped token each flip it.
    * Per-row mod keeps the running Long sum safe under ANSI to ~1e9
    * rows per shard (same bound as [[exportShards]]'s checksum; size
    * nShards to stay under it).
    *
    * Scale shape: one hash shuffle on the shard id (repartition by the
    * column guarantees each shard directory gets exactly one file), one
    * in-task sort leading with the partition column so FileFormatWriter
    * injects no second sort, and the manifest aggregation
    * map-side-combines to nShards rows. */
  def exportTokenStream(spark: SparkSession, stream: DataFrame,
                        path: String): DataFrame = {
    // segment-aware extension (D29c): a stream carrying `seg_id` (the
    // per-token document-boundary column an attention mask consumes)
    // lands it beside token_id, and the manifest grows two columns —
    // per-shard segment count and a position-weighted SEGMENT checksum
    // (same Σ (pos+1)·x mod p construction as the token checksum), so a
    // dropped or shifted document boundary flips the manifest even when
    // every token survived. Streams without the column keep the original
    // 4-column manifest bit-for-bit.
    val hasSegs = stream.columns.contains("seg_id")
    stream
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq_id"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val base = spark.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
    if (hasSegs)
      base.agg(
        countDistinct(col("seq_id")).as("n_seqs"),
        count(lit(1)).as("n_tokens"),
        sum((col("pos") + 1L) * col("token_id") % 1000000007L)
          .cast("long").as("checksum"),
        countDistinct(col("seq_id"), col("seg_id")).as("n_segments"),
        sum((col("pos") + 1L) * col("seg_id") % 1000000007L)
          .cast("long").as("seg_checksum"))
    else
      base.agg(
        countDistinct(col("seq_id")).as("n_seqs"),
        count(lit(1)).as("n_tokens"),
        sum((col("pos") + 1L) * col("token_id") % 1000000007L)
          .cast("long").as("checksum"))
  }

  /** Dynamic-partition overwrite of `staged` (already materialized — its
    * plan must NOT read `path`) into a `partCol`-partitioned lake, then
    * delete the `touched` partition directories the staged data emptied:
    * dynamic overwrite only replaces partitions PRESENT in the written
    * data, so an emptied partition's stale directory would otherwise
    * resurrect dropped rows on the next read. The partial-rewrite
    * primitive the incremental state lakes share (refreshInPlace's write
    * discipline, factored). */
  private[graft] def overwritePartitions(spark: SparkSession, path: String,
      partCol: String, touched: Iterable[Int], staged: DataFrame,
      sortCols: Seq[Column] = Nil): Unit = {
    val written = staged.select(partCol).distinct()
      .collect().map(_.getInt(0)).toSet
    // per-WRITER overwrite mode, not a session-conf flip: the session conf
    // is shared mutable state, and the stream gates now run independent
    // lake overwrites concurrently (guide §2.6) — two threads racing a
    // set/restore of the session value could leak "dynamic" into an
    // unrelated full overwrite. The DataFrameWriter option scopes the mode
    // to exactly this write.
    staged.repartition(col(partCol))
      // leading with the partition column makes FileFormatWriter's
      // required ordering explicit (it would inject this sort anyway);
      // callers add payload sort keys for in-file row order
      .sortWithinPartitions(col(partCol) +: sortCols: _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(path)
    val conf = spark.sessionState.newHadoopConf()
    touched.filterNot(written).foreach { v =>
      val dir = new Path(s"$path/$partCol=$v")
      dir.getFileSystem(conf).delete(dir, true): Unit
    }
  }

  /** Idempotent micro-batch append for foreachBatch sinks: the batch's
    * rows land in the batchId-named partition dir `batch=<id>` under
    * `outDir`, written to a hidden sibling staging dir first and renamed
    * into place. Structured Streaming's replay unit IS the batchId — a
    * micro-batch that fails after a partial write (or completes but loses
    * its offset commit) replays under the SAME id with the SAME rows (the
    * file source pins the batch's files in the checkpoint offset log), so
    * the delete+rename lands the identical output on the identical
    * directory: the lake holds exactly ONE copy of every batch's rows
    * however many times delivery was attempted. Exactly-once lake
    * contents on top of at-least-once execution — the mechanics of Delta/
    * Iceberg's idempotent streaming writes, reduced to the directory-
    * rename commit this lake already uses ([[upsertPartitioned]]'s
    * contract: atomic rename on HDFS/local, copy-commit on object
    * stores; single writer, and a concurrent reader can see the batch
    * dir mid-swap — reader-snapshot isolation needs a manifest format).
    * Per-batch cost is constant in the lake's size (one staged write +
    * one rename), unlike a keyed MERGE whose read-merge-rewrite grows
    * with the table — the property that keeps a serving stream viable
    * when the accumulated lake is 100 TB. Readers discover `batch` as an
    * ordinary Spark partition column: the delivery ledger comes free. */
  def writeBatchStamped(batch: DataFrame, outDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = fileSystem(spark, outDir)
    val staging = new Path(outDir.stripSuffix("/") + s"__stage_batch_$batchId")
    fs.delete(staging, true)
    batch.write.mode("overwrite").parquet(staging.toString)
    val tableDir = new Path(outDir)
    fs.mkdirs(tableDir)
    val target = new Path(tableDir, s"batch=$batchId")
    fs.delete(target, true)
    rename(fs, staging, target)
  }

  /** Drop a sink table (scratch/test lifecycles). Routed through the
    * session's Hadoop FileSystem so scheme-qualified lake paths work the
    * same as local ones; falls back to a default Hadoop configuration when
    * no session is alive (test teardown after spark.stop()). */
  def reset(path: String): Unit = {
    val conf = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val p = new Path(path)
    p.getFileSystem(conf).delete(p, true): Unit
  }

  /** Run MUTUALLY INDEPENDENT Spark actions concurrently from a bounded
    * daemon pool and rethrow the first failure unwrapped (guide §2.6:
    * actions are only sequential because the driver calls them
    * sequentially — overlapping independent jobs lets the next job's
    * tasks back-fill the cores the previous job's straggler tail leaves
    * idle, and at local bench scale it collapses N serial
    * planning/listing roundtrips into max(N)). Nothing here orders
    * effects BETWEEN tasks, so callers own the independence proof: no
    * task may read a path another task writes. Spark's scheduler runs
    * concurrent jobs FIFO and its session/catalog are thread-safe for
    * action submission; job-description thread-locals are not inherited,
    * which only affects UI labels. */
  private[graft] def inParallel(tasks: Seq[() => Unit]): Unit =
    if (tasks.sizeIs <= 1) tasks.foreach(_.apply())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        tasks.size,
        (r: Runnable) => {
          val t = new Thread(r, "graft-par"); t.setDaemon(true); t
        })
      try {
        val fs = tasks.map { t =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = t()
          })
        }
        try fs.foreach(_.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      } finally { pool.shutdown(): Unit }
    }

  private def fileSystem(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** FileSystem.rename reports failure by returning false (e.g. a missing
    * parent on HDFS) — surface that instead of silently dropping a commit
    * step. */
  private def rename(fs: FileSystem, from: Path, to: Path): Unit =
    require(fs.rename(from, to), s"rename failed: $from -> $to")
}
