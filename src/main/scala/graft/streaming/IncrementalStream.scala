package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Incremental
import graft.sources.Sink

/** The incremental corpus refresh ACTUALLY STREAMING — the production
  * shape of the [[Incremental]] loop: a crawler emits delta waves
  * (doc_id, op, text; op ∈ upsert|delete) as files into a landing
  * directory, and each micro-batch advances THREE pieces of carried
  * state, all delta-bound:
  *
  *   1. the RAW corpus lake (`rawPath`, shard-partitioned by the same
  *      doc-keyed routing as the packed lake): only shard directories
  *      the wave touches are rewritten (dynamic partition overwrite,
  *      emptied dirs deleted) — the wave's upserts replace, its deletes
  *      drop, everyone else's directory is never opened;
  *   2. the PACKED lake (`packedPath`): [[Incremental.refreshInPlace]] —
  *      delta-only text work, ledger-recomputed membership, affected
  *      shards only;
  *   3. the LEDGER (`ledgerPath`): the returned next-refresh state,
  *      rolled forward through a staging hop (it reads its own path).
  *
  * The file-source checkpoint carries the cursor, so a re-run drains
  * only unseen waves (exactly-once per wave); `Trigger.AvailableNow`
  * with `maxFilesPerTrigger = 1` forces each delivery file through its
  * own micro-batch. Because every refresh provably equals the batch
  * rebuild over its corpus version (the [[Incremental]] contract), the
  * final lake is the batch rebuild over the final version NO MATTER how
  * the delta was split into waves — which is exactly what the
  * `stream_incremental` gate's oracle (the incremental_sink rebuild
  * replay) checks.
  *
  * Scale shape per micro-batch: everything [[Incremental.refreshInPlace]]
  * guarantees, plus raw-lake maintenance bounded by the wave's touched
  * shards. No stage anywhere re-reads, re-shuffles, or rewrites the
  * untouched corpus mass.
  */
object IncrementalStream {

  /** Bootstrap the three state locations from corpus version 0: raw lake
    * shard-partitioned by `docShard`, packed lake via
    * [[Incremental.writePacked]], ledger as plain parquet. */
  def bootstrap(docs: DataFrame, rawPath: String, packedPath: String,
                ledgerPath: String, idCol: String, textCol: String,
                keep: Column => Column, maxTokens: Int, overlap: Int,
                budget: Long, shards: Int, docShard: Column => Column): Unit = {
    // three independent lake writes (distinct paths, none reading
    // another's output) — overlapped per guide §2.6
    Sink.inParallel(Seq(
      () => docs.select(col(idCol), col(textCol),
          docShard(col(idCol)).cast("int").as("__shard"))
        .repartition(col("__shard"))
        .write.mode("overwrite").partitionBy("__shard").parquet(rawPath),
      () => Incremental.writePacked(
        Incremental.batch(docs, idCol, textCol, keep,
          maxTokens, overlap, budget, shards, docShard),
        packedPath),
      () => Incremental.ledger(docs, idCol, textCol, keep)
        .write.mode("overwrite").parquet(ledgerPath)))
  }

  /** Advance the raw corpus lake by one wave: rewrite ONLY the shard
    * directories the wave touches (upserts replace by id, deletes drop),
    * delete the ones the wave emptied. Mirrors
    * [[Incremental.refreshInPlace]]'s write discipline. */
  private[streaming] def advanceRaw(spark: SparkSession, rawPath: String,
                         wave: DataFrame, idCol: String, textCol: String,
                         docShard: Column => Column): Unit = {
    val prev = spark.read.parquet(rawPath)
    val ids = wave.select(col(idCol)).distinct()
    val touched = wave
      .select(docShard(col(idCol)).cast("int").as("__shard")).distinct()
      .collect().map(_.getInt(0))
    val newRows = prev
      .filter(col("__shard").isin(touched.map(Integer.valueOf): _*))
      .join(broadcast(ids), Seq(idCol), "left_anti")
      .unionByName(wave.filter(col("op") =!= "delete")
        .select(col(idCol), col(textCol),
          docShard(col(idCol)).cast("int").as("__shard")))
    val staging = s"$rawPath.wave-staging"
    newRows.write.mode("overwrite").parquet(staging)
    // shared partial-rewrite primitive: dynamic overwrite + emptied-shard
    // directory deletes (Sink.overwritePartitions)
    Sink.overwritePartitions(spark, rawPath, "__shard", touched.toSeq,
      spark.read.parquet(staging))
    Sink.reset(staging)
  }

  /** Drain the landing directory: one micro-batch per delivery file, each
    * applying one wave to (raw, packed, ledger). `schema` must carry
    * (idCol, op, textCol). */
  def refreshStream(spark: SparkSession, landingDir: String,
                    schema: StructType, rawPath: String, packedPath: String,
                    ledgerPath: String, checkpointDir: String,
                    idCol: String, textCol: String,
                    keep: Column => Column, maxTokens: Int, overlap: Int,
                    budget: Long, shards: Int, docShard: Column => Column)
      : StreamingQuery =
    spark.readStream
      .schema(schema)
      // DELIBERATELY not a knob: wave rows carry no ordering column, so a
      // trigger that merged two delivery files would apply their ops
      // unordered — an upsert file followed by a delete file of the same
      // id would RESURRECT the doc (advanceRaw keeps the upsert row), and
      // two upserts would both survive the union as duplicate id rows.
      // One file per micro-batch is what makes "last file wins" true.
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the wave is read several times (raw advance, delta ids) and
        // must not re-pull from the stream source mid-handler
        val wave = batch.localCheckpoint()
        if (!wave.isEmpty) {
          advanceRaw(spark, rawPath, wave, idCol, textCol, docShard)
          val curr = spark.read.parquet(rawPath)
            .select(col(idCol), col(textCol))
          val prevLedger = spark.read.parquet(ledgerPath)
          val newLedger = Incremental.refreshInPlace(
            prevLedger, packedPath, curr, wave.select(col(idCol)),
            idCol, textCol, keep, maxTokens, overlap, budget, shards,
            docShard)
          // the ledger reads its own path — stage-hop the rollforward
          val lst = s"$ledgerPath.staging"
          newLedger.write.mode("overwrite").parquet(lst)
          spark.read.parquet(lst)
            .write.mode("overwrite").parquet(ledgerPath)
          Sink.reset(lst)
        }
      }
      .start()
}
