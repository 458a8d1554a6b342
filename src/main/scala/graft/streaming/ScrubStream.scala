package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.IncrementalScrub
import graft.sources.Sink

/** The frequency-delta scrub refresh ACTUALLY STREAMING — the
  * [[IncrementalStream]] loop extended to the stage whose state is not
  * per-document. Each checkpointed micro-batch applies one crawler wave
  * (doc_id, op, text) to FOUR state lakes, every rewrite delta-bound:
  *
  *   1. the RAW corpus lake — [[IncrementalStream.advanceRaw]]'s
  *      touched-shard rewrite;
  *   2. the WINDOW POSTING INDEX (`winsPath`, partitioned by the doc-keyed
  *      shard): a wave changes only its own docs' window rows, so only
  *      the wave ids' shard directories rewrite;
  *   3. the FREQUENCY TABLE (`dfPath`, partitioned by a whash bucket):
  *      only buckets holding a net-adjusted hash rewrite — the
  *      delta-bound `dfTouched`/`dfUpdated` parts of
  *      [[IncrementalScrub.refreshParts]];
  *   4. the SCRUB OUTPUT lake (`scrubPath`, doc-keyed shards): only
  *      shards holding a removed doc or a re-scrubbed doc (wave ids plus
  *      holders of threshold-crossing windows — the honest ripple cost)
  *      rewrite.
  *
  * All replacement row-sets are STAGED (materialized to scratch parquet)
  * before any lake is overwritten: the refresh plan reads the pre-wave
  * lakes, so an in-place overwrite mid-plan would corrupt its own
  * inputs. The refresh compute itself is [[IncrementalScrub.refresh]] —
  * provably equal to the batch spanScrub over the wave's corpus version
  * — so the drained scrub lake equals the batch scrub of the final
  * version no matter the wave split (the `stream_scrub` gate's oracle).
  */
object ScrubStream {

  /** Bootstrap the four lakes from corpus version 0. */
  def bootstrap(docs: DataFrame, rawPath: String, winsPath: String,
                dfPath: String, scrubPath: String,
                idCol: String, textCol: String, window: Int, minDf: Int,
                hashBuckets: Int, docShard: Column => Column): Unit = {
    val spark = docs.sparkSession
    docs.select(col(idCol), col(textCol),
        docShard(col(idCol)).cast("int").as("__shard"))
      .repartition(col("__shard"))
      .write.mode("overwrite").partitionBy("__shard").parquet(rawPath)
    val st = IncrementalScrub.state(docs, idCol, textCol, window, minDf)
    st.wins.withColumn("__shard", docShard(col("id")).cast("int"))
      .repartition(col("__shard"))
      .write.mode("overwrite").partitionBy("__shard").parquet(winsPath)
    st.df.withColumn("__hbkt",
        pmod(col("whash"), lit(hashBuckets.toLong)).cast("int"))
      .repartition(col("__hbkt"))
      .write.mode("overwrite").partitionBy("__hbkt").parquet(dfPath)
    st.scrubbed.withColumn("__shard", docShard(col("id")).cast("int"))
      .repartition(col("__shard"))
      .write.mode("overwrite").partitionBy("__shard").parquet(scrubPath)
    graft.operators.Dedup.unpersistIntermediates()
    spark.catalog.clearCache(): Unit
  }

  /** The carried state read back off the lakes (partition columns
    * dropped — [[IncrementalScrub.State]] frames carry logical columns
    * only). */
  def readState(spark: SparkSession, winsPath: String, dfPath: String,
                scrubPath: String): IncrementalScrub.State =
    IncrementalScrub.State(
      spark.read.parquet(winsPath).select("id", "start", "whash"),
      spark.read.parquet(dfPath).select("whash", "df"),
      spark.read.parquet(scrubPath)
        .select("id", "scrubbed_text", "n_tokens", "n_removed"))

  /** Drain the landing directory: one micro-batch per delivery file, each
    * applying one wave to the four lakes. `schema` carries
    * (idCol, op, textCol). */
  def refreshStream(spark: SparkSession, landingDir: String,
                    schema: StructType, rawPath: String, winsPath: String,
                    dfPath: String, scrubPath: String, checkpointDir: String,
                    idCol: String, textCol: String, window: Int, minDf: Int,
                    hashBuckets: Int, docShard: Column => Column,
                    maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wave = batch.localCheckpoint()
        if (!wave.isEmpty) {
          IncrementalStream.advanceRaw(spark, rawPath, wave, idCol, textCol,
            docShard)
          val curr = spark.read.parquet(rawPath)
            .select(col(idCol), col(textCol))
          val prev = readState(spark, winsPath, dfPath, scrubPath)
          val parts = IncrementalScrub.refreshParts(prev, curr,
            wave.select(col(idCol)), idCol, textCol, window, minDf)

          // touched-partition sets, all delta-bound collects
          def ints(df: DataFrame): Array[Int] =
            df.distinct().collect().map(_.getInt(0))
          val winsTouched = ints(parts.dIds
            .select(docShard(col("id")).cast("int")))
          val dfTouchedBkts = ints(parts.dfTouched
            .select(pmod(col("whash"), lit(hashBuckets.toLong)).cast("int")))
          val scrubTouched = ints(parts.gone
            .select(docShard(col("id")).cast("int")))

          // replacement content per touched partition (reads the PRE-wave
          // lakes; no corpus-sized frame — the untouched partitions never
          // enter these plans)
          def inParts(c: Column, touched: Array[Int]): Column =
            c.isin(touched.map(Integer.valueOf): _*)
          val winsLake = spark.read.parquet(winsPath)
          val winsNew = winsLake
            .filter(inParts(col("__shard"), winsTouched))
            .join(broadcast(parts.dIds), Seq("id"), "left_anti")
            .unionByName(parts.newDeltaWins
              .withColumn("__shard", docShard(col("id")).cast("int")))
          val dfLake = spark.read.parquet(dfPath)
          val dfNew = dfLake
            .filter(inParts(col("__hbkt"), dfTouchedBkts))
            .join(broadcast(parts.dfTouched), Seq("whash"), "left_anti")
            .unionByName(parts.dfUpdated.withColumn("__hbkt",
              pmod(col("whash"), lit(hashBuckets.toLong)).cast("int")))
          val scrubLake = spark.read.parquet(scrubPath)
          val scrubNew = scrubLake
            .filter(inParts(col("__shard"), scrubTouched))
            .join(broadcast(parts.gone), Seq("id"), "left_anti")
            .unionByName(parts.rescrubbed
              .withColumn("__shard", docShard(col("id")).cast("int")))

          // stage ALL replacement sets before overwriting ANY lake: the
          // refresh plans read the pre-wave lakes, and rescrubbed reads
          // both the posting index and the frequency table
          val (ws, ds, ss) = (s"$winsPath.wave-staging",
            s"$dfPath.wave-staging", s"$scrubPath.wave-staging")
          winsNew.write.mode("overwrite").parquet(ws)
          dfNew.write.mode("overwrite").parquet(ds)
          scrubNew.write.mode("overwrite").parquet(ss)
          Sink.overwritePartitions(spark, winsPath, "__shard", winsTouched,
            spark.read.parquet(ws))
          Sink.overwritePartitions(spark, dfPath, "__hbkt", dfTouchedBkts,
            spark.read.parquet(ds))
          Sink.overwritePartitions(spark, scrubPath, "__shard", scrubTouched,
            spark.read.parquet(ss))
          Sink.reset(ws); Sink.reset(ds); Sink.reset(ss)
        }
      }
      .start()
}
