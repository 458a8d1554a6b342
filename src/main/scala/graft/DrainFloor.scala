package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The r20 answer to "can the stream gates' per-wave cost shrink?":
  * price Spark's OWN micro-batch machinery with a no-op AvailableNow
  * drain, so the stream_scrub/stream_incremental fixed term (72-73% of
  * wall by the r19 attribution probe) decomposes into
  *   (a) bare lifecycle — readStream plan + checkpoint bootstrap +
  *       one trivial micro-batch + stop (NOTHING graft-authored inside),
  *   (b) checkpoint RESUME with zero new data (the second-wave floor),
  * versus the gates' measured per-wave numbers. If (a)+(b) accounts for
  * the bulk, the floor is Spark's machinery, not graft code — the
  * verdict's stop-tracking criterion. Prints one JSON line.
  *
  * Usage: runMain graft.DrainFloor [reps=3]
  */
object DrainFloor {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-drainfloor")
      .toFile.getAbsolutePath
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id long, v long")

    def drain(landing: String, ckpt: String): Unit =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.queryExecution.toRdd.count(): Unit
        }
        .start().awaitTermination()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // JIT/codegen warmup lifecycle, unmeasured (the gates bill steady
    // state — their warmup ran at sf0.001)
    locally {
      val w = s"$root/warm"
      Seq((1L, 1L)).toDF("id", "v").write.parquet(s"$w/landing")
      drain(s"$w/landing", s"$w/ckpt")
    }

    // the steal sample brackets the MEASURED reps (review catch, r20: the
    // first cut sampled after the loop, stamping an empty window — the
    // probe could not actually certify its own weather)
    val w0 = GraftSession.HostWeather.sample()
    val rows = (1 to reps).map { r =>
      val base = s"$root/r$r"
      Seq((1L, 1L)).toDF("id", "v").coalesce(1)
        .write.parquet(s"$base/landing")
      // (a) cold lifecycle: fresh checkpoint, one 1-row micro-batch
      val cold = time(drain(s"$base/landing", s"$base/ckpt"))
      // (b) resume lifecycle: same checkpoint, NO new data — the pure
      // "second wave arrives empty" machinery term
      val resume = time(drain(s"$base/landing", s"$base/ckpt"))
      // (c) resume with one new file — the gates' actual second-wave
      // shape minus all graft state-refresh work
      Seq((2L, 2L)).toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(s"$base/landing")
      val resumeData = time(drain(s"$base/landing", s"$base/ckpt"))
      (cold, resume, resumeData)
    }
    val best = (rows.map(_._1).min, rows.map(_._2).min, rows.map(_._3).min)
    val stealJson = GraftSession.HostWeather.json(w0, GraftSession.HostWeather.sample())
    println(f"""{"probe":"drain_floor","cold_best":${best._1}%.3f,"resume_empty_best":${best._2}%.3f,"resume_1file_best":${best._3}%.3f,"reps":$reps,"cold_all":[${rows.map(r => f"${r._1}%.3f").mkString(",")}],"resume_empty_all":[${rows.map(r => f"${r._2}%.3f").mkString(",")}],"resume_1file_all":[${rows.map(r => f"${r._3}%.3f").mkString(",")}],"steal_pct":$stealJson}""")
    spark.stop()
  }
}
