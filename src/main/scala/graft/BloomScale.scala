package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bloom, Dedup}

/** Scale probe for the Bloom novelty tier (D15c): measures the claim the
  * sf-gate slices cannot — the exact gate re-shuffles the CORPUS hash
  * projection for every arriving batch, while the Bloom tier builds its
  * constant-shuffle filter ONCE per corpus refresh and then answers each
  * batch with a map-only probe plus an anti-join over only the positive
  * sliver. The honest comparison is therefore amortized: B batches
  * against one corpus,
  *
  *   exact:  B × novelDocs(batch_i, corpus)
  *   bloom:  1 × build(corpus) + B × (probe + positives-only anti-join)
  *
  * with the corpus the FULL documents table (50k docs at sf1), batches
  * drawn as planted re-crawls (jittered dups) + novel synthetics.
  *
  * Usage: runMain graft.BloomScale [sfDir] [nBatches]
  * Prints one JSON line: per-arm wall seconds and verdict-equality check.
  */
object BloomScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val corpus = sources.Tables.documents(spark, sfDir).select("doc_id", "text")
    val nCorpus = corpus.count()
    // batch b: 500 exact re-crawls (dup — must NOT be novel) + 500 novel
    // docs, disjoint across batches via id arithmetic
    def batch(b: Int): DataFrame = {
      val dups = corpus.filter(col("doc_id") % 97 === b)
        .limit(500)
        .select((col("doc_id") + 10000000L * (b + 1)).as("doc_id"), col("text"))
      val novel = spark.range(500)
        .select((col("id") + 20000000L * (b + 1)).as("doc_id"),
          concat(lit(s"novel batch $b doc "), col("id"),
            lit(" wholly fresh content")).as("text"))
      dups.unionByName(novel)
    }
    val batchDfs = (0 until batches).map(batch)

    // per-arm wall time AND total shuffle-write records: wall clock on a
    // single host with a memory-cached corpus understates the exact arm's
    // true cost — at cluster scale the per-batch corpus SHUFFLE is the
    // bottleneck, and records measure exactly that
    val shuffleAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = ev.stageInfo.taskMetrics
          if (m != null) shuffleAcc.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      })
    def time[A](f: => A): (A, Double, Long) = {
      Thread.sleep(1000) // drain pending listener events into the other arm
      val s0 = shuffleAcc.get()
      val t0 = System.nanoTime(); val a = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      (a, sec, shuffleAcc.get() - s0)
    }

    // warmup both paths at tiny scale
    Dedup.novelDocs(batchDfs.head.limit(50), corpus.limit(50), "text", "doc_id").count()
    Bloom.novelDocsBloom(batchDfs.head.limit(50), corpus.limit(50), "text", "doc_id",
      bitsPerShard = 4096, k = 5).count()

    // ---- exact arm: every batch pays the corpus anti-join -------------
    val (exactCounts, exactSec, exactShuffle) = time {
      batchDfs.map(b => Dedup.novelDocs(b, corpus, "text", "doc_id").count())
    }

    // ---- bloom arm: one build, B probes -------------------------------
    // fixed 65,536-bit shards, however many the corpus needs — growing
    // the shard count (not the per-shard array) keeps assembly linear
    val (bitsPerShard, shards) = Bloom.sized(nCorpus, bitsPerKey = 10)
    def bloomArm(probeGateBits: Long): Seq[Long] = {
      val seen = corpus.select(md5(col("text")).as("__h")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val filter = Bloom.build(seen, "__h", bitsPerShard, k = 5, shards)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      filter.count() // materialize the refresh ONCE
      val counts = batchDfs.map { b =>
        val probed = Bloom.probe(
          Dedup.exactByHash(b, "text", "doc_id").withColumn("__h", md5(col("text"))),
          filter, "__h", bitsPerShard, 5, shards, broadcastMaxBits = probeGateBits)
        val definitely = probed.filter(!col("__might_contain"))
        // flipped verify, as in novelDocsBloom: corpus side streams
        // map-only against the broadcast positive-hash sliver
        val positives = probed.filter(col("__might_contain"))
        val matched = seen.join(
          broadcast(positives.select("__h").distinct()), Seq("__h"), "left_semi")
        val falsePos = positives.join(broadcast(matched), Seq("__h"), "left_anti")
        definitely.unionByName(falsePos).count()
      }
      seen.unpersist(); filter.unpersist()
      counts
    }
    val (bloomCounts, bloomSec, bloomShuffle) = time { bloomArm(Long.MaxValue) }
    // the over-threshold probe path (filter too big to broadcast — the
    // 100 TB shape, forced here with a 1-bit gate): batch shuffles by
    // shard, shuffled-hash join against the filter-as-data
    val (joinCounts, joinSec, joinShuffle) = time { bloomArm(1L) }

    val agree = exactCounts == bloomCounts && bloomCounts == joinCounts
    println(s"""{"probe":"bloom_scale","sf":"$sfDir","n_corpus":$nCorpus,""" +
      s""""batches":$batches,"exact_sec":${f"$exactSec%.2f"},""" +
      s""""bloom_sec":${f"$bloomSec%.2f"},"bloom_join_sec":${f"$joinSec%.2f"},""" +
      s""""exact_shuffle_records":$exactShuffle,""" +
      s""""bloom_shuffle_records":$bloomShuffle,""" +
      s""""bloom_join_shuffle_records":$joinShuffle,""" +
      s""""bits_per_shard":$bitsPerShard,"shards":$shards,""" +
      s""""verdicts_agree":$agree,"novel_per_batch":${exactCounts.head}}""")
    spark.stop()
  }
}
