package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** Scale probe for the D31 scoring join's skew claim: the operator docs
  * say hot bigrams ("the the") are handled by AQE skew splitting once the
  * model side is too big to broadcast — this probe MEASURES that rule
  * firing instead of trusting it (the CapScale "trust the rule, then
  * verify the rule" discipline).
  *
  * Pathology: every document gets a planted run of the same token
  * appended, so one bigram key (zq,zq) carries a constant fraction of the
  * whole stream — the zipfian head every real corpus has. Broadcast is
  * disabled (static and adaptive thresholds −1) to emulate corpus scale,
  * where the model outgrows the driver and the join is sort-merge; the
  * AQE skew thresholds are shrunk proportionally (256 MB of hot partition
  * at cluster scale ≈ a few MB at probe scale — the RATIO is what's being
  * probed, not the absolute byte bar).
  *
  * Arms: identical query with spark.sql.adaptive.skewJoin.enabled on vs
  * off. The signal is the MAX per-task shuffle-read row count in the
  * scoring stages — the straggler a cluster actually waits on: with the
  * split, the hot key's reads spread over many tasks; without, one task
  * reads the whole head. Wall time moves less on a warm local[NN] host
  * (every "executor" shares one heap), so the row-mass metric is primary
  * — the IncrScale shuffle-records discipline. Arms-equal content
  * checksum computed under EACH config.
  *
  * Usage: runMain graft.LmSkewScale [sfDir] [hotTokensPerDoc]
  * Prints one JSON line.
  */
object LmSkewScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val hotPerDoc = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // corpus-scale emulation: no broadcast joins (the model side would
    // not fit a driver at 100 TB), skew bars scaled down to probe bytes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")

    val hotTail = " " + Seq.fill(hotPerDoc)("zq").mkString(" ")
    val target = sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), concat(col("text"), lit(hotTail)).as("text"))
    // model trained once, persisted — both arms measure the SCORING join
    // only, the serving shape
    val (m, margins, vocab) = NgramLm.servingFrames(target, "doc_id", "text")
    Seq(m, margins, vocab).foreach(_.persist().count())

    val n = target.count()
    // per-task shuffle-read straggler tracker
    val maxRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            ev: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val tm = ev.taskMetrics
          if (tm != null) {
            val r = tm.shuffleReadMetrics.recordsRead
            var cur = maxRead.get()
            while (r > cur && !maxRead.compareAndSet(cur, r))
              cur = maxRead.get()
          }
        }
      })
    def settle(): Unit = { // drain the async listener bus (CapScale)
      var prev = -1L; var same = 0
      while (same < 3) {
        Thread.sleep(200)
        val v = maxRead.get()
        if (v == prev) same += 1 else { same = 0; prev = v }
      }
    }
    def run(): (Long, Int) = {
      val df = NgramLm.scoreWithModel(target, m, margins, vocab,
        "doc_id", "text")
      val rows = df.queryExecution.toRdd.count()
      // proof the rule FIRED, not just that wall time moved: count the
      // skew=true markers in the finalized adaptive plan
      val skews = "skew=true".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
      (rows, skews)
    }
    def checksum(): (Long, Long) = {
      val r = NgramLm.scoreWithModel(target, m, margins, vocab, "doc_id", "text")
        .agg(sum(pmod(xxhash64(col("doc_id"), col("logprob_sum")),
          lit(1000000007L))).as("h"), count(lit(1)).as("n")).collect()(0)
      (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
    }
    def arm(skew: Boolean): (Double, Long, Int, Long, (Long, Long)) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
      run(): Unit // warm
      settle(); maxRead.set(0L)
      val t0 = System.nanoTime(); val (rows, skews) = run()
      val sec = (System.nanoTime() - t0) / 1e9
      settle()
      (sec, rows, skews, maxRead.get(), checksum())
    }
    val (tOn, rowsOn, skewsOn, readOn, sumOn) = arm(skew = true)
    val (tOff, rowsOff, skewsOff, readOff, sumOff) = arm(skew = false)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val equal = rowsOn == rowsOff && sumOn == sumOff
    println(
      f"""{"probe":"lm_skew_scale","corpus":$n,"hot_per_doc":$hotPerDoc,"skew_sec":$tOn%.2f,"no_skew_sec":$tOff%.2f,"skew_nodes_on":$skewsOn,"skew_nodes_off":$skewsOff,"max_task_read_skew":$readOn,"max_task_read_no_skew":$readOff,"rows":$rowsOn,"equal":$equal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
