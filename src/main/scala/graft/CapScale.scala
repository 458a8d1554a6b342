package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Sample

/** Scale probe for the per-domain cap (D32): measures the skew claim the
  * sf gate cannot — a crawl's host distribution is zipfian, so HALF this
  * probe's corpus lands in one "mega" domain (the rest spreads over 1,000
  * tail hosts) and the capped window must not serialize on it.
  *
  * The operator's 100 TB story rests on Catalyst's `InferWindowGroupLimit`
  * rewriting the `row_number ≤ cap` filter into a map-side group-limit
  * below the exchange (each input partition ships ≤ cap rows per domain).
  * The probe runs the SAME query twice — rule present vs rule EXCLUDED
  * via spark.sql.optimizer.excludedRules — so the measured gap is exactly
  * what the optimization buys on the pathology, and an arms-equal check
  * pins that it is a pure optimization. (The operator's first cut
  * hand-rolled a two-phase salted ranking; this probe showed the salted
  * form ships cap·salts·P map-side survivors where the pruned single
  * window ships cap·P — the optimizer's form won and the operator was
  * simplified to trust it.)
  *
  * Usage: runMain graft.CapScale [sfDir] [cap]
  * Prints one JSON line incl. the arms-equal check.
  */
object CapScale {
  private val Rule =
    "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cap = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    // zipfian pathology: ~50% of docs in one mega-domain, rest over 1,000
    // tail hosts — deterministic from the id
    val docs = sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(pmod(xxhash64(col("doc_id")), lit(2L)) === 0L, lit("mega"))
          .otherwise(concat(lit("host"),
            pmod(xxhash64(col("doc_id"), lit(7L)), lit(1000L))))
          .as("source"))
    val n = docs.count()
    val nMega = docs.filter(col("source") === "mega").count()

    // wall time AND shuffle-write records (the IncrScale discipline): on
    // a cluster the shuffled row mass is network — THE term the map-side
    // group-limit exists to cut; local wall times barely show it
    val shuffleAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = ev.stageInfo.taskMetrics
          if (m != null)
            shuffleAcc.addAndGet(m.shuffleWriteMetrics.recordsWritten): Unit
        }
      })
    def timed(f: => Long): (Double, Long, Long) = {
      // wait for the async listener bus to actually drain before reading
      // the counter on either side of the run — a fixed sleep can credit
      // late stage-completion events to the wrong arm on a loaded host
      def settle(): Unit = {
        var prev = -1L
        var same = 0
        while (same < 3) { // three consecutive quiet 200ms reads
          Thread.sleep(200)
          val v = shuffleAcc.get()
          if (v == prev) same += 1 else { same = 0; prev = v }
        }
      }
      settle()
      val s0 = shuffleAcc.get()
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      settle()
      (sec, r, shuffleAcc.get() - s0)
    }
    def run(): Long =
      Sample.domainCap(docs, "doc_id", "source", cap)
        .queryExecution.toRdd.count()
    def withRule(): (Double, Long, Long) = {
      spark.conf.unset("spark.sql.optimizer.excludedRules")
      timed(run()): Unit // warm
      timed(run())
    }
    def withoutRule(): (Double, Long, Long) = {
      spark.conf.set("spark.sql.optimizer.excludedRules", Rule)
      timed(run()): Unit
      timed(run())
    }
    // arms-equal via an order-free content checksum computed UNDER EACH
    // config (a single exceptAll would plan both sides under one config)
    def checksum(): (Long, Long) = {
      // modular hash-sum: ANSI mode throws on long overflow, so stay
      // under 2^62 (rows × 1e9+7)
      val r = Sample.domainCap(docs, "doc_id", "source", cap)
        .agg(sum(pmod(xxhash64(col("doc_id"), col("rk")), lit(1000000007L))).as("h"),
          count(lit(1)).as("n")).collect()(0)
      (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
    }
    val (tOn, rowsOn, shOn) = withRule()
    val sumOn = checksum()
    val (tOff, rowsOff, shOff) = withoutRule()
    val sumOff = checksum()
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    val equal = rowsOn == rowsOff && sumOn == sumOff
    println(
      f"""{"probe":"cap_scale","corpus":$n,"mega_rows":$nMega,"cap":$cap,"grouplimit_sec":$tOn%.2f,"no_grouplimit_sec":$tOff%.2f,"shuffle_recs_grouplimit":$shOn,"shuffle_recs_no_grouplimit":$shOff,"rows":$rowsOn,"equal":$equal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
