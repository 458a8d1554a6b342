package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB attribution for one SparkEntry query — the missing rung between
  * BenchOne (one number) and the disabled UI: a listener records every
  * job's wall-clock over one warmed run, so a query's cost decomposes into
  * its serial action roundtrips (the guide-§1 "where does the time go"
  * question, answerable without an event-log server). Construction-time
  * jobs (eager localCheckpoints, collects inside frame builders) appear
  * the same as action jobs — exactly the point: they bill the same.
  *
  * Usage: runMain graft.JobProfile <queryName> [sfDir=sf0.1]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // JIT/codegen warmup at the smallest SF (the Bench discipline)
    try fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    GraftSession.releaseAll(spark)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        starts.put(j.jobId, (j.time, desc)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          rows.add((j.jobId, (j.time - t0) / 1e3, desc)): Unit
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).queryExecution.toRdd.count()
    val wall = (System.nanoTime() - t0) / 1e9
    // give the (async) listener bus a moment to drain before reading —
    // the public API exposes no waitUntilEmpty; job-end events for a
    // completed action land within milliseconds
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._1)
    println(f"== $name: wall $wall%.2f s, ${all.size} jobs, " +
      f"job-time sum ${all.map(_._2).sum}%.2f s ==")
    all.foreach { case (id, sec, desc) =>
      println(f"job $id%4d  $sec%7.3f s  ${desc.take(90)}")
    }
    spark.stop()
  }
}
