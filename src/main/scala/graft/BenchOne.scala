package graft
import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query best-of-N — the reproduce-a-regression
  * loop (BENCH_r{N} drift triage) without paying the full 90-query bench.
  * Usage: runMain graft.BenchOne <queryName> [iters=3] [sfDir=sf0.1]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // same warmup discipline as Bench: JIT/codegen paid at the small SF
    try fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    // fresh mode (SPARK_GRAFT_FRESH_MEMO=1): drop the per-(session, dir)
    // trained-artifact memos before every iteration, so best-of-N times
    // the query BUILD-INCLUSIVE — how a family's alphabetically-first
    // member bills inside the full sorted bench run. Default keeps the
    // memoized steady state (how every other family member bills).
    val fresh = sys.env.get("SPARK_GRAFT_FRESH_MEMO").contains("1")
    // host weather over the timed iterations (see GraftSession.HostWeather):
    // an adjudication reading carries its own steal context in the JSON line
    val weather0 = GraftSession.HostWeather.sample()
    val times = (1 to iters).map { _ =>
      // mirror Bench's per-query isolation exactly, incl. the dedup queue
      if (fresh) SparkEntry.clearSessionMemos(spark)
      GraftSession.releaseAll(spark)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val stealJson = GraftSession.HostWeather.json(weather0, GraftSession.HostWeather.sample())
    println(f"""{"query":"$name","best":${times.min}%.3f,"times":[${times.map(t => f"$t%.3f").mkString(",")}],"sf":"$sfDir","steal_pct":$stealJson}""")
    spark.stop()
  }
}
