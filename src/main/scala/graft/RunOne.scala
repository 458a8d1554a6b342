package graft

import org.apache.spark.sql.SparkSession

/** Run a single SparkEntry query and print its rows — the derive-a-golden /
  * eyeball-a-result loop (graft.Explain shows the plan, graft.BenchOne the
  * time; this shows the data). Usage:
  * runMain graft.RunOne <queryName> [sfDir=sf0.01] [maxRows=100]. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val maxRows = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.printSchema()
    df.show(maxRows, truncate = false)
    spark.stop()
  }
}
