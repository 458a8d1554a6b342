package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusPipeline, Curation}
import graft.sources.Tables

/** Stage-attribution probe for the full-chain curation funnel (r18) —
  * times the census with each opt-in stage enabled incrementally, so a
  * regression names its stage instead of hiding in the composed number.
  * Usage: runMain graft.CurationScale [sfDir]. Prints one line per
  * config; the deltas between consecutive lines are the stages' bills. */
object CurationScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
    val lc = Some(CorpusPipeline.LineCut(minCount = 6L))
    val nd = Some(CorpusPipeline.NearDup(
      t => concat_ws(" ", slice(split(trim(t), "\\s+"), 1, 2)),
      n = 3, threshold = 0.6))
    val sc = Some(CorpusPipeline.SpanScrub(window = 8, minDf = 2))
    val planted = docs.unionByName(TextEntries.curationPlants(spark))
    val configs = Seq(
      ("legacy", docs, None, None, None),
      ("+linecut", docs, lc, None, None),
      ("+neardup", docs, lc, nd, None),
      ("+scrub", docs, lc, nd, sc),
      ("plants+lc", planted, lc, None, None),
      ("plants+nd", planted, lc, nd, None),
      ("plants+sc", planted, lc, nd, sc),
      // same config repeated — the warm-JVM stability row, NOT a bigger
      // corpus (scale rows come from passing a larger sfDir)
      ("plants-rep", planted, lc, nd, sc))
    configs.foreach { case (name, input, l, n, s) =>
      GraftSession.releaseAll(spark)
      val t0 = System.nanoTime()
      val rows = Curation.funnel(input, "doc_id", "text", "source",
        lineCut = l, nearDup = n, scrub = s).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[curation-scale] $name%-9s $secs%7.2f s  census=${
        rows.map(r => s"${r.getString(1)}:${r.getLong(2)}").mkString(" ")}")
    }
    spark.stop()
  }
}
