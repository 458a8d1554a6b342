package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Incremental, Snapshot, TextOps}

/** Scale probe for the incremental pipeline (D30): measures the claim the
  * sf-gate cannot — that a refresh with a FIXED-SIZE delta costs the
  * delta, not the corpus. The gate corpus re-bootstraps the previous
  * run's state in-query (so the oracle can replay everything); a real
  * lake CARRIES that state between refreshes. This probe does what the
  * lake does: bootstrap once, land the (ledger, packed) state as
  * parquet, then time
  *
  *   rebuild:     Incremental.batch(curr)            — O(corpus) text work
  *   incremental: diff + Incremental.repack(state)   — O(delta) text work,
  *                shard-granular repack
  *
  * at a fixed 300-doc delta (100 edited, 100 removed, 100 added — ids
  * < 200 exist at every SF; ScaleGen copy 0 is the original corpus) as
  * the corpus grows a decade. The rebuild arm grows with the corpus; the
  * incremental arm should move with the delta plus the skinny
  * ledger/diff shuffles, and the CHANGED-shard count should stay pinned
  * near the touched-doc count while the untouched fraction → 100%.
  *
  * Usage: runMain graft.IncrScale [sfDir] [shards] [iters]
  * Prints one JSON line: per-arm best seconds, delta size, shards whose
  * content actually changed, and arm-equality.
  */
object IncrScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val shards = if (args.length > 1) args(1).toInt else 1024
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val keep: Column => Column = t => TextOps.corpusFilterRules(t)
      .collect { case (n, r) if n != "no_terminal_punct" => r }
      .reduce(_ && _)
    val docShard: Column => Column = k =>
      conv(substring(md5(k.cast("string")), 1, 4), 16, 10)
        .cast("long") % shards
    val mt = 256; val ov = 32; val budget = 2048L

    val prev = sources.Tables.documents(spark, sfDir).select("doc_id", "text")
    val nCorpus = prev.count()
    val added = spark.range(100)
      .select((col("id") + 900000000L).as("doc_id"),
        concat(lit("freshly crawled document number "), col("id"),
          lit(" carrying entirely new body content with plenty of plain" +
            " ordinary words filling out the minimum length and keeping" +
            " the digit ratio low and the word shapes inside the bounds" +
            " the keep ruleset demands of every surviving document"))
          .as("text"))
    val curr = prev
      .filter(!col("doc_id").between(100, 199)) // 100 removed
      .select(col("doc_id"),
        when(col("doc_id") < 100,
          concat(col("text"), lit(" refreshed crawl edit"))) // 100 edited
          .otherwise(col("text")).as("text"))
      .unionByName(added) // 100 added

    // lake state: bootstrap ONCE, land as parquet, read back (cuts lineage
    // to the batch plan — the refresh must stand on the stored state)
    val stateDir = s"${sys.props("java.io.tmpdir")}/graft_incrscale"
    sources.Sink.reset(stateDir)
    Incremental.ledger(prev, "doc_id", "text", keep)
      .write.mode("overwrite").parquet(s"$stateDir/ledger")
    Incremental.batch(prev, "doc_id", "text", keep, mt, ov, budget, shards,
        docShard)
      .write.mode("overwrite").parquet(s"$stateDir/packed")
    val prevLedger = spark.read.parquet(s"$stateDir/ledger")
    val prevPacked = spark.read.parquet(s"$stateDir/packed")

    def timed(f: => Long): (Double, Long) = {
      val runs = (1 to iters).map { _ =>
        Dedup.unpersistIntermediates()
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }

    def rebuild() = Incremental.batch(curr, "doc_id", "text", keep,
      mt, ov, budget, shards, docShard)
    def incremental() = Incremental.repack(prevLedger, prevPacked, curr,
      Snapshot.diff(prev, curr, "doc_id", "text"),
      "doc_id", "text", keep, mt, ov, budget, shards, docShard)

    val (tRebuild, nRebuild) = timed(rebuild().queryExecution.toRdd.count())
    val (tIncr, nIncr) = timed(incremental().queryExecution.toRdd.count())

    // untimed: arm equality + the census of shards whose content CHANGED
    // relative to the previous packed table (the rework bound)
    val a = rebuild(); val b = incremental()
    val equal = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    val changedShards = b.exceptAll(prevPacked)
      .unionByName(prevPacked.exceptAll(b))
      .select("shard").distinct().count()
    val deltaN = Snapshot.diff(prev, curr, "doc_id", "text").count()
    Dedup.unpersistIntermediates()
    println(
      f"""{"probe":"incr_scale","corpus":$nCorpus,"delta":$deltaN,"shards":$shards,"rebuild_sec":$tRebuild%.2f,"incremental_sec":$tIncr%.2f,"rows_rebuild":$nRebuild,"rows_incremental":$nIncr,"changed_shards":$changedShards,"equal":$equal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
