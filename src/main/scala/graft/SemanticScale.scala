package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Scale probe for the semantic_dedup nlist ∝ n contract: times
  * [[Similarity.semanticDedupPairs]] on a ScaleGen corpus with the
  * caller's nlist, best-of-N — the measurement behind BASELINE's
  * third-decade semantic_dedup row (the gate keeps nlist=16 fixed for
  * golden determinism, which is deliberately quadratic across decades;
  * production scales nlist with the corpus so mean cluster size — and
  * the per-row pair space — stays constant). Mirrors the gate query's
  * shape (planted jitters, threshold 0.8) so numbers are comparable to
  * the pinned sf-decade table.
  *
  * Usage: runMain graft.SemanticScale <sfDir> <nlist> [iters=3] [sampleFraction=1.0]
  */
object SemanticScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nlist = args(1).toInt
    val iters = if (args.length > 2) args(2).toInt else 3
    val sampleFraction = if (args.length > 3) args(3).toDouble else 1.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    def run(): Long = {
      val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 20).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("float")
            - lit(500.0f)) / lit(100000.0f))).as("embedding"))
      Similarity.semanticDedupPairs(emb.unionByName(planted), "vec_id", "embedding",
          nlist = nlist, threshold = 0.8, sampleFraction = sampleFraction)
        .queryExecution.toRdd.count()
    }
    // warmup at the gate SF for JIT/codegen parity with BenchOne
    try {
      val warm = Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select("vec_id", "embedding")
      Similarity.semanticDedupPairs(warm, "vec_id", "embedding",
        nlist = 16, threshold = 0.8).queryExecution.toRdd.count()
    } catch { case _: Throwable => () }
    val times = (1 to iters).map { _ =>
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val pairs = run()
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, pairs)
    }
    println(f"""{"probe":"semantic_scale","nlist":$nlist,"best":${times.map(_._1).min}%.3f,"times":[${times.map(t => f"${t._1}%.3f").mkString(",")}],"pairs":${times.head._2},"sampleFraction":$sampleFraction,"sf":"$sfDir"}""")
    spark.stop()
  }
}
