package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bloom, Dedup}

class BloomSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def keys(n: Int, prefix: String) =
    (0 until n).map(i => s"$prefix-key-$i").toDF("k")

  test("no false negatives: every inserted key probes positive, at any shard count") {
    for (shards <- Seq(1, 4)) {
      val corpus = keys(500, "corpus")
      val filter = Bloom.build(corpus, "k", bitsPerShard = 8192, k = 5, shards = shards)
      val neg = Bloom.probe(corpus, filter, "k", 8192, 5, shards)
        .filter(!col("__might_contain")).count()
      assert(neg === 0L, s"false negatives with shards=$shards — Bloom contract broken")
    }
  }

  test("false-positive rate is in the expected band for the sizing") {
    // 500 keys in 8192 bits/shard × 4 shards ≈ 2.4 bits set per 64-bit
    // word per shard… standard math: n/shard=125, m=8192, k=5 → fpp ~1e-4;
    // use a generous ceiling that still catches a broken hash (fpp→1)
    val filter = Bloom.build(keys(500, "corpus"), "k", 8192, 5, shards = 4)
    val probes = 2000
    val fp = Bloom.probe(keys(probes, "other"), filter, "k", 8192, 5, 4)
      .filter(col("__might_contain")).count()
    assert(fp < probes / 10, s"$fp/$probes false positives — hashing degenerate")
  }

  test("novelDocsBloom verdicts equal the exact novelty gate's") {
    val corpus = (0 until 300).map(i => (i.toLong, s"corpus document number $i body"))
      .toDF("doc_id", "text")
    // fresh: 50 re-crawled dups (same text, new ids), 50 novel, plus
    // in-batch self-dups that must collapse like the exact gate's
    val fresh = ((0 until 50).map(i => (1000L + i, s"corpus document number $i body")) ++
      (0 until 50).map(i => (2000L + i, s"genuinely new page $i payload")) ++
      Seq((3000L, "genuinely new page 0 payload"))) // self-dup of 2000
      .toDF("doc_id", "text")
    val exact = Dedup.novelDocs(fresh, corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    val bloom = Bloom.novelDocsBloom(fresh, corpus, "text", "doc_id",
      bitsPerShard = 4096, k = 5, shards = 2)
      .select("doc_id").as[Long].collect().sorted
    assert(bloom === exact)
    assert(exact.length === 50) // the 50 novel docs, self-dup collapsed
  }

  test("definitely-novel path is map-only: no shuffle between scan and verdict") {
    val corpus = keys(200, "corpus")
    val filter = Bloom.build(corpus, "k", 4096, 5, shards = 1).cache()
    try {
      filter.count() // materialize so the probe plan sees a table, not the build
      val probed = Bloom.probe(keys(100, "fresh"), filter, "k", 4096, 5, 1)
        .filter(!col("__might_contain"))
      val shuffles = probed.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        "bloom probe must be a broadcast attach + codegen bit tests — no exchange")
    } finally filter.unpersist()
  }

  test("empty corpus: everything is definitely novel") {
    val empty = spark.emptyDataset[String].toDF("text")
      .withColumn("doc_id", lit(1L)).filter(lit(false))
    val got = Bloom.novelDocsBloom(keys(10, "x").withColumnRenamed("k", "text")
        .withColumn("doc_id", monotonically_increasing_id()),
      empty, "text", "doc_id", 4096, 5, 2)
    assert(got.count() === 10L)
  }

  test("build emits exactly one row per non-empty shard with the declared word count") {
    val filter = Bloom.build(keys(500, "c"), "k", 8192, 5, shards = 4).collect()
    assert(filter.length === 4)
    assert(filter.forall(_.getSeq[Long](1).length === 8192 / 64))
  }
}
