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

  test("probe size gate: broadcast below the bits threshold, shuffled-hash above") {
    val filter = Bloom.build(keys(500, "corpus"), "k", 8192, 5, shards = 4)
    val fresh = keys(100, "fresh")
    // below threshold (default gate): the filter frame must broadcast
    val below = Bloom.probe(fresh, filter, "k", 8192, 5, 4)
      .queryExecution.executedPlan.toString
    assert(below.contains("BroadcastHashJoin"),
      s"below-threshold probe must broadcast the filter:\n$below")
    // above threshold (forced with a 1-bit gate): no broadcast anywhere —
    // the filter is data, the batch shuffles by shard, shuffled-hash join
    val above = Bloom.probe(fresh, filter, "k", 8192, 5, 4, broadcastMaxBits = 1L)
      .queryExecution.executedPlan.toString
    assert(!above.contains("BroadcastHashJoin"),
      s"above-threshold probe must NOT materialize the filter driver-side:\n$above")
    assert(above.contains("ShuffledHashJoin"),
      s"above-threshold probe joins shuffled-hash on the shard key:\n$above")
  }

  test("probe verdicts are identical through the broadcast and join paths") {
    val filter = Bloom.build(keys(400, "corpus"), "k", 8192, 5, shards = 4)
    val mixed = keys(200, "corpus").unionByName(keys(200, "other"))
    def verdicts(gate: Long) = Bloom.probe(
        mixed, filter, "k", 8192, 5, 4, broadcastMaxBits = gate)
      .select(col("k"), col("__might_contain"))
      .as[(String, Boolean)].collect().sortBy(_._1)
    assert(verdicts(Long.MaxValue) === verdicts(1L))
  }

  test("build emits exactly one row per non-empty shard with the declared word count") {
    val filter = Bloom.build(keys(500, "c"), "k", 8192, 5, shards = 4).collect()
    assert(filter.length === 4)
    assert(filter.forall(_.getSeq[Long](1).length === 8192 / 64))
  }
}
