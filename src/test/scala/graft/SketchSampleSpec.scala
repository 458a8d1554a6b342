package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Sample, Sketch}

class SketchSampleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val rows = (1 to 20000).map { i =>
    (i.toLong, if (i % 10 < 7) "common" else "rare", (i % 400).toLong, (i % 97).toDouble)
  }.toDF("id", "cls", "uid", "v").cache()

  test("approxProfile: HLL distinct within rsd, percentiles near exact") {
    val got = Sketch.approxProfile(rows, col("cls"), "cls", "uid", "v")
      .as[(String, Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("common")._2 === 14000L)
    // uid ≡ id (mod 400) and 400 ≡ 0 (mod 10), so the class (id%10) pins the
    // uid's last digit: "common" sees 280 distinct uids, "rare" 120.
    // 2% rsd HLL must land within ~5% of those.
    assert(math.abs(got("common")._3 - 280L) <= 14, s"hll=${got("common")._3}")
    assert(math.abs(got("rare")._3 - 120L) <= 6, s"hll=${got("rare")._3}")
    // v is uniform over 0..96 → p50 ≈ 48, p95 ≈ 91|92, p99 ≈ 95|96
    assert(math.abs(got("common")._4 - 48.0) <= 2)
    assert(math.abs(got("common")._5 - 91.0) <= 2)
    assert(math.abs(got("common")._6 - 95.0) <= 2)
  }

  test("hashSample: deterministic, near-fraction, pure pushdown filter") {
    val s1 = Sample.hashSample(rows, col("id"), 0.2).select("id").as[Long].collect().sorted
    val s2 = Sample.hashSample(rows, col("id"), 0.2).select("id").as[Long].collect().sorted
    assert(s1 === s2, "hash sample must be reproducible")
    assert(math.abs(s1.length - 4000) < 300, s"got ${s1.length}, want ~4000")
    // membership is per-key: a 10% sample is a subset of a 20% sample
    val s3 = Sample.hashSample(rows, col("id"), 0.1).select("id").as[Long].collect().toSet
    assert(s3.subsetOf(s1.toSet), "smaller fraction must nest inside larger")
  }

  test("stratifiedHashSample: per-stratum fractions, unlisted strata dropped") {
    val df = rows.withColumn("cls2", when(col("id") % 3 === 0, "drop_me").otherwise(col("cls")))
    val got = Sample.stratifiedHashSample(df, col("cls2"), col("id"),
      Map("common" -> 0.1, "rare" -> 1.0))
    val byCls = got.groupBy("cls2").count().as[(String, Long)].collect().toMap
    assert(!byCls.contains("drop_me"))
    val commonTotal = df.filter(col("cls2") === "common").count()
    val rareTotal = df.filter(col("cls2") === "rare").count()
    assert(byCls("rare") === rareTotal, "fraction 1.0 keeps the stratum whole")
    assert(math.abs(byCls("common") - commonTotal * 0.1) < commonTotal * 0.03)
  }

  test("hashSplit: complete disjoint cover at the declared proportions") {
    val df = spark.range(10000).toDF("id")
    val got = Sample.hashSplit(df, col("id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(got.count() === 10000L)
    val sizes = got.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(sizes.keySet === Set("train", "val", "test"))
    // binomial 3-sigma bands around 8000/1000/1000
    assert(math.abs(sizes("train") - 8000L) < 3 * math.sqrt(10000 * 0.8 * 0.2))
    assert(math.abs(sizes("val") - 1000L) < 3 * math.sqrt(10000 * 0.1 * 0.9))
  }

  test("hashSplit: assignment is per-key stable — a grown corpus never re-deals") {
    val small = spark.range(1000).toDF("id")
    val big = spark.range(5000).toDF("id")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val a = Sample.hashSplit(small, col("id"), splits)
      .as[(Long, String)].collect().toMap
    val b = Sample.hashSplit(big, col("id"), splits)
      .as[(Long, String)].collect().toMap
    a.foreach { case (id, s) => assert(b(id) === s, s"id $id re-dealt") }
  }

  test("epochMixPlan: targets and repetition factors match hand arithmetic") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, ("w " * 10).trim, "trusted"),
      (2L, ("w " * 20).trim, "trusted"),
      (3L, ("w " * 100).trim, "bulk")).toDF("doc_id", "text", "source")
    val got = Sample.epochMixPlan(docs, col("source"),
        size(TextOps.tokens(col("text"))).cast("long"),
        when(col("source") === "trusted", lit(3.0)).otherwise(lit(1.0)),
        budgetTokens = 80L)
      .as[(String, Long, Double, Long, Double)].collect().map(r => r._1 -> r).toMap
    // z = 4; trusted: avail 30, target floor(80·3/4)=60, epochs 2.0 (upsample)
    // bulk: avail 100, target floor(80·1/4)=20, epochs 0.2 (subsample)
    assert(got("trusted") === (("trusted", 30L, 3.0, 60L, 2.0)))
    assert(got("bulk") === (("bulk", 100L, 1.0, 20L, 0.2)))
  }

  test("splitLeakage: cross-split duplicate content flagged, same-split not") {
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    // find ids by their actual split assignment so the plant is robust to
    // the hash function: two different-split ids share text (the leak),
    // two same-split ids share another text (a dup but not a leak)
    val ids = (1L to 200L).toDF("id")
    val byId = Sample.hashSplit(ids, col("id"), splits)
      .as[(Long, String)].collect().toMap
    val trainIds = byId.collect { case (i, "train") => i }.toSeq.sorted
    val testId = byId.collect { case (i, "test") => i }.min
    val rows = Seq(
      (trainIds(0), "leaky shared content"),
      (testId, "leaky shared content"),
      (trainIds(1), "benign duplicate content"),
      (trainIds(2), "benign duplicate content"),
      (trainIds(3), "unique content a"),
      (trainIds(4), "unique content b")).toDF("doc_id", "text")
    val got = Sample.splitLeakage(rows, "doc_id", "text", splits)
      .as[(String, Long, Long, String, Boolean)].collect()
      .map(r => r._4 -> r).toMap // keyed by splits string? no — by hash
    assert(got.size === 2, "only duplicated groups surface")
    val leak = got.values.find(_._5).get
    val benign = got.values.find(!_._5).get
    assert(leak._2 === 2L && leak._3 === 2L && leak._4 === "test,train")
    assert(benign._2 === 2L && benign._3 === 1L && benign._4 === "train")
  }

  test("epochOrder: every doc slotted exactly once, pos contiguous per shard") {
    val docs = (0L until 400L).toDF("doc_id")
    val got = Sample.epochOrder(docs, "doc_id", epoch = 1, numShards = 8)
      .as[(Int, Int, Long)].collect()
    assert(got.map(_._3).sorted.toSeq === (0L until 400L))
    got.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length),
        s"shard $shard positions not contiguous")
    }
    assert(got.map(_._1).distinct.sorted.toSeq === (0 to 7))
  }

  test("epochOrder: reproducible within an epoch, re-dealt across epochs") {
    val docs = (0L until 300L).toDF("doc_id")
    def order(epoch: Int, parts: Int) =
      Sample.epochOrder(docs.repartition(parts), "doc_id", epoch, numShards = 4)
        .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // same epoch: identical slots whatever the input partitioning
    assert(order(1, 3) === order(1, 11))
    // different epoch: a genuinely different permutation (same doc set)
    val e1 = order(1, 3); val e2 = order(2, 3)
    assert(e1.map(_._3).sorted === e2.map(_._3).sorted)
    assert(e1 !== e2)
    // and the within-shard sequences themselves differ, not just shards
    val seq1 = e1.filter(_._1 == 0).map(_._3)
    val seq2 = e2.filter(_._1 == 0).map(_._3)
    assert(seq1 !== seq2)
  }
}
