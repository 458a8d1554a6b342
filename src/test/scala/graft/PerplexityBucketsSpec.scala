package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NgramLm

class PerplexityBucketsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // synthetic score frames drive bucketize directly — the cutoff
  // arithmetic is the thing under test, independent of the LM
  private def scoresOf(nlls: Seq[Option[Double]]) =
    nlls.zipWithIndex.map { case (n, i) =>
      (i.toLong, n.map(_ => 10L).getOrElse(0L), 0L, n)
    }.toDF("doc_id", "n_bigrams", "n_oov", "avg_nll")

  test("nine distinct values split 3/3/3 with the expected cutoffs") {
    val got = NgramLm.bucketize(scoresOf((1 to 9).map(v => Some(v.toDouble))))
      .select("doc_id", "bucket", "cut_head", "cut_middle")
      .as[(Long, String, Double, Double)].collect().sortBy(_._1)
    assert(got.forall(_._3 === 3.0), "cut_head")
    assert(got.forall(_._4 === 6.0), "cut_middle")
    assert(got.map(_._2).toSeq === Seq(
      "head", "head", "head", "middle", "middle", "middle",
      "tail", "tail", "tail"))
  }

  test("ties share a bucket (value-based membership, head may overfill)") {
    val got = NgramLm.bucketize(
        scoresOf(Seq(1.0, 1.0, 1.0, 1.0, 5.0, 9.0).map(Some(_))))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    // cum(1.0)=4: 3·4 ≥ 6 → cut_head=1.0, and 3·4 ≥ 12 → cut_middle=1.0
    // too — the tie group swallows both boundaries, middle comes out
    // empty, and everything above the group is tail. Value-based
    // membership never splits a tie group across buckets.
    Seq(0L, 1L, 2L, 3L).foreach(id => assert(got(id) === "head", s"doc $id"))
    assert(got(4L) === "tail")
    assert(got(5L) === "tail")
  }

  test("unscoreable docs land in unscored and never shift the cutoffs") {
    val got = NgramLm.bucketize(scoresOf(
        Seq(Some(1.0), Some(2.0), Some(3.0), None, None)))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(got(0L) === "head")
    assert(got(1L) === "middle")
    assert(got(2L) === "tail")
    assert(got(3L) === "unscored")
    assert(got(4L) === "unscored")
  }

  test("end-to-end census reconciles with the assignment") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val trusted = docs.filter(length(col("source")) === 4)
    val asg = NgramLm.bucketAssign(trusted, docs, "doc_id", "text")
    val census = NgramLm.perplexityBuckets(trusted, docs, "doc_id", "text")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().map(r => r._1 -> r).toMap
    val byBucket = asg.groupBy("bucket").count()
      .as[(String, Long)].collect().toMap
    assert(census.view.mapValues(_._2).toMap === byBucket)
    assert(census.values.map(_._2).sum === docs.count())
    // bucket ranges are ordered: head's worst nll ≤ middle's best, etc.
    for {
      hi <- census.get("head").flatMap(_._6)
      lo <- census.get("middle").flatMap(_._5)
    } assert(hi <= lo, "head/middle overlap")
    for {
      hi <- census.get("middle").flatMap(_._6)
      lo <- census.get("tail").flatMap(_._5)
    } assert(hi <= lo, "middle/tail overlap")
    // tertiles are balanced within the tie slack: each scored bucket holds
    // ≥ floor(n/3) docs only when values are distinct — on real data just
    // sanity-bound: no scored bucket is empty
    Seq("head", "middle", "tail").foreach { b =>
      assert(byBucket.getOrElse(b, 0L) > 0, s"$b empty")
    }
  }

  test("deterministic across repartitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val trusted = docs.filter(length(col("source")) === 4)
    val a = NgramLm.bucketAssign(trusted, docs, "doc_id", "text")
      .select("doc_id", "bucket").orderBy("doc_id").collect().toSeq
    val b = NgramLm.bucketAssign(trusted.repartition(7),
        docs.repartition(11), "doc_id", "text")
      .select("doc_id", "bucket").orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
