package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHash
import graft.operators.Dedup

/** The native StaticInvoke expressions must be BIT-IDENTICAL to the
  * Column-function reference implementations — same tokenization, same
  * XXH64 seed, same permutation coefficients. */
class NativeHashSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a b"),
    (3L, "single"),
    (4L, ""),
    (5L, "   leading and trailing   "),
    (6L, "tab\tseparated\ttokens and\nnewlines"),
    (7L, "répétition unicode ünïcode 中文 tokens répétition unicode"),
    (8L, (1 to 200).map(i => s"tok${i % 37}").mkString(" "))
  ).toDF("id", "text")

  test("native simhash64 equals columnar simhash bit-for-bit") {
    val cmp = docs.select(
      TextHash.simhash64Col(col("text")).as("native"),
      Dedup.simhashColumnar(col("text")).as("columnar"))
      .as[(Long, Long)].collect()
    cmp.zipWithIndex.foreach { case ((n, c), i) =>
      assert(n === c, s"doc $i: native $n != columnar $c")
    }
  }

  test("native shingleHashes equals columnar shingles→hash→distinct, in order") {
    val cmp = docs.select(
      TextHash.shingleHashesCol(col("text"), 3).as("native"),
      array_distinct(Dedup.shingleHashes(Dedup.shingles(col("text"), 3))).as("columnar"))
      .as[(Seq[Long], Seq[Long])].collect()
    cmp.zipWithIndex.foreach { case ((n, c), i) =>
      assert(n === c, s"doc $i")
    }
  }

  test("native minhashSig equals columnar signature over the same hashes") {
    val cmp = docs
      .select(TextHash.shingleHashesCol(col("text"), 3).as("shh"))
      .select(
        TextHash.minhashSigCol(col("shh"), 32).as("native"),
        Dedup.minhashSignatureFromHashes(col("shh"), 32).as("columnar"))
      .as[(Seq[Long], Seq[Long])].collect()
    cmp.zipWithIndex.foreach { case ((n, c), i) => assert(n === c, s"doc $i") }
  }

  test("null text propagates null through the native expressions") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("ok"))).toDF("id", "text")
    val got = df.select(
      TextHash.simhash64Col(col("text")).as("s"),
      TextHash.shingleHashesCol(col("text"), 3).as("h"))
      .collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(!got(1).isNullAt(0) && !got(1).isNullAt(1))
  }
}
