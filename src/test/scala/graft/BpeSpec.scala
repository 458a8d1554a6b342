package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("train: most-frequent pair merges first, deterministic tie-break") {
    // corpus: "aaab" ×3, "aab" ×1 → pair counts: (a,a)=3·2+1=7, (a,b)=4 →
    // merge 0 = (a,a); then (aa,a)=3, (aa,b)=1+... recompute: aaab→[aa,a,b],
    // aab→[aa,b]: (aa,a)=3, (a,b)=3, (aa,b)=1 → tie (aa,a) vs (a,b) broken
    // lexicographically: "a" < "aa" → (a,b) wins rank 1.
    val df = (Seq.fill(3)("aaab") ++ Seq("aab")).toDF("text")
    val merges = Bpe.train(df, "text", 2)
    assert(merges === Seq(("a", "a"), ("a", "b")))
  }

  test("kernel: counts match a per-word reference application") {
    val docs = Seq((1L, "low lower lowest"), (2L, "new newer newest"),
      (3L, "low new low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 6)
    // reference: naive rank-ordered merge loop per word
    def applyRef(w: String): Int = {
      var syms = w.map(_.toString).toList
      merges.foreach { case (a, b) =>
        var changed = true
        while (changed) {
          val i = syms.indices.dropRight(1)
            .find(j => syms(j) == a && syms(j + 1) == b)
          i match {
            case Some(j) =>
              syms = syms.take(j) ++ List(a + b) ++ syms.drop(j + 2)
            case None => changed = false
          }
        }
      }
      syms.length
    }
    val expected = Map(
      1L -> "low lower lowest".split(" ").map(applyRef).sum.toLong,
      2L -> "new newer newest".split(" ").map(applyRef).sum.toLong,
      3L -> "low new low".split(" ").map(applyRef).sum.toLong)
    val got = docs.select(col("doc_id"),
        Bpe.tokenCountCol(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("kernel: normalization folds case and punctuation; empty-safe") {
    val merges = Seq(("a", "b"))
    val got = Seq((1L, "AB ab a-b"), (2L, "!!!"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.tokenCountCol(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    // "AB ab a-b" → "ab ab a b": ab=1, ab=1, a=1, b=1 → 4
    assert(got(1L) === 4L)
    assert(got(2L) === 0L, "pure punctuation normalizes to zero tokens")
    assert(got(3L) === 0L)
  }

  test("tokenCountCol: merges outside the normalized alphabet are rejected") {
    intercept[IllegalArgumentException] {
      Bpe.tokenCountCol(col("text"), Seq(("a.", "b")))
    }
  }

  test("fewer merges never decrease the token count (monotonicity)") {
    val docs = Seq.tabulate(20)(i => (i.toLong, s"stream batch merge sort partition row$i"))
      .toDF("doc_id", "text")
    val m4 = Bpe.train(docs, "text", 4)
    val m12 = Bpe.train(docs, "text", 12)
    assert(m12.take(4) === m4, "training is prefix-stable")
    val counts = docs.select(
        sum(Bpe.tokenCountCol(col("text"), m4)).as("c4"),
        sum(Bpe.tokenCountCol(col("text"), m12)).as("c12"))
      .as[(Long, Long)].collect().head
    assert(counts._1 >= counts._2)
  }
}
