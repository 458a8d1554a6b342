package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("train: most-frequent pair merges first, deterministic tie-break") {
    // corpus: "aaab" ×3, "aab" ×1 — bytes a=61, b=62. pair counts:
    // (61,61)=3·2+1=7, (61,62)=4 → merge 0 = (61,61); then
    // aaab→[6161,61,62], aab→[6161,62]: (6161,61)=3, (61,62)=3,
    // (6161,62)=1 → tie broken lexicographically: '61' < '6161' →
    // (61,62) wins rank 1 (hex rendering preserves per-char order, so
    // this is the same tie-break the char-level form made).
    val df = (Seq.fill(3)("aaab") ++ Seq("aab")).toDF("text")
    val merges = Bpe.train(df, "text", 2)
    assert(merges === Seq(("61", "61"), ("61", "62")))
  }

  test("train and apply are byte-level: multi-byte UTF-8 chars merge as bytes") {
    // é is bytes c3 a9: "ééé" → [c3,a9,c3,a9,c3,a9]; pair (c3,a9)
    // occurs 3×, (a9,c3) 2× → merge 0 = (c3,a9) = the char é; then
    // [c3a9,c3a9,c3a9] → merge 1 = (c3a9,c3a9). Nothing is stripped.
    val df = Seq.fill(3)("ééé").toDF("text")
    val merges = Bpe.train(df, "text", 2)
    assert(merges === Seq(("c3", "a9"), ("c3a9", "c3a9")))
    val n = df.limit(1)
      .select(Bpe.tokenCountCol(col("text"), merges).as("n"))
      .as[Long].collect()
    // ééé → é,é,é → éé,é → 2 tokens (greedy left-to-right within a rank)
    assert(n === Array(2L))
  }

  test("kernel: counts match a per-word reference application") {
    val docs = Seq((1L, "low lower lowest"), (2L, "new newer newest"),
      (3L, "low new low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 6)
    // reference: naive rank-ordered merge loop per word, over hex symbols
    def applyRef(w: String): Int = {
      var syms = Bpe.hexSyms(w).toList
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

  test("kernel: no case folding or stripping — every byte counts; empty-safe") {
    val merges = Seq(("61", "62")) // bytes of "ab"
    val got = Seq((1L, "AB ab a-b"), (2L, "!!!"), (3L, ""), (4L, "été"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.tokenCountCol(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    // AB stays 41,42 (2) + ab merges (1) + a-b = 61,2d,62 (3) = 6
    assert(got(1L) === 6L, "case is NOT folded at byte level")
    assert(got(2L) === 3L, "punctuation is counted, not stripped")
    assert(got(3L) === 0L)
    // été = c3 a9 74 c3 a9 — accents count as their UTF-8 bytes
    assert(got(4L) === 5L, "non-ASCII text is counted, not deleted")
  }

  test("tokenCountCol: merges outside the hex-pair alphabet are rejected") {
    intercept[IllegalArgumentException] {
      Bpe.tokenCountCol(col("text"), Seq(("a.", "b")))
    }
    intercept[IllegalArgumentException] {
      // the old char-level shape: valid letters, but not byte symbols
      Bpe.tokenCountCol(col("text"), Seq(("a", "b")))
    }
    intercept[IllegalArgumentException] {
      // odd length — not a whole number of bytes
      Bpe.tokenCountCol(col("text"), Seq(("616", "62")))
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

  test("encode: hand-checked id sequence — bytes 0-255, merge rank r mints 256+r") {
    // merges: rank0 = (65,72) 'er' → id 256; rank1 = (69,6e) 'in' → 257.
    // "er in inert" → er=[256], in=[257], inert=[696e,6572,74]=[257,256,116]
    val merges = Seq(("65", "72"), ("69", "6e"))
    val got = Seq("er in inert").toDF("text")
      .select(Bpe.encodeCol(col("text"), merges))
      .as[Seq[Long]].collect().head
    assert(got === Seq(256L, 257L, 257L, 256L, 116L))
  }

  test("encode length equals tokenCount on every doc, whitespace edge cases included") {
    val merges = Seq(("65", "72"), ("69", "6e"), ("6572", "69"))
    val docs = Seq("er in inert", "", "   ", "é 模型 erin", "one")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = docs.select(
        size(Bpe.encodeCol(col("text"), merges)).cast("long").as("n_ids"),
        Bpe.tokenCountCol(col("text"), merges).as("n_tok"))
      .as[(Long, Long)].collect()
    assert(rows.forall { case (a, b) => a == b })
  }

  test("encode: unmerged multi-byte chars come out as their UTF-8 byte ids") {
    // 模 = e6 a8 a1 — with no applicable merges each byte is its own id
    val got = Seq("模").toDF("text")
      .select(Bpe.encodeCol(col("text"), Seq(("65", "72"))))
      .as[Seq[Long]].collect().head
    assert(got === Seq(0xe6L, 0xa8L, 0xa1L))
  }

  test("decode inverts encode up to whitespace, byte for byte, scripts included") {
    val docs = Seq(
      (1L, "low lower lowest"), (2L, "café déjà 模型 训练"),
      (3L, ""), (4L, "  spaced\tout \n lines  "), (5L, "a-b!c"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 8)
    val got = docs.select(col("doc_id"),
        Bpe.decodeCol(Bpe.encodeCol(col("text"), merges), merges).as("d"))
      .as[(Long, String)].collect().toMap
    val expected = Map(
      1L -> "lowlowerlowest", 2L -> "cafédéjà模型训练",
      3L -> "", 4L -> "spacedoutlines", 5L -> "a-b!c")
    assert(got === expected)
  }

  test("decode: merged symbols expand to their concatenated bytes by rank") {
    // rank0 (65,72) → id 256 = "er"; rank1 (69,6e) → 257 = "in";
    // rank2 (6572,69) → 258 = "eri"; raw byte ids pass through
    val merges = Seq(("65", "72"), ("69", "6e"), ("6572", "69"))
    val got = Seq(Seq(258L, 257L, 116L, 33L)).toDF("ids")
      .select(Bpe.decodeCol(col("ids"), merges))
      .as[String].collect().head
    assert(got === "eriint!")
  }

  test("decode: out-of-range and null ids fail loudly by name") {
    val merges = Seq(("65", "72"))
    val bad = Seq(Seq(257L)).toDF("ids")
      .select(Bpe.decodeCol(col("ids"), merges))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage.contains("bpe_decode") ||
      Option(e.getCause).exists(_.getMessage.contains("bpe_decode")))
    val neg = Seq(Seq(-1L)).toDF("ids")
      .select(Bpe.decodeCol(col("ids"), merges))
    val e2 = intercept[Exception] { neg.collect() }
    assert(e2.getMessage.contains("bpe_decode") ||
      Option(e2.getCause).exists(_.getMessage.contains("bpe_decode")))
  }

  test("encode is deterministic across batching and agrees after memo churn") {
    val merges = Seq(("61", "61"), ("6161", "61"))
    val docs = Seq.tabulate(300)(i => (i.toLong, "a" * (1 + i % 7))).toDF("doc_id", "text")
    val a = docs.select(col("doc_id"), Bpe.encodeCol(col("text"), merges).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val b = docs.repartition(7).select(col("doc_id"),
        Bpe.encodeCol(col("text"), merges).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(a === b)
    // "aaa" under (61,61)+(6161,61): [61,61,61]→[6161,61]→[616161] = id 257
    assert(a(2L) === Seq(257L))
  }
}
