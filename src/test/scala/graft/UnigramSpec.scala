package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Unigram
import graft.functions.Unigram.Piece

class UnigramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // hand-built model: scores chosen so the interesting transitions are
  // forced, not emergent. ln-p scaled by 1e6 (more-negative = rarer).
  // trained ids start at 257: 0 is UNK, 1..256 the byte-fallback pieces
  private val hand = Seq(
    Piece(257L, "a", -5000000L),
    Piece(258L, "ab", -3000000L),
    Piece(259L, "abc", -9000000L),
    Piece(260L, "b", -5000000L),
    Piece(261L, "bc", -3000000L),
    Piece(262L, "c", -5000000L),
    Piece(263L, "cc", -6000000L)) // exactly c + c (tie with the 2-piece split)

  private def enc(texts: (Long, String)*): Map[Long, Seq[Long]] =
    texts.toSeq.toDF("id", "t")
      .select(col("id"), Unigram.encodeCol(col("t"), hand).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap

  test("viterbi picks the best-scoring split, not greedy longest-prefix") {
    // greedy longest-prefix would take abc whole (-9e6); the best splits
    // score -8e6: ab+c and a+bc tie, and the documented tie-break
    // (longest FINAL piece — bc over c at pos 3) resolves to a+bc
    assert(enc(1L -> "abc")(1L) === Seq(257L, 261L))
    // with a distinct-score setup there is no tie: 'abb' must be ab+b
    // (-8e6), never a+b+b (-15e6)
    assert(enc(2L -> "abb")(2L) === Seq(258L, 260L))
  }

  test("exact score ties prefer the longest final piece") {
    // cc (-6e6) ties c+c (-10e6)? No: c+c = -10e6, cc = -6e6 — cc wins on
    // score. Force a TRUE tie: 'ccc' at pos 3: cc from pos1 (dp=-5e6,
    // -11e6) vs c from pos2 (dp(cc)=-6e6, -11e6) — tie → cc (longer) wins
    assert(enc(1L -> "ccc")(1L) === Seq(262L, 263L))
  }

  test("unseen characters emit their UTF-8 bytes' fixed ids, never UNK/error") {
    // z = 0x7a -> id 123; the DP still scores the step at UnkPenalty
    assert(enc(1L -> "azb")(1L) === Seq(257L, 123L, 260L))
    // ζ = U+03B6 = UTF-8 ce b6 -> ids 207, 183 (two ids per char)
    assert(enc(2L -> "ζζ")(2L) === Seq(207L, 183L, 207L, 183L))
  }

  test("whitespace splits words; empty and blank text encode to nothing") {
    assert(enc(1L -> "ab  c\tab")(1L) === Seq(258L, 262L, 258L))
    assert(enc(2L -> "")(2L) === Seq.empty)
    assert(enc(3L -> "   ")(3L) === Seq.empty)
  }

  test("training is deterministic under repartitioning and emits a valid model") {
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq("fast scan", "hash join", "sort merge join",
        "big table scan", "fast hash probe")(i % 5))
    }.toDF("doc_id", "text")
    def fit(parts: Int): Seq[Piece] =
      Unigram.train(docs.repartition(parts), "text", vocabSize = 32)
    val m = fit(2)
    assert(m === fit(7), "bit-identical across layouts")
    // ids are the lexicographic rank from FirstTrainedId, dense
    assert(m.map(_.id) === m.indices.map(Unigram.FirstTrainedId + _))
    assert(m.map(_.piece) === m.map(_.piece).sorted)
    // coverage: every training char present as a piece
    val chars = "fastscanhashjoinsortmergebigtablepro".toSet
    chars.foreach(c =>
      assert(m.exists(_.piece == c.toString), s"missing coverage char $c"))
    // every logp is a plausible scaled ln p (negative, above UNK penalty)
    assert(m.forall(p => p.logp < 0 && p.logp > Unigram.UnkPenalty))
  }

  test("trained encode: frequent whole words become single pieces") {
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq("fast scan", "hash join", "sort merge join",
        "big table scan", "fast hash probe")(i % 5))
    }.toDF("doc_id", "text")
    val m = Unigram.train(docs, "text", vocabSize = 32)
    val byPiece = m.map(p => p.piece -> p.id).toMap
    val got = docs.limit(1)
      .select(Unigram.encodeCol(lit("hash join compactor"), m).as("ids"))
      .as[Seq[Long]].collect().head
    assert(got.take(2) === Seq(byPiece("hash"), byPiece("join")))
    // novel word segments into pieces/chars, all ids in-vocab or byte-fallback
    val valid = m.map(_.id).toSet ++ (1L to 256L) + Unigram.UnkId
    assert(got.forall(valid))
  }

  test("two models in one plan segment independently (memo keyed per model)") {
    // a per-thread word memo cleared only on new-literal PARSE would
    // serve the first model's ids for the second once both literals are
    // parse-cached — this pins the memo being keyed to the model
    val other = Seq(Piece(257L, "a", -5000000L), Piece(258L, "b", -5000000L),
      Piece(259L, "c", -5000000L))  // no multi-char pieces: 'ab' → [257,258]
    val got = Seq.fill(50)(("ab")).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(
        Unigram.encodeCol(col("t"), hand).as("h"),
        Unigram.encodeCol(col("t"), other).as("o"))
      .as[(Seq[Long], Seq[Long])].collect()
    got.foreach { case (h, o) =>
      assert(h === Seq(258L), "rich model: the 'ab' piece")
      assert(o === Seq(257L, 258L), "char-only model: a + b")
    }
  }

  test("decodeCol: roundtrip is total — byte fallback restores unseen chars") {
    val got = Seq((1L, "ab cc zb"), (2L, ""), (3L, "αβ \uD83D\uDE42x"))
      .toDF("id", "t")
      .select(col("id"),
        Unigram.decodeCol(Unigram.encodeCol(col("t"), hand), hand).as("d"))
      .as[(Long, String)].collect().toMap
    // covered words concatenate back exactly (whitespace deleted); the
    // unseen 'z' comes back through its byte id instead of dropping at UNK
    assert(got(1L) === "abcczb")
    assert(got(2L) === "")
    // multi-byte fallback: 2-byte Greek and a 4-byte supplementary-plane
    // emoji reassemble from their per-byte ids
    assert(got(3L) === "αβ\uD83D\uDE42x")
  }

  test("trained piece ids below FirstTrainedId are rejected") {
    val bad = Seq(Piece(1L, "a", -5000000L))
    intercept[IllegalArgumentException] {
      Unigram.encodeCol(lit("a"), bad)
    }
  }

  test("encodeCol plans as a shuffle-free codegen'd map (StaticInvoke)") {
    // a non-foldable input (range-derived text): a literal frame would
    // constant-fold into a LocalTableScan and prove nothing
    val plan = spark.range(4)
      .select(Unigram.encodeCol(concat(lit("ab c"), col("id")), hand))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("*("), s"codegen lost (no *(n) stage):\n$plan")
  }

  test("encodeCol rejects a sparse-id hand model at plan build (r18 tightened contract)") {
    // the decode table is sized by max id; parseFor already bounded it at
    // task runtime — the Column path now fails when the plan is BUILT, so
    // a hand-built Piece(10000, ...) model can't pass plan construction
    // and then die per-task with the out-of-proportion error
    val e = intercept[IllegalArgumentException] {
      Unigram.encodeCol(lit("x"), Seq(Piece(10000L, "a", -5000000L)))
    }
    assert(e.getMessage.contains("out of proportion"))
  }
}
