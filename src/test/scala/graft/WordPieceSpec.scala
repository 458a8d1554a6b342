package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WordPiece
import graft.functions.WordPiece.Piece

class WordPieceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // hand-built vocab in code-point id order ('#' < lowercase)
  private val hand = Seq(
    Piece(1L, "##b"), Piece(2L, "##bcd"), Piece(3L, "##cd"),
    Piece(4L, "##d"), Piece(5L, "a"), Piece(6L, "abc"))

  private def enc(model: Seq[Piece], texts: (Long, String)*): Map[Long, Seq[Long]] =
    texts.toSeq.toDF("id", "t")
      .select(col("id"), WordPiece.encodeCol(col("t"), model).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap

  test("greedy longest-match-first; continuation positions probe with ##") {
    // longest initial match is abc (not a), then ##d — and 'ab' uses the
    // ##-marked continuation piece, never a bare 'b'
    assert(enc(hand, 1L -> "abcd")(1L) === Seq(6L, 4L))
    assert(enc(hand, 2L -> "ab")(2L) === Seq(5L, 1L))
    // x unmatchable at the last position → the whole word is [UNK]
    assert(enc(hand, 3L -> "abcdx")(3L) === Seq(0L))
    assert(enc(hand, 4L -> "abcd abcd")(4L) === Seq(6L, 4L, 6L, 4L))
    // longest CONTINUATION match: with only 'a' word-initial, ##bcd
    // (len 3) beats ##b at position 1
    val handC = Seq(Piece(1L, "##b"), Piece(2L, "##bcd"), Piece(3L, "a"))
    assert(enc(handC, 5L -> "abcd")(5L) === Seq(3L, 2L))
  }

  test("greedy is the production rule, NOT Viterbi: a covered word can UNK") {
    // a + ##bcd covers 'abcd', but greedy commits to abc first and then
    // finds no piece at ##d — the whole word becomes [UNK] (the HF
    // WordpieceTokenizer behavior; pinned so a 'helpful' optimal-split
    // rewrite shows up as a red test, not a silent semantics change)
    val noD = Seq(Piece(1L, "##bcd"), Piece(2L, "a"), Piece(3L, "abc"))
    assert(enc(noD, 1L -> "abcd")(1L) === Seq(0L))
    // and the partial prefix (abc) is DISCARDED, not emitted
    assert(enc(noD, 2L -> "abcd a")(2L) === Seq(0L, 2L))
  }

  test("whitespace splits words; empty and blank text encode to nothing") {
    assert(enc(hand, 1L -> "a  abcd\ta")(1L) === Seq(5L, 6L, 4L, 5L))
    assert(enc(hand, 2L -> "")(2L) === Seq.empty)
    assert(enc(hand, 3L -> " \t ")(3L) === Seq.empty)
  }

  test("decode strips ## markers, renders [UNK], and roundtrips covered text") {
    val got = Seq((1L, "abcd ab"), (2L, "azb abcd"), (3L, ""))
      .toDF("id", "t")
      .select(col("id"),
        WordPiece.decodeCol(WordPiece.encodeCol(col("t"), hand), hand).as("d"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "abcdab")       // covered: whitespace-deleted text
    assert(got(2L) === "[UNK]abcd")    // lossy arm: the word is GONE
    assert(got(3L) === "")
  }

  test("decode: out-of-range and null ids fail loudly by name") {
    val bad = Seq(Seq(99L)).toDF("ids")
      .select(WordPiece.decodeCol(col("ids"), hand))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage.contains("wordpiece_decode") ||
      Option(e.getCause).exists(_.getMessage.contains("wordpiece_decode")))
  }

  test("training scores by likelihood ratio, not raw pair frequency") {
    // pair (p,##q) occurs 2× — the LEAST frequent pair — but its parts
    // occur nowhere else, so n_ab/(n_a·n_b) = 2/4 dwarfs (x,##z) and
    // (w,##y) at 30/(39·30): WordPiece mints pq first where BPE would
    // have taken the 30× pairs
    val words = Seq.fill(9)("xy") ++ Seq.fill(2)("pq") ++
      Seq.fill(30)("xz") ++ Seq.fill(30)("wy")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val m1 = WordPiece.train(docs, "text", numMerges = 1).map(_.piece)
    assert(m1.contains("pq"))
    assert(!m1.contains("xz") && !m1.contains("wy") && !m1.contains("xy"))
    // merge 2: (x,##z) and (w,##y) tie EXACTLY (30/(39·30) both — the
    // cross-multiplied integer compare sees equality, no float fuzz);
    // the code-point-smallest (left, right) pair wins → wy, not xz
    val m2 = WordPiece.train(docs, "text", numMerges = 2).map(_.piece)
    assert(m2.contains("wy") && !m2.contains("xz"))
  }

  test("training: alphabet keeps the observed FORMS; ids are code-point ranks") {
    val docs = Seq((1L, "pq xz"), (2L, "pq wy xy")).toDF("doc_id", "text")
    val m = WordPiece.train(docs, "text", numMerges = 0)
    val pieces = m.map(_.piece)
    // q only ever occurs at a continuation position, p only word-initial
    assert(pieces.contains("##q") && !pieces.contains("q"))
    assert(pieces.contains("p") && !pieces.contains("##p"))
    // dense code-point-rank ids from 1 (0 is the implicit [UNK])
    assert(m.map(_.id) === m.indices.map(_ + 1L))
    assert(pieces === pieces.sorted)
  }

  test("training is deterministic under repartitioning and caps piece length") {
    val docs = (0 until 120).map { i =>
      (i.toLong, Seq("abcdefgh", "abcdefgh", "abcd", "efgh")(i % 4))
    }.toDF("doc_id", "text")
    def fit(parts: Int): Seq[Piece] =
      WordPiece.train(docs.repartition(parts), "text", numMerges = 20)
    val m = fit(2)
    assert(m === fit(7), "bit-identical across layouts")
    // MaxPieceLen: no minted piece exceeds 6 content code points even
    // with merges to spare on an 8-char word
    def contentLen(p: String): Int =
      (if (p.startsWith("##")) p.substring(2) else p).length
    assert(m.forall(p => contentLen(p.piece) <= WordPiece.MaxPieceLen))
  }

  test("two models in one plan segment independently (memo keyed per model)") {
    val rich = hand
    val poor = Seq(Piece(1L, "##b"), Piece(2L, "a"))  // 'ab' → a + ##b only
    val got = (0 until 50).map(i => (i.toLong, "ab")).toDF("id", "t")
      .select(
        WordPiece.encodeCol(col("t"), rich).as("r"),
        WordPiece.encodeCol(col("t"), poor).as("p"))
      .as[(Seq[Long], Seq[Long])].collect()
    got.foreach { case (r, p) =>
      assert(r === Seq(5L, 1L))
      assert(p === Seq(2L, 1L))
    }
  }

  test("reserved layout is enforced at plan build") {
    intercept[IllegalArgumentException] {
      WordPiece.encodeCol(lit("a"), Seq(Piece(0L, "a")))
    }
    intercept[IllegalArgumentException] {
      WordPiece.encodeCol(lit("a"), Seq(Piece(1L, "[UNK]")))
    }
  }

  test("encodeCol plans as a shuffle-free codegen'd map (StaticInvoke)") {
    val plan = spark.range(4)
      .select(WordPiece.encodeCol(concat(lit("ab c"), col("id")), hand))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("*("), s"codegen lost (no *(n) stage):\n$plan")
  }

  test("model validation (r18): over-long pieces and sparse ids fail at plan build") {
    // the encode kernel probes lengths MaxPieceLen..1 only — a longer
    // piece could never match, so it is a malformed model, rejected by
    // name when the Column is constructed (and by parseFor on the SQL
    // path below), not silently carried as a dead entry
    val e1 = intercept[IllegalArgumentException] {
      WordPiece.encodeCol(lit("x"), Seq(Piece(1L, "abcdefg")))
    }
    assert(e1.getMessage.contains("content code points"))
    // marker content length, not raw length: ##-prefixed 6-content piece ok
    WordPiece.encodeCol(lit("x"), Seq(Piece(1L, "##abcdef")))
    // the id-proportion bound now also holds at plan build (mirrors
    // parseFor's decode-table allocation guard)
    val e2 = intercept[IllegalArgumentException] {
      WordPiece.decodeCol(lit(Array(1L)), Seq(Piece(100000L, "a")))
    }
    assert(e2.getMessage.contains("out of proportion"))
    // SQL path: same rejection from the kernel's parseFor
    GraftExtensions.register(spark)
    val e3 = intercept[Throwable] {
      spark.sql("SELECT wordpiece_encode('x', array('abcdefg\t1')) AS ids")
        .collect()
    }
    val msgs = Iterator.iterate(e3)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("content code points"), msgs)
  }
}
