package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece subword tokenizer (Schuster & Nakajima, ICASSP 2012; the
  * tokenizer behind BERT, Devlin et al. 2019 — public knowledge): the
  * THIRD production tokenizer family beside [[Bpe]] and [[Unigram]],
  * completing the family triptych — and the third OOV discipline:
  * byte-level BPE can always fall to raw bytes, unigram byte-falls-back
  * explicitly, WordPiece maps a word it cannot segment to the lossy
  * `[UNK]` token (the production BERT behavior, and the reason modern
  * byte-covered vocabularies exist at all).
  *
  * INFERENCE is greedy longest-match-first per whitespace word: at each
  * position take the LONGEST vocabulary piece matching the remaining
  * text — continuation positions (pos > 0) match with the `##` marker
  * prepended — and if NO piece matches at some position the whole word
  * becomes `[UNK]` (never a partial prefix; the HF WordpieceTokenizer
  * contract). Greedy is deliberately not Viterbi: it is the documented
  * production algorithm, and the spec pins a case where it differs from
  * the optimal split.
  *
  * TRAINING is merge-based like BPE but scored by the likelihood ratio
  * `count(ab) / (count(a) · count(b))` (the WordPiece objective: merge
  * the pair whose joint probability most exceeds independence — the
  * public recipe documented in the HF tokenizers course): symbols are
  * code points with `##` on every non-initial position, each merge
  * concatenates a pair (the right side dropping its `##`) and mints one
  * vocabulary entry. Determinism: scores are compared by EXACT integer
  * cross-multiplication (BigInt — no float ratio anywhere), ties break
  * to the code-point-smallest (left, right) pair, and the word dict is
  * the same md5-capped sample as [[Bpe.train]] / [[Unigram.train]].
  * Merges that would mint a piece longer than [[MaxPieceLen]] content
  * code points are skipped (the [[Unigram.MaxPieceLen]] discipline —
  * bounds the oracle's per-length match ladder and the kernel's probe
  * loop; a documented deviation from unbounded production pieces).
  *
  * Scale shape mirrors the other two families: training is one
  * word-frequency aggregation + a driver-side merge loop on the capped
  * dict; the vocabulary ships as ONE plan literal and encoding is a
  * native StaticInvoke kernel (tight greedy loop in whole-stage codegen,
  * per-thread distinct-word memo keyed to the model literal). Ids:
  * 0 = `[UNK]`, trained pieces take their code-point lexicographic rank
  * from 1 — engine-unambiguous, so the golden vocab oracle and the
  * greedy replay both reconstruct them. */
object WordPiece {

  /** Reserved id for the unknown-word token. */
  val UnkId = 0L
  /** Rendered form of the unknown token (what [[decode]] emits). */
  val UnkPiece = "[UNK]"
  /** Continuation marker on non-word-initial pieces. */
  val Marker = "##"
  /** Maximum piece length in CONTENT code points (marker excluded). */
  val MaxPieceLen = 6
  /** First id a trained piece can take (0 is `[UNK]`). */
  val FirstTrainedId = 1L

  /** One vocabulary piece: code-point-rank id (from [[FirstTrainedId]])
    * and the piece text, marker included for continuation pieces. */
  final case class Piece(id: Long, piece: String)

  private def codePoints(w: String): Array[Int] = w.codePoints().toArray

  private def stripMarker(p: String): String =
    if (p.startsWith(Marker)) p.substring(Marker.length) else p

  /** Content length of a symbol in code points, marker excluded. */
  private def contentLen(p: String): Int = {
    val s = stripMarker(p)
    s.codePointCount(0, s.length)
  }

  /** Train a WordPiece vocabulary from a text column: the observed
    * alphabet (word-initial chars bare, non-initial chars `##`-marked,
    * exactly as they occur in the capped dict) plus one minted piece per
    * merge, `numMerges` times or until no mergeable pair remains.
    * Returns ALL pieces with code-point lexicographic-rank ids from 1
    * (`[UNK]` = 0 is implicit and not returned). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 65536): Seq[Piece] = {
    val words = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(md5(col("w")), col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // symbol sequences: first code point bare, the rest ##-marked
    var dict: Array[(Array[String], Long)] = words.map { case (w, n) =>
      val cps = codePoints(w)
      val syms = new Array[String](cps.length)
      var i = 0
      while (i < cps.length) {
        val c = new String(Character.toChars(cps(i)))
        syms(i) = if (i == 0) c else Marker + c
        i += 1
      }
      (syms, n)
    }

    val vocab = mutable.LinkedHashSet.empty[String]
    dict.foreach { case (syms, _) => syms.foreach(vocab += _) }

    val pairOrd: Ordering[(String, String)] =
      Ordering.Tuple2(Unigram.CodePointOrder, Unigram.CodePointOrder)
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      val symCounts = mutable.HashMap.empty[String, Long]
      dict.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + n)
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          }
          i += 1
        }
      }
      // candidates bounded by the piece-length cap; score = n_ab/(n_a·n_b)
      // compared exactly by cross-multiplication — no float ratio
      val cands = pairCounts.iterator.filter { case ((a, b), _) =>
        contentLen(a) + contentLen(b) <= MaxPieceLen
      }.toSeq
      if (cands.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        cands.foreach { cand =>
          if (best == null) best = cand
          else {
            val ((ba, bb), bn) = best
            val ((ca, cb), cn) = cand
            // cand > best  <=>  cn/(n_ca·n_cb) > bn/(n_ba·n_bb)
            val lhs = BigInt(cn) * BigInt(symCounts(ba)) * BigInt(symCounts(bb))
            val rhs = BigInt(bn) * BigInt(symCounts(ca)) * BigInt(symCounts(cb))
            if (lhs > rhs ||
                (lhs == rhs && pairOrd.lt((ca, cb), (ba, bb)))) best = cand
          }
        }
        val pair = best._1
        vocab += (pair._1 + stripMarker(pair._2))
        dict = dict.map { case (syms, n) => (mergePair(syms, pair), n) }
        iter += 1
      }
    }

    vocab.toSeq.sorted(Unigram.CodePointOrder).zipWithIndex.map {
      case (p, i) => Piece(FirstTrainedId + i, p)
    }
  }

  /** Greedy left-to-right single pass merging occurrences of `pair`
    * (the right side drops its `##` in the concatenation). */
  private def mergePair(syms: Array[String],
                        pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + stripMarker(syms(i + 1))
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  // ---- inference kernel ------------------------------------------------

  // model literal: one "piece\tid" string per piece (pieces are
  // whitespace-split word fragments, so \t can't occur). Parsed once per
  // (thread, literal identity) as a small identity map — the Unigram
  // discipline: decode(encode(x)) plans carry TWO literal instances of
  // the same model, and a one-slot cache would thrash between them. The
  // parse carries piece → id for encode and a dense id → piece array for
  // decode (index 0 = [UNK]).
  private val parsed = new ThreadLocal[
      java.util.IdentityHashMap[AnyRef, (Map[String, Long], Array[String])]] {
    override def initialValue()
        : java.util.IdentityHashMap[AnyRef, (Map[String, Long], Array[String])] =
      new java.util.IdentityHashMap
  }
  private val parsedCap = 8
  // word→ids memos keyed to the model literal they were computed under,
  // as a small identity map like the parse cache — a one-slot memo
  // thrashes when two models share one plan (the decode(encode(x))
  // shape): every model switch would miss the `eq` check and reallocate,
  // turning the memo into per-row GC churn with zero hits
  private val wordMemo = new ThreadLocal[TokenizerMemo.Memo] {
    override def initialValue(): TokenizerMemo.Memo = new TokenizerMemo.Memo
  }
  private val wordMemoCap = 1 << 17

  // model-count cap + MRU-2-shielded eviction live in TokenizerMemo (one
  // definition for both tokenizer families)
  private def wordMemoFor(model: AnyRef): java.util.HashMap[String, Array[Long]] =
    TokenizerMemo.forModel(wordMemo.get(), model)

  private def parseFor(lit: ArrayData): (Map[String, Long], Array[String]) = {
    val cache = parsed.get()
    val hit = cache.get(lit)
    if (hit != null) hit
    else {
      // named errors at the SQL boundary (the Bpe.parsePairs discipline):
      // wordpiece_encode/wordpiece_decode in SQL reach the kernel with a
      // caller-supplied model array — malformed rows fail by name, and a
      // bogus huge id must not size the decode array
      val m = (0 until lit.numElements()).iterator.map { i =>
        if (lit.isNullAt(i))
          throw new IllegalArgumentException(
            s"wordpiece model: null row at index $i")
        val s = lit.getUTF8String(i).toString
        val parts = s.split('\t')
        val parsed =
          if (parts.length != 2 || parts(0).isEmpty) None
          else parts(1).toLongOption match {
            case Some(id) if id >= 1 && id <= (1 << 24) =>
              Some(parts(0) -> id)
            case _ => None
          }
        val entry = parsed.getOrElse(throw new IllegalArgumentException(
          s"wordpiece model: row '$s' is not 'piece\\tid' with a nonempty " +
            s"piece and id in [1, ${1 << 24}]"))
        // the encode kernel probes lengths min(MaxPieceLen, remaining)..1
        // and the SQL oracle's match ladder stops at MaxPieceLen, so a
        // longer piece would be a silently unmatchable dead entry — a
        // malformed model, rejected by name (fail-loudly discipline)
        if (contentLen(entry._1) > MaxPieceLen)
          throw new IllegalArgumentException(
            s"wordpiece model: piece '${entry._1}' exceeds $MaxPieceLen " +
              "content code points — the greedy matcher never probes " +
              "longer pieces, so it could never match")
        entry
      }.toMap
      val maxId = if (m.isEmpty) 0 else m.valuesIterator.max.toInt
      // the decode array is sized by maxId — bound the allocation by the
      // MODEL SIZE, not just an absolute cap: ids 4x sparser than the row
      // count (+ slack for the reserved range) mean a malformed model,
      // and accepting them would let one adversarial row pin a ~134 MB
      // array per cached literal despite the per-id cap above
      if (maxId > math.max(1024, 4 * m.size))
        throw new IllegalArgumentException(
          s"wordpiece model: max id $maxId is out of proportion to the " +
            s"${m.size}-row vocabulary (dense code-point-rank ids expected)")
      val byId = Array.fill(maxId + 1)("")
      byId(UnkId.toInt) = UnkPiece
      m.foreach { case (p, id) => byId(id.toInt) = p }
      val entry = (m, byId)
      if (cache.size >= parsedCap) cache.clear()
      cache.put(lit, entry)
      entry
    }
  }

  private def encodeWord(w: String, m: Map[String, Long],
                         memo: java.util.HashMap[String, Array[Long]]): Array[Long] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    val cps = codePoints(w)
    val n = cps.length
    val out = mutable.ArrayBuffer.empty[Long]
    var i = 0
    var failed = false
    while (i < n && !failed) {
      var len = math.min(MaxPieceLen, n - i)
      var matched = -1L
      while (len >= 1 && matched < 0) {
        val sub = new String(cps, i, len)
        val key = if (i == 0) sub else Marker + sub
        m.get(key) match {
          case Some(id) => matched = id
          case None => len -= 1
        }
      }
      if (matched < 0) failed = true
      else {
        out += matched
        i += len
      }
    }
    val ids = if (failed) Array(UnkId) else out.toArray
    if (memo.size < wordMemoCap) memo.put(w, ids)
    ids
  }

  /** Static kernel: whitespace-split `text`, greedy-longest-match each
    * word against the vocabulary (continuation positions probe with the
    * `##` marker), concatenate the piece ids; a word with an unmatchable
    * position emits the single id 0 (`[UNK]`) — the whole-word UNK rule. */
  def encode(text: UTF8String, model: ArrayData): ArrayData = {
    val m = parseFor(model)._1
    val memo = wordMemoFor(model)
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    val out = mutable.ArrayBuffer.empty[Long]
    words.foreach(w => out ++= encodeWord(w, m, memo))
    new GenericArrayData(out.toArray)
  }

  /** Static kernel: piece ids back to text — trained pieces contribute
    * their text with the `##` marker stripped, id 0 renders as the
    * literal `[UNK]` (the production detokenizer behavior: the word is
    * GONE; WordPiece's OOV discipline is lossy by design, unlike
    * unigram's byte fallback). Null or out-of-range ids fail loudly. */
  def decode(ids: ArrayData, model: ArrayData): UTF8String = {
    val byId = parseFor(model)._2
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      if (ids.isNullAt(i))
        throw new IllegalArgumentException(
          s"wordpiece_decode: null piece id at position $i")
      val id = ids.getLong(i)
      if (id < 0L || id >= byId.length || byId(id.toInt).isEmpty)
        throw new IllegalArgumentException(
          s"wordpiece_decode: piece id $id at position $i outside the " +
            s"${byId.length}-entry vocabulary")
      sb.append(if (id == UnkId) UnkPiece else stripMarker(byId(id.toInt)))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def checkLayout(model: Seq[Piece]): Unit = {
    require(model.forall(_.id >= FirstTrainedId),
      s"trained piece ids must be >= $FirstTrainedId: 0 is the reserved [UNK]")
    require(model.forall(p => p.piece.nonEmpty && p.piece != UnkPiece),
      "pieces must be nonempty and must not shadow the reserved [UNK]")
    // mirror parseFor's kernel-side bounds at PLAN BUILD, so a hand-built
    // model fails when the Column is constructed, not per-task at runtime
    model.find(p => contentLen(p.piece) > MaxPieceLen).foreach(p =>
      throw new IllegalArgumentException(
        s"wordpiece model: piece '${p.piece}' exceeds $MaxPieceLen " +
          "content code points — the greedy matcher never probes " +
          "longer pieces, so it could never match"))
    // duplicate pieces make the model ambiguous (the kernel's toMap
    // silently keeps the last) AND would let the proportion bound below
    // pass on the raw row count while parseFor re-checks it against the
    // DEDUPED size at task runtime — reject them here so plan build and
    // kernel agree on what "model size" means
    require(model.map(_.piece).distinct.size == model.size,
      "wordpiece model: duplicate pieces (each piece must appear once)")
    if (model.nonEmpty) {
      val maxId = model.map(_.id).max
      require(maxId <= math.max(1024, 4L * model.size),
        s"wordpiece model: max id $maxId is out of proportion to the " +
          s"${model.size}-row vocabulary (dense code-point-rank ids " +
          "expected; the decode table is sized by max id)")
    }
  }

  private def modelLit(model: Seq[Piece])
      : org.apache.spark.sql.catalyst.expressions.Literal =
    org.apache.spark.sql.catalyst.expressions.Literal.create(
      model.map(p => s"${p.piece}\t${p.id}"),
      ArrayType(StringType, containsNull = false))

  /** Column form: array<long> of piece ids; the vocabulary as one plan
    * literal (the Bpe/Unigram encodeCol shape). */
  def encodeCol(text: Column, model: Seq[Piece]): Column = {
    checkLayout(model)
    GraftExpressionBridge.column(StaticInvoke(
      WordPiece.getClass, ArrayType(LongType, containsNull = false), "encode",
      Seq(GraftExpressionBridge.expression(text), modelLit(model)),
      Seq(StringType, ArrayType(StringType, containsNull = false)),
      propagateNull = true, returnNullable = false))
  }

  /** Column form of [[decode]]. */
  def decodeCol(ids: Column, model: Seq[Piece]): Column = {
    checkLayout(model)
    GraftExpressionBridge.column(StaticInvoke(
      WordPiece.getClass, StringType, "decode",
      Seq(GraftExpressionBridge.expression(ids), modelLit(model)),
      Seq(ArrayType(LongType), ArrayType(StringType, containsNull = false)),
      propagateNull = true, returnNullable = false))
  }
}
