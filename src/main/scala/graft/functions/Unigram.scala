package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM subword tokenizer (Kudo, ACL 2018 "Subword Regularization" —
  * public knowledge; the SentencePiece-unigram recipe behind T5/Llama
  * vocabularies): the OTHER production tokenizer family beside [[Bpe]].
  * Where BPE composes a word bottom-up through trained merges, unigram
  * starts from a rich candidate-piece pool and SELECTS: each word is
  * segmented by Viterbi into the pieces maximizing Σ log p(piece), and
  * training alternates hard-EM expected counts with probability
  * re-estimation, pruning pieces the segmentations stopped using.
  *
  * Three determinism decisions make the whole thing engine-replayable:
  *
  *  - INTEGER SCORES EVERYWHERE: piece log-probs are 1e6-scaled Longs
  *    (StrictMath.log, bit-exact across JVMs, rint-rounded once) and
  *    Viterbi compares exact integer sums — in TRAINING's E-step too, so
  *    the trained artifact never depends on a float comparison.
  *  - TOTAL-ORDER TIE-BREAKS: equal-score DP states prefer the LONGEST
  *    candidate piece (smallest predecessor index); vocabulary pruning
  *    orders by (count desc, piece asc); ids are the lexicographic rank
  *    of the final pieces (id 0 reserved for UNK). All piece orderings
  *    are CODE-POINT order (≡ UTF-8 byte order), not JVM UTF-16 order,
  *    so a second engine computes the same ranks. Training is a pure
  *    function of the word-frequency dict.
  *  - CAPPED DRIVER MATERIAL: the word dict is the same md5-ordered
  *    `maxWords` sample as [[Bpe.train]]; the candidate pool is capped
  *    (single chars always kept — the coverage guarantee — plus the top
  *    `seedPool` multi-char substrings), so training memory is bounded
  *    regardless of corpus size.
  *
  * Scale shape mirrors Bpe: training is one word-frequency aggregation +
  * driver-side EM on the capped dict; the model ships as ONE plan literal
  * and encoding is a native StaticInvoke kernel (tight per-row Viterbi in
  * whole-stage codegen, per-thread distinct-word memo for zipfian text).
  * Segmentation is per whitespace word (no cross-word pieces, no ▁
  * marker — the same documented deviation as Bpe's missing `</w>`);
  * characters unseen in training score at the fixed UNK penalty in the
  * DP but EMIT their UTF-8 bytes' fixed ids (1 + byteValue, ids 1..256
  * — SentencePiece byte_fallback, the production recipe behind Llama
  * vocabularies), so encoding is total and decode(encode(x)) restores
  * unseen scripts byte-for-byte instead of dropping them at UNK. */
object Unigram {

  /** ln p scaled by 1e6 into Longs — the unit of every score here. */
  val Scale = 1e6
  /** Reserved id 0: kept for decoder compatibility (decodes to nothing),
    * but encode no longer emits it — byte fallback covers every char. */
  val UnkId = 0L
  /** Fixed UNK penalty (ln p = -20, far below any trained piece) — still
    * the DP score of an unseen char; only the EMITTED ids changed. */
  val UnkPenalty: Long = -20000000L
  /** Maximum piece length in code points. */
  val MaxPieceLen = 6
  /** Byte-fallback pieces occupy the 256 FIXED ids right after UNK
    * (id = 1 + byteValue, the SentencePiece byte_fallback layout behind
    * Llama vocabularies): a char outside the trained vocabulary encodes
    * as its UTF-8 bytes' ids instead of the lossy UNK, making
    * decode(encode(x)) total over arbitrary input. */
  val FirstByteId = 1L
  /** First id a TRAINED piece can take (above UNK + the 256 byte ids). */
  val FirstTrainedId = 257L

  /** One trained piece: lexicographic-rank id (starting at
    * [[FirstTrainedId]]; 0 = UNK, 1..256 = byte fallback), the piece
    * text, and its 1e6-scaled log-probability. */
  final case class Piece(id: Long, piece: String, logp: Long)

  private def codePoints(w: String): Array[Int] = w.codePoints().toArray

  /** Code-point lexicographic order (≡ UTF-8 byte order), the order a
    * second engine (DuckDB) computes for string comparison. Scala's
    * default String ordering is UTF-16 code-unit order, which ranks
    * supplementary-plane pieces BELOW U+E000..U+FFFF ones — every
    * vocabulary sort/tie-break here uses this ordering instead so the
    * trained artifact is engine-unambiguous. */
  private[functions] object CodePointOrder extends Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** Integer-score Viterbi over one word's code points against a
    * piece→logp map; ties prefer the longest final piece. Returns the
    * piece strings in order (UNK chars come back as their 1-char text —
    * the caller maps to ids/penalties). */
  private def viterbi(cps: Array[Int], logp: String => Option[Long])
      : Seq[String] = {
    val n = cps.length
    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    var pos = 1
    while (pos <= n) {
      var best = Long.MinValue
      var bestLen = 1
      var plen = 1
      val maxLen = math.min(MaxPieceLen, pos)
      while (plen <= maxLen) {
        val piece = new String(cps, pos - plen, plen)
        val s = logp(piece) match {
          case Some(lp) => Some(dp(pos - plen) + lp)
          case None if plen == 1 => Some(dp(pos - plen) + UnkPenalty)
          case None => None
        }
        s.foreach { cand =>
          // >= : on ties the LARGER plen (seen later) wins — longest piece
          if (cand > best || (cand == best && plen > bestLen)) {
            best = cand; bestLen = plen
          }
        }
        plen += 1
      }
      dp(pos) = best
      bp(pos) = bestLen
      pos += 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val plen = bp(p)
      out += new String(cps, p - plen, plen)
      p -= plen
    }
    out.reverse.toSeq
  }

  /** Train a `vocabSize` unigram vocabulary from a text column. Word
    * dict capped and md5-ordered like [[Bpe.train]]; all single
    * characters seen in training are always retained (coverage), so
    * `vocabSize` must exceed the corpus' distinct-character count. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            iters: Int = 3, maxWords: Int = 65536,
            seedPool: Int = 4096): Seq[Piece] = {
    val words = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(md5(col("w")), col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (codePoints(r.getString(0)), r.getLong(1)))

    // seed pool: every substring up to MaxPieceLen, weighted by word
    // frequency; single chars always kept, multi-char capped at seedPool
    val seedCounts = mutable.HashMap.empty[String, Long]
    words.foreach { case (cps, n) =>
      var i = 0
      while (i < cps.length) {
        var l = 1
        val maxL = math.min(MaxPieceLen, cps.length - i)
        while (l <= maxL) {
          val p = new String(cps, i, l)
          seedCounts.update(p, seedCounts.getOrElse(p, 0L) + n)
          l += 1
        }
        i += 1
      }
    }
    val chars = seedCounts.keysIterator
      .filter(p => p.codePointCount(0, p.length) == 1).toSeq.sorted(CodePointOrder)
    val multis = seedCounts.toSeq
      .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .sortBy { case (p, c) => (-c, p) }(Ordering.Tuple2(Ordering.Long, CodePointOrder))
      .take(seedPool)
      .map(_._1)
    require(vocabSize > chars.size,
      s"vocabSize $vocabSize must exceed the ${chars.size} distinct training chars")

    def rescale(counts: collection.Map[String, Long]): Map[String, Long] = {
      val total = counts.valuesIterator.sum.toDouble
      counts.iterator.map { case (p, c) =>
        p -> math.rint(StrictMath.log(c / total) * Scale).toLong
      }.toMap
    }

    var model: Map[String, Long] =
      rescale((chars ++ multis).map(p => p -> seedCounts(p)).toMap)

    // hard-EM: Viterbi-segment the dict with the current integer model,
    // re-estimate probabilities from usage, drop unused multi-char pieces
    var it = 0
    while (it < iters) {
      val used = mutable.HashMap.empty[String, Long]
      words.foreach { case (cps, n) =>
        viterbi(cps, model.get).foreach { p =>
          used.update(p, used.getOrElse(p, 0L) + n)
        }
      }
      // coverage floor: a char the segmentations stopped using stays at
      // count 1 so unseen-word scoring can always fall back to it
      chars.foreach(c => if (!used.contains(c)) used.update(c, 1L))
      model = rescale(used)
      it += 1
    }

    // final selection: all chars + the top multi-char pieces by
    // (EM count desc, piece asc); re-normalize over the kept set
    val finalCounts = {
      val used = mutable.HashMap.empty[String, Long]
      words.foreach { case (cps, n) =>
        viterbi(cps, model.get).foreach { p =>
          used.update(p, used.getOrElse(p, 0L) + n)
        }
      }
      chars.foreach(c => if (!used.contains(c)) used.update(c, 1L))
      used
    }
    val keptMulti = finalCounts.toSeq
      .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .sortBy { case (p, c) => (-c, p) }(Ordering.Tuple2(Ordering.Long, CodePointOrder))
      .take(vocabSize - chars.size)
      .map(_._1)
    val kept = (chars ++ keptMulti).map(p => p -> finalCounts(p)).toMap
    val logps = rescale(kept)
    kept.keysIterator.toSeq.sorted(CodePointOrder).zipWithIndex.map { case (p, i) =>
      Piece(i + FirstTrainedId, p, logps(p))
    }
  }

  // ---- inference kernel ------------------------------------------------

  // model literal: one "piece\tid\tlogp" string per piece (pieces are
  // whitespace-split words, so \t can't occur in them). Parsed once per
  // (thread, literal identity) — the Bpe memo discipline, but as a small
  // IDENTITY MAP, not a single entry: decode(encode(x)) plans carry TWO
  // literal instances of the same model, and a one-slot cache would
  // re-parse (and wipe the word memo) on every row as they alternate.
  // The parse carries both directions: piece → (id, logp) for encode,
  // id → piece for decode (dense array, UNK id 0 = empty string).
  private val parsed = new ThreadLocal[
      java.util.IdentityHashMap[AnyRef, (Map[String, (Long, Long)], Array[String])]] {
    override def initialValue()
        : java.util.IdentityHashMap[AnyRef, (Map[String, (Long, Long)], Array[String])] =
      new java.util.IdentityHashMap
  }
  private val parsedCap = 8
  // word→ids memos KEYED to the model literal they were computed under
  // (a clear-on-new-parse scheme would serve model A's ids to model B if
  // two models shared a plan), held as a small identity MAP like the
  // parse cache: the earlier one-slot form thrashed when two models
  // alternated row-by-row in one plan — every switch missed the `eq`
  // check and reallocated a fresh HashMap, zero hits, pure GC churn
  private val wordMemo = new ThreadLocal[TokenizerMemo.Memo] {
    override def initialValue(): TokenizerMemo.Memo = new TokenizerMemo.Memo
  }
  private val wordMemoCap = 1 << 17

  // model-count cap + MRU-2-shielded eviction live in TokenizerMemo (one
  // definition for both tokenizer families)
  private def wordMemoFor(model: AnyRef): java.util.HashMap[String, Array[Long]] =
    TokenizerMemo.forModel(wordMemo.get(), model)

  private def modelFor(lit: ArrayData): Map[String, (Long, Long)] =
    parseFor(lit)._1

  private def parseFor(lit: ArrayData)
      : (Map[String, (Long, Long)], Array[String]) = {
    val cache = parsed.get()
    val hit = cache.get(lit)
    if (hit != null) hit
    else {
      // named errors at the SQL boundary (the Bpe.parsePairs discipline —
      // the Column form validates at plan build, but unigram_encode/
      // unigram_decode in SQL reach the kernel directly): malformed rows
      // must not surface as raw codegen exceptions, and a bogus huge id
      // must not size the decode array
      val m = (0 until lit.numElements()).iterator.map { i =>
        if (lit.isNullAt(i))
          throw new IllegalArgumentException(
            s"unigram model: null row at index $i")
        val s = lit.getUTF8String(i).toString
        val parts = s.split('\t')
        val parsed =
          if (parts.length != 3 || parts(0).isEmpty) None
          else (parts(1).toLongOption, parts(2).toLongOption) match {
            case (Some(id), Some(lp)) if id >= 0 && id <= (1 << 24) =>
              Some(parts(0) -> (id, lp))
            case _ => None
          }
        parsed.getOrElse(throw new IllegalArgumentException(
          s"unigram model: row '$s' is not 'piece\\tid\\tlogp' with a " +
            s"nonempty piece and id in [0, ${1 << 24}]"))
      }.toMap
      val maxId = if (m.isEmpty) 0 else m.valuesIterator.map(_._1).max.toInt
      // bound the decode-array allocation by the model size (+ the 257
      // reserved UNK/byte-fallback ids and rank slack), not just the
      // absolute id cap — see the WordPiece.parseFor rationale
      if (maxId > math.max(1024, 4 * m.size + FirstTrainedId.toInt))
        throw new IllegalArgumentException(
          s"unigram model: max id $maxId is out of proportion to the " +
            s"${m.size}-row vocabulary (lexicographic-rank ids from " +
            s"$FirstTrainedId expected)")
      val byId = Array.fill(maxId + 1)("")
      m.foreach { case (p, (id, _)) => byId(id.toInt) = p }
      val entry = (m, byId)
      if (cache.size >= parsedCap) cache.clear()
      cache.put(lit, entry)
      entry
    }
  }

  private def encodeWord(w: String, m: Map[String, (Long, Long)],
                         memo: java.util.HashMap[String, Array[Long]]): Array[Long] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    // byte fallback: a Viterbi step that fell to the UNK rung (a 1-char
    // piece outside the vocabulary) expands to its UTF-8 bytes' fixed
    // ids instead of the lossy UNK 0
    val ids = viterbi(codePoints(w), p => m.get(p).map(_._2))
      .flatMap { p =>
        m.get(p) match {
          case Some((id, _)) => id :: Nil
          case None => p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .toSeq.map(b => FirstByteId + (b & 0xff))
        }
      }.toArray
    if (memo.size < wordMemoCap) memo.put(w, ids)
    ids
  }

  /** Static kernel: whitespace-split `text`, Viterbi-segment each word,
    * concatenate the piece ids (UNK id 0 for unseen characters). Split
    * is bare \s+ with empties filtered — NOT String.trim first: Java
    * trim strips every char ≤ U+0020 (controls included), which the
    * oracle's split-and-filter does not, so a control char at a text
    * edge would silently vanish on one side only. */
  def encode(text: UTF8String, model: ArrayData): ArrayData = {
    val m = modelFor(model)
    val memo = wordMemoFor(model)
    val words = text.toString.split("\\s+").filter(_.nonEmpty)
    val out = mutable.ArrayBuffer.empty[Long]
    words.foreach(w => out ++= encodeWord(w, m, memo))
    new GenericArrayData(out.toArray)
  }

  /** Static kernel: piece ids back to text, assembled at the BYTE level —
    * trained pieces contribute their UTF-8 bytes, byte-fallback ids
    * 1..256 contribute their single byte (adjacent byte ids reassemble
    * into the original multi-byte chars), so decode(encode(word)) == word
    * for ARBITRARY input, covered or not. UNK id 0 decodes to nothing
    * (decoder compatibility with pre-fallback streams). A whole-word
    * roundtrip stays inside whole-stage codegen where the
    * element_at-over-map Column form fell to an interpreted HOF. */
  def decode(ids: ArrayData, model: ArrayData): UTF8String = {
    val byId = parseFor(model)._2
    val bos = new java.io.ByteArrayOutputStream(64)
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      val id = ids.getLong(i).toInt
      if (id >= FirstTrainedId && id < byId.length) {
        val p = byId(id)
        if (p.nonEmpty)
          bos.write(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } else if (id >= 1 && id <= 256) bos.write(id - 1)
      i += 1
    }
    UTF8String.fromBytes(bos.toByteArray)
  }

  private def checkLayout(model: Seq[Piece]): Unit = {
    require(model.forall(_.id >= FirstTrainedId),
      s"trained piece ids must be >= $FirstTrainedId: ids 1..256 are the " +
        "reserved byte-fallback pieces, 0 is UNK")
    // mirror parseFor's id-proportion bound at PLAN BUILD (tightened
    // contract, r18): ids must be near-dense above FirstTrainedId — the
    // decode table is sized by max id, so a hand-built sparse-id model
    // (one piece with id 10000) is rejected when the Column is
    // constructed instead of failing per-task at runtime
    // duplicate pieces make the model ambiguous (the kernel's toMap
    // silently keeps the last) AND would let the proportion bound below
    // pass on the raw row count while parseFor re-checks it against the
    // DEDUPED size at task runtime — reject them here so plan build and
    // kernel agree on what "model size" means
    require(model.map(_.piece).distinct.size == model.size,
      "unigram model: duplicate pieces (each piece must appear once)")
    if (model.nonEmpty) {
      val maxId = model.map(_.id).max
      require(maxId <= math.max(1024, 4L * model.size + FirstTrainedId),
        s"unigram model: max id $maxId is out of proportion to the " +
          s"${model.size}-row vocabulary (lexicographic-rank ids from " +
          s"$FirstTrainedId expected; the decode table is sized by max id)")
    }
  }

  /** Column form of [[decode]] (the Bpe.decodeCol shape). */
  def decodeCol(ids: Column, model: Seq[Piece]): Column = {
    checkLayout(model)
    val arrS = ArrayType(StringType, containsNull = false)
    GraftExpressionBridge.column(StaticInvoke(
      Unigram.getClass, StringType, "decode",
      Seq(GraftExpressionBridge.expression(ids),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          model.map(p => s"${p.piece}\t${p.id}\t${p.logp}"), arrS)),
      Seq(ArrayType(LongType), arrS), propagateNull = true,
      returnNullable = false))
  }

  /** Column form: array<long> of piece ids; the model as one plan
    * literal (the Bpe.encodeCol shape). */
  def encodeCol(text: Column, model: Seq[Piece]): Column = {
    checkLayout(model)
    val arrS = ArrayType(StringType, containsNull = false)
    GraftExpressionBridge.column(StaticInvoke(
      Unigram.getClass, ArrayType(LongType, containsNull = false), "encode",
      Seq(GraftExpressionBridge.expression(text),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          model.map(p => s"${p.piece}\t${p.id}\t${p.logp}"), arrS)),
      Seq(StringType, arrS), propagateNull = true, returnNullable = false))
  }
}
