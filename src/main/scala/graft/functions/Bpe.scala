package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level byte-pair-encoding token counting with a TRAINED merge
  * table — the tokenizer-faithful upgrade to the whitespace/regex counts
  * of [[graft.operators.TextOps.tokenCounts]]: mixture budgets and packing
  * targets (token_budget_sample, seq_packing) are specified in TOKENIZER
  * tokens in production, and a whitespace proxy misprices short-word-rich
  * vs long-word-rich strata against each other.
  *
  * Algorithm (Sennrich et al., ACL 2016 merge training; byte-level base
  * alphabet per the public GPT-2 recipe, Radford et al. 2019):
  *  - base symbols: the UTF-8 BYTES of each whitespace-delimited word —
  *    every script (Latin, accented, CJK) is representable, nothing is
  *    stripped or case-folded, so counts are faithful for non-English
  *    text too (the earlier char-level form deleted everything outside
  *    [a-z], deflating de/fr/zh counts).
  *  - train: `numMerges` times, merge the most-frequent adjacent symbol
  *    pair across the word-frequency dict (deterministic tie-break:
  *    lexicographically smallest pair).
  *  - apply: process merges in rank order; within a rank, greedy
  *    left-to-right. Rank-monotone application equals the min-rank-loop
  *    form because merging never re-creates a consumed symbol.
  *
  * Symbols are rendered as 2-hex-digit strings per byte ("65", "c3"), so
  * the whole symbol/merge alphabet is regex-safe ASCII `[0-9a-f]` no
  * matter the input script — the DuckDB oracle replays application with
  * first-occurrence replace steps over a comma-delimited symbol string
  * built by `regexp_extract_all(lower(hex(word)), '[0-9a-f]{2}')`, and
  * byte-level symbols sidestep any JVM-vs-DuckDB case-folding or Unicode
  * normalization divergence (there is no casefold step at all).
  *
  * Scale shape: training is driver-side on a CAPPED word-frequency sample
  * (same discipline as the PQ codebooks — bounded driver material, never
  * collect-the-corpus); the merge table ships as ONE plan literal
  * (array of "a b" hex strings, like the OPQ rotation matrix) and
  * application is a native StaticInvoke kernel — a tight per-row JVM loop
  * inside whole-stage codegen with a per-thread distinct-word memo (Zipf
  * corpora re-apply the same few thousand words constantly). No
  * end-of-word marker — counts are what this kernel serves, and the
  * marker only matters for detokenization (documented deviation from the
  * paper's `</w>`).
  */
object Bpe {

  /** UTF-8 bytes of a word as 2-hex-digit base symbols ("65", "c3"). */
  private[graft] def hexSyms(w: String): Array[String] = {
    val bytes = w.getBytes(StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i) = f"$b%02x"
      i += 1
    }
    out
  }

  /** Train `numMerges` BPE merges from a text column. Words are the
    * whitespace-delimited tokens of the RAW text (no case folding, no
    * punctuation stripping — byte-level BPE sees the text as the
    * tokenizer would). Driver-side on the aggregated word-frequency dict,
    * CAPPED at `maxWords` distinct words (hash-ordered — deterministic,
    * unbiased); the per-word payload is a (word, count) pair, so even 65k
    * words is a few MB of driver memory. Returns merges in rank order as
    * (left, right) hex-symbol pairs. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 65536): Seq[(String, String)] = {
    val words = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(md5(col("w")), col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // symbols per distinct word, weighted by corpus frequency
    var dict: Array[(Array[String], Long)] =
      words.map { case (w, n) => (hexSyms(w), n) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    while (iter < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) iter = numMerges
      else {
        // max count; ties broken by the lexicographically smallest pair —
        // a total order, so training is deterministic for a given sample
        val best = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        dict = dict.map { case (syms, n) => (mergePair(syms, best), n) }
        iter += 1
      }
    }
    merges.toSeq
  }

  /** Greedy left-to-right single pass merging occurrences of `pair`;
    * equals repeated leftmost-occurrence replacement (merging at i can
    * never create a new occurrence ending at i: the merged symbol differs
    * from both halves). */
  private def mergePair(syms: Array[String],
                        pair: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Per-thread memo for the parsed merge table AND a distinct-word count
    * cache: a LITERAL merge array is one ArrayData instance per plan, so
    * an identity check skips the re-parse on every row of the scan, and
    * Zipf-distributed corpora hit the same few thousand distinct words
    * constantly — memoizing per-word counts turns the per-occurrence
    * O(|merges| × |word|) loop into a hash probe for repeat words. The
    * word memo is bounded (wordMemoCap) and cleared wholesale on overflow
    * or when the merge table changes. (The kernel stays correct for
    * per-row merge-array columns too — they just miss both memos.) */
  private val memoCap = 1 << 16
  private val pairMemo = new ThreadLocal[
    (ArrayData, Array[(String, String)], mutable.HashMap[String, Int])]

  private def parsePairs(merges: ArrayData)
      : (Array[(String, String)], mutable.HashMap[String, Int]) = {
    val hit = pairMemo.get()
    if (hit != null && (hit._1 eq merges)) return (hit._2, hit._3)
    val m = merges.numElements()
    val pairs = new Array[(String, String)](m)
    var i = 0
    while (i < m) {
      // loud, named errors for the SQL surface (the Column form validates
      // at plan build; SQL callers reach the kernel directly): a null
      // element, a malformed entry (no space, >1 space), or symbols
      // outside the hex-pair alphabet must not surface as a raw
      // NPE/StringIndexOutOfBounds from codegen — and must not become a
      // silent never-matching no-op either
      if (merges.isNullAt(i))
        throw new IllegalArgumentException(
          s"bpe_token_count: null merge entry at index $i")
      val s = merges.getUTF8String(i).toString
      val sp = s.indexOf(' ')
      if (sp <= 0 || sp == s.length - 1 || s.indexOf(' ', sp + 1) >= 0)
        throw new IllegalArgumentException(
          s"bpe_token_count: merge entry '$s' is not of the form 'left right'")
      val pair = (s.substring(0, sp), s.substring(sp + 1))
      if (!isHexSymbol(pair._1) || !isHexSymbol(pair._2))
        throw new IllegalArgumentException(
          s"bpe_token_count: merge entry '$s' is not over the byte-level " +
            "hex alphabet (each side must be one or more [0-9a-f] pairs)")
      pairs(i) = pair
      i += 1
    }
    val wordMemo = mutable.HashMap.empty[String, Int]
    pairMemo.set((merges, pairs, wordMemo))
    (pairs, wordMemo)
  }

  /** One or more 2-hex-digit byte symbols, concatenated. */
  private[graft] def isHexSymbol(s: String): Boolean = {
    if (s.isEmpty || (s.length & 1) == 1) return false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))) return false
      i += 1
    }
    true
  }

  private def countWord(w: String, pairs: Array[(String, String)]): Int = {
    var syms: Array[String] = hexSyms(w)
    var r = 0
    while (r < pairs.length && syms.length > 1) {
      syms = mergePair(syms, pairs(r))
      r += 1
    }
    syms.length
  }

  /** Kernel: byte-level BPE token count of `text` under `merges` (array
    * of "a b" hex-symbol strings in rank order). Called from codegen via
    * StaticInvoke. */
  def tokenCount(text: UTF8String, merges: ArrayData): Long = {
    val (pairs, wordMemo) = parsePairs(merges)
    var total = 0L
    val words = text.toString.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var n = wordMemo.getOrElse(w, -1)
        if (n < 0) {
          n = countWord(w, pairs)
          if (wordMemo.size >= memoCap) wordMemo.clear()
          wordMemo.update(w, n)
        }
        total += n
      }
      wi += 1
    }
    total
  }

  /** Per-thread memo for ENCODING: the symbol→id vocabulary derived from
    * the merge table plus a bounded word→ids cache (same Zipf argument as
    * the count memo). Vocabulary ids follow the public GPT-2 convention:
    * ids 0-255 are the base bytes; merge rank r mints id 256+r for its
    * concatenated symbol. If two merges produce the same concatenation
    * (possible: ("ab","c") and ("a","bc") both yield "abc"), the SMALLEST
    * rank's id wins — a total, engine-replayable rule (the oracle takes
    * min(rank) too). */
  private val encMemo = new ThreadLocal[
    (ArrayData, mutable.HashMap[String, Long], mutable.HashMap[String, Array[Long]])]

  private def encodeState(merges: ArrayData)
      : (Array[(String, String)], mutable.HashMap[String, Long],
         mutable.HashMap[String, Array[Long]]) = {
    val pairs = parsePairs(merges)._1
    val hit = encMemo.get()
    if (hit != null && (hit._1 eq merges)) return (pairs, hit._2, hit._3)
    val idMap = mutable.HashMap.empty[String, Long]
    var r = 0
    while (r < pairs.length) {
      val sym = pairs(r)._1 + pairs(r)._2
      if (!idMap.contains(sym)) idMap.update(sym, 256L + r)
      r += 1
    }
    val wordMemo = mutable.HashMap.empty[String, Array[Long]]
    encMemo.set((merges, idMap, wordMemo))
    (pairs, idMap, wordMemo)
  }

  private def encodeWord(w: String, pairs: Array[(String, String)],
                         idMap: mutable.HashMap[String, Long]): Array[Long] = {
    var syms: Array[String] = hexSyms(w)
    var r = 0
    while (r < pairs.length && syms.length > 1) {
      syms = mergePair(syms, pairs(r))
      r += 1
    }
    val out = new Array[Long](syms.length)
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      out(i) =
        if (s.length == 2) java.lang.Integer.parseInt(s, 16).toLong
        else idMap(s)
      i += 1
    }
    out
  }

  /** Kernel: byte-level BPE token-ID SEQUENCE of `text` under `merges` —
    * the encode half of the tokenizer story (tokenCount = its length).
    * Ids: base byte value for single-byte symbols, 256+rank for merged
    * symbols. Called from codegen via StaticInvoke. */
  def encode(text: UTF8String, merges: ArrayData): ArrayData = {
    val (pairs, idMap, wordMemo) = encodeState(merges)
    val out = mutable.ArrayBuilder.make[Long]
    val words = text.toString.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var ids = wordMemo.getOrElse(w, null)
        if (ids == null) {
          ids = encodeWord(w, pairs, idMap)
          if (wordMemo.size >= memoCap) wordMemo.clear()
          wordMemo.update(w, ids)
        }
        out ++= ids
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }

  /** Per-thread memo for DECODING: merge rank → UTF-8 bytes of its
    * concatenated symbol (same literal-identity discipline as the other
    * two memos). */
  private val decMemo = new ThreadLocal[(ArrayData, Array[Array[Byte]])]

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else c - 'a' + 10

  /** Bytes of a validated hex-symbol string ("6a6f" → [0x6a, 0x6f]). */
  private[graft] def hexToBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) =
        ((hexVal(s.charAt(2 * i)) << 4) | hexVal(s.charAt(2 * i + 1))).toByte
      i += 1
    }
    out
  }

  private def decodeState(merges: ArrayData): Array[Array[Byte]] = {
    val hit = decMemo.get()
    if (hit != null && (hit._1 eq merges)) return hit._2
    val pairs = parsePairs(merges)._1
    val syms = new Array[Array[Byte]](pairs.length)
    var r = 0
    while (r < pairs.length) {
      syms(r) = hexToBytes(pairs(r)._1 + pairs(r)._2)
      r += 1
    }
    decMemo.set((merges, syms))
    syms
  }

  /** Kernel: UTF-8 text of a token-ID sequence under `merges` — the
    * inverse of [[encode]] up to whitespace: encode splits on `\s+` and
    * keeps no end-of-word marker (the documented `</w>` deviation), so
    * `decode(encode(text)) == text` with every `\s+` run deleted, byte
    * for byte — the roundtrip contract the bpe_decode gate replays.
    * Ids 0-255 are raw bytes; 256+r is merge rank r's concatenated
    * symbol (a duplicate-concatenation rank decodes to the same bytes as
    * the min-rank id [[encode]] actually emits, so the inverse is total
    * over the whole id range). Null or out-of-range ids fail loudly by
    * name — a stream corrupted by an upstream bug must not decode to
    * silently-wrong text. */
  def decode(ids: ArrayData, merges: ArrayData): UTF8String = {
    val syms = decodeState(merges)
    val n = ids.numElements()
    // size pass first so the output buffer allocates exactly once
    var total = 0
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i))
        throw new IllegalArgumentException(
          s"bpe_decode: null token id at position $i")
      val id = ids.getLong(i)
      if (id < 0L || id >= 256L + syms.length)
        throw new IllegalArgumentException(
          s"bpe_decode: token id $id at position $i outside [0, " +
            s"${256 + syms.length}) for a ${syms.length}-merge table")
      total += (if (id < 256L) 1 else syms((id - 256L).toInt).length)
      i += 1
    }
    val out = new Array[Byte](total)
    var o = 0
    i = 0
    while (i < n) {
      val id = ids.getLong(i)
      if (id < 256L) {
        out(o) = id.toByte
        o += 1
      } else {
        val b = syms((id - 256L).toInt)
        System.arraycopy(b, 0, out, o, b.length)
        o += b.length
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column form of [[decode]]: string from an array<long> id column,
    * merge table as one plan literal. */
  def decodeCol(ids: Column, merges: Seq[(String, String)]): Column = {
    require(merges.forall { case (a, b) => isHexSymbol(a) && isHexSymbol(b) },
      "bpe merges must be hex byte symbols (one or more [0-9a-f] pairs per side)")
    val arrS = ArrayType(StringType, containsNull = false)
    GraftExpressionBridge.column(StaticInvoke(
      Bpe.getClass, StringType, "decode",
      Seq(GraftExpressionBridge.expression(ids),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          merges.map { case (a, b) => s"$a $b" }, arrS)),
      Seq(ArrayType(LongType), arrS), propagateNull = true,
      returnNullable = false))
  }

  /** Column form of [[encode]]: array<long> of token ids, merge table as
    * one plan literal. `length(encodeCol(...)) == tokenCountCol(...)` by
    * construction — spec-pinned. */
  def encodeCol(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.forall { case (a, b) => isHexSymbol(a) && isHexSymbol(b) },
      "bpe merges must be hex byte symbols (one or more [0-9a-f] pairs per side)")
    val arrS = ArrayType(StringType, containsNull = false)
    GraftExpressionBridge.column(StaticInvoke(
      Bpe.getClass, ArrayType(LongType, containsNull = false), "encode",
      Seq(GraftExpressionBridge.expression(text),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          merges.map { case (a, b) => s"$a $b" }, arrS)),
      Seq(StringType, arrS), propagateNull = true, returnNullable = false))
  }

  /** Column form: `merges` ships as one plan literal (validated at plan
    * build to the same hex-pair alphabet the kernel enforces). */
  def tokenCountCol(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.forall { case (a, b) => isHexSymbol(a) && isHexSymbol(b) },
      "bpe merges must be hex byte symbols (one or more [0-9a-f] pairs per side)")
    val arrS = ArrayType(StringType, containsNull = false)
    GraftExpressionBridge.column(StaticInvoke(
      Bpe.getClass, LongType, "tokenCount",
      Seq(GraftExpressionBridge.expression(text),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          merges.map { case (a, b) => s"$a $b" }, arrS)),
      Seq(StringType, arrS), propagateNull = true, returnNullable = false))
  }
}
