package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding token counting with a TRAINED merge table — the
  * tokenizer-faithful upgrade to the whitespace/regex counts of
  * [[graft.operators.TextOps.tokenCounts]]: mixture budgets and packing
  * targets (token_budget_sample, seq_packing) are specified in TOKENIZER
  * tokens in production, and a whitespace proxy misprices short-word-rich
  * vs long-word-rich strata against each other.
  *
  * Algorithm (Sennrich et al., ACL 2016, "Neural Machine Translation of
  * Rare Words with Subword Units" — the public BPE formulation):
  *  - train: start from characters; `numMerges` times, merge the
  *    most-frequent adjacent symbol pair across the word-frequency dict
  *    (deterministic tie-break: lexicographically smallest pair).
  *  - apply: process merges in rank order; within a rank, greedy
  *    left-to-right. Rank-monotone application equals the min-rank-loop
  *    form because merging never re-creates a consumed symbol.
  *
  * Scale shape: training is driver-side on a CAPPED word-frequency sample
  * (same discipline as the PQ codebooks — bounded driver material, never
  * collect-the-corpus); the merge table ships as ONE plan literal
  * (array of "a b" strings, like the OPQ rotation matrix) and application
  * is a native StaticInvoke kernel — a tight per-row JVM loop inside
  * whole-stage codegen, O(|merges| × |word|) per word, no per-token
  * allocation churn beyond the symbol buffer. No end-of-word marker —
  * counts are what this kernel serves, and the marker only matters for
  * detokenization (documented deviation from the paper's `</w>`).
  *
  * Text is pre-normalized IN PLAN to lowercase [a-z ] (everything else →
  * space) so the symbol alphabet is regex-safe — the DuckDB oracle
  * replays application with first-occurrence regexp_replace steps over a
  * comma-delimited symbol string, and unescaped symbols keep that replay
  * exact.
  */
object Bpe {

  /** In-plan normalization shared by train and apply (and mirrored by the
    * oracle): lowercase, non-[a-z] → space. */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z]+", " ")

  /** Train `numMerges` BPE merges from a text column. Driver-side on the
    * aggregated word-frequency dict, CAPPED at `maxWords` distinct words
    * (hash-ordered — deterministic, unbiased); the per-word payload is a
    * (word, count) pair, so even 65k words is a few MB of driver memory.
    * Returns merges in rank order as (left, right) symbol pairs. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 65536): Seq[(String, String)] = {
    val words = df
      .select(explode(split(trim(normalize(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(md5(col("w")), col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // symbols per distinct word, weighted by corpus frequency
    var dict: Array[(Array[String], Long)] =
      words.map { case (w, n) => (w.map(_.toString).toArray, n) }
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

  /** Per-thread memo for the parsed merge table: a LITERAL merge array is
    * one ArrayData instance per plan, so an identity check skips the
    * re-parse on every row of the scan (the kernel stays correct for
    * per-row array columns too — they just miss the memo). */
  private val pairMemo =
    new ThreadLocal[(ArrayData, Array[(String, String)])]

  private def parsePairs(merges: ArrayData): Array[(String, String)] = {
    val hit = pairMemo.get()
    if (hit != null && (hit._1 eq merges)) return hit._2
    val m = merges.numElements()
    val pairs = new Array[(String, String)](m)
    var i = 0
    while (i < m) {
      // loud, named errors for the SQL surface (the Column form validates
      // at plan build; SQL callers reach the kernel directly): a null
      // element or an entry without the 'a b' shape must not surface as a
      // raw NPE/StringIndexOutOfBounds from codegen
      if (merges.isNullAt(i))
        throw new IllegalArgumentException(
          s"bpe_token_count: null merge entry at index $i")
      val s = merges.getUTF8String(i).toString
      val sp = s.indexOf(' ')
      if (sp <= 0 || sp == s.length - 1)
        throw new IllegalArgumentException(
          s"bpe_token_count: merge entry '$s' is not of the form 'left right'")
      pairs(i) = (s.substring(0, sp), s.substring(sp + 1))
      i += 1
    }
    pairMemo.set((merges, pairs))
    pairs
  }

  /** Kernel: BPE token count of `text` under `merges` (array of "a b"
    * strings in rank order). Called from codegen via StaticInvoke. */
  def tokenCount(text: UTF8String, merges: ArrayData): Long = {
    val pairs = parsePairs(merges)
    val m = pairs.length
    var total = 0L
    val words = text.trim.toString.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms: Array[String] = w.map(_.toString).toArray
        var r = 0
        while (r < m && syms.length > 1) {
          syms = mergePair(syms, pairs(r))
          r += 1
        }
        total += syms.length
      }
      wi += 1
    }
    total
  }

  /** Column form: `merges` ships as one plan literal. */
  def tokenCountCol(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.forall { case (a, b) =>
      (a + b).forall(c => c >= 'a' && c <= 'z') },
      "bpe merges must be over the normalized [a-z] alphabet")
    val arrS = ArrayType(StringType, containsNull = false)
    GraftExpressionBridge.column(StaticInvoke(
      Bpe.getClass, LongType, "tokenCount",
      Seq(GraftExpressionBridge.expression(normalize(text)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          merges.map { case (a, b) => s"$a $b" }, arrS)),
      Seq(StringType, arrS), propagateNull = true, returnNullable = false))
  }
}
