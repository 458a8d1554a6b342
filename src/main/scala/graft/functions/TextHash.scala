package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing hot loops (SimHash,
  * MinHash shingle hashing, MinHash signatures).
  *
  * The Column-function forms of these operators (aggregate + zip_with over
  * per-token arrays) are semantically right but allocate an accumulator
  * array per token per row; at corpus scale the map stage is pure CPU tax.
  * These `StaticInvoke` expressions compile to a direct static call inside
  * whole-stage codegen — one tight JVM loop per row, zero per-token
  * allocation — and reuse Spark's own XXH64 so outputs are BIT-IDENTICAL
  * to `xxhash64()`-based Column math (asserted by NativeHashSpec).
  *
  * Tokenization follows `split(trim(text), "\\s+")` exactly: UTF8String
  * trim (ASCII 32 only) + Java regex split with limit -1.
  */
object TextHash {

  val P31 = 2147483647L
  private val WS = Pattern.compile("\\s+")
  private val XxSeed = 42L // xxhash64()'s default seed

  private def tokens(text: UTF8String): Array[String] =
    WS.split(text.trim.toString, -1)

  /** 64-bit SimHash: per-token xxhash64, bitwise majority vote. */
  def simhash64(text: UTF8String): Long = {
    val ts = tokens(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < ts.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(ts(i)), XxSeed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
    sim
  }

  /** Distinct word-`width`-shingles of `text`, each hashed into [0, P31).
    * Equals array_distinct(transform(shingles(text), pmod(xxhash64(s), P31))). */
  def shingleHashes(text: UTF8String, width: Int): ArrayData = {
    val ts = tokens(text)
    val n = math.max(ts.length - width, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val end = math.min(i + width, ts.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) { if (j > i) sb.append(' '); sb.append(ts(j)); j += 1 }
      val h = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), XxSeed)
      seen.add(java.lang.Math.floorMod(h, P31))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Deterministic affine-permutation coefficients, interleaved (a0,b0,a1,…)
    * — the same seeded-LCG sequence as graft.operators.Dedup.perm. */
  private val coeffCache = new java.util.concurrent.ConcurrentHashMap[(Long, Int), Array[Long]]()
  def permCoeffs(seed: Long, k: Int): Array[Long] =
    coeffCache.computeIfAbsent((seed, k), { _ =>
      val out = new Array[Long](2 * k)
      var x = seed
      def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x & Long.MaxValue }
      var i = 0
      while (i < k) {
        out(2 * i) = next() % (P31 - 1) + 1
        out(2 * i + 1) = next() % P31
        i += 1
      }
      out
    })

  /** k-permutation MinHash signature over pre-hashed shingles: running min
    * of (a·h + b) mod P31 per permutation. h, a < 2^31 keeps the product
    * under 2^62 — no long overflow. */
  def minhashSig(shh: ArrayData, k: Int, seed: Long): ArrayData = {
    val cs = permCoeffs(seed, k)
    val sig = Array.fill(k)(Long.MaxValue)
    val n = shh.numElements()
    var i = 0
    while (i < n) {
      val h = shh.getLong(i)
      var j = 0
      while (j < k) {
        val v = java.lang.Math.floorMod(h * cs(2 * j) + cs(2 * j + 1), P31)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  // ---- Column wrappers (full whole-stage codegen via StaticInvoke) ------

  // inTypes stays Seq[DataType]: AbstractDataType is private[sql], and
  // Seq's covariance upcasts at the StaticInvoke call site
  private def invoke(name: String, dt: DataType, args: Seq[Column],
                     inTypes: Seq[DataType]): Column =
    GraftExpressionBridge.column(StaticInvoke(
      TextHash.getClass, dt, name,
      args.map(GraftExpressionBridge.expression),
      inTypes, propagateNull = true, returnNullable = false))

  def simhash64Col(text: Column): Column =
    invoke("simhash64", LongType, Seq(text), Seq(StringType))

  def shingleHashesCol(text: Column, width: Int): Column =
    invoke("shingleHashes", ArrayType(LongType, containsNull = false),
      Seq(text, lit(width)), Seq(StringType, IntegerType))

  def minhashSigCol(shh: Column, k: Int, seed: Long = 42L): Column =
    invoke("minhashSig", ArrayType(LongType, containsNull = false),
      Seq(shh, lit(k), lit(seed)),
      Seq(ArrayType(LongType), IntegerType, LongType))
}
