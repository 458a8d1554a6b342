package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressibility of a text column — the compression-ratio
  * quality signal (RedPajama-v2 / DCLM signal family, public knowledge):
  * natural prose compresses to a mid-band ratio, while boilerplate /
  * template spam compresses far better and high-entropy garbage barely
  * compresses at all, so a corpus curation pass thresholds on the ratio
  * from both sides.
  *
  * One `StaticInvoke` static kernel (the TextHash discipline): a
  * per-thread `java.util.zip.Deflater` reset per row — Deflater
  * construction allocates native zlib state, far too heavy per row — and
  * a per-thread scratch buffer, counting output bytes without retaining
  * them. Level is FIXED (6, zlib default) and the JDK bundles its own
  * zlib, so the byte count is deterministic for a given corpus and JDK —
  * golden-pinnable at the gate corpus, while a second engine cannot
  * recompute it (DuckDB has no deflate): the gate aggregates are pinned
  * VALUES, with per-doc semantics spec-gated.
  *
  * Scale shape: map-only projection, zero shuffle, O(bytes) CPU per doc;
  * rides 1000 executors unchanged.
  */
object Zlib {

  /** Fixed DEFLATE level — part of the signal's definition; changing it
    * re-calibrates every threshold downstream. */
  val Level = 6

  // retention tradeoff (deliberate, the LangIdModel gram-memo class): one
  // native zlib state (~256 KB) + one 16 KB scratch per executor thread,
  // held for the thread's lifetime — bounded by thread count, and a
  // Deflater.end()-per-row would defeat the reuse that makes this a
  // kernel. Cleaner.register could reclaim on thread death if executor
  // native-memory pressure ever appears.
  private val deflLocal = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(Level, false)
  }
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 14)
  }

  /** DEFLATE output length of the text's UTF-8 bytes, in bytes. */
  def deflatedLen(text: UTF8String): Long = {
    val d = deflLocal.get()
    d.reset()
    d.setInput(text.getBytes)
    d.finish()
    val buf = bufLocal.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column form: `bigint` deflated byte length (whole-stage codegen). */
  def deflatedLenCol(text: Column): Column =
    GraftExpressionBridge.column(StaticInvoke(
      Zlib.getClass, LongType, "deflatedLen",
      Seq(GraftExpressionBridge.expression(text)),
      Seq(StringType), propagateNull = true, returnNullable = false))

  /** Convenience: (raw UTF-8 bytes, deflated bytes) as a struct column —
    * callers derive the ratio from the exact integer pair so both sides
    * of any later comparison divide identical values. */
  def statsCol(text: Column): Column = {
    import org.apache.spark.sql.functions._
    struct(octet_length(text).cast("long").as("raw_bytes"),
      deflatedLenCol(text).as("deflate_bytes"))
  }
}
