package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical composition as a native expression — the missing
  * piece of text normalization for cross-source dedup: "é" as
  * `e + COMBINING ACUTE (U+0301)` and "é" as precomposed U+00E9 are
  * different byte sequences (different hashes, different shingles) until
  * canonically composed.
  *
  * Same `StaticInvoke` shape as [[TextHash]]: compiles to a direct static
  * call inside whole-stage codegen. Fast path: `Normalizer.isNormalized`
  * is allocation-light and true for virtually all real text (all-ASCII in
  * particular), so the common case returns the input buffer untouched and
  * only genuinely decomposed rows pay the compose pass.
  */
object UnicodeNorm {

  /** JDK NFC (java.text.Normalizer); DuckDB's `nfc_normalize` agrees —
    * asserted cross-engine by the `nfc_normalize` gate query. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  // ---- Column wrapper (full whole-stage codegen via StaticInvoke) -------

  def nfcCol(text: Column): Column =
    GraftExpressionBridge.column(StaticInvoke(
      UnicodeNorm.getClass, StringType, "nfc",
      Seq(GraftExpressionBridge.expression(text)),
      Seq(StringType), propagateNull = true, returnNullable = false))
}
