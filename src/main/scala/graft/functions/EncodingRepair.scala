package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, StandardCharsets}

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair (the ftfy-class fix for the standard web-crawl defect):
  * text whose UTF-8 bytes were once decoded as CP1252 and re-encoded as
  * UTF-8 — "é" arriving as "Ã©", "ä" as "Ã¤", doubly-encoded "ÃƒÂ©" after
  * two bad hops. The repair inverts the damage: map each char back to the
  * CP1252 byte it mis-decoded from, then STRICTLY re-decode those bytes as
  * UTF-8. Strict decoding is the safety latch — genuine Latin-1 prose
  * ("café": 0xE9 followed by ASCII) is malformed as UTF-8, so the decode
  * aborts and the input passes through untouched; only byte streams that
  * really are valid UTF-8 in disguise get rewritten. Iterated to a small
  * fixpoint (each successful hop strictly shrinks the string, double
  * encoding needs two), capped at 3.
  *
  * Same `StaticInvoke` shape as [[UnicodeNorm]]: a direct static call
  * inside whole-stage codegen, with an allocation-free ASCII fast path —
  * clean rows (the overwhelming majority of a real crawl) pay one byte
  * scan and return the input buffer.
  *
  * The char→byte table is CP1252's decode table reversed, with the five
  * undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) taken as their C1 controls
  * — the "sloppy cp1252" every practical repair tool uses, because real
  * mis-decoders pass those bytes through as-is. Chars outside the table
  * (CJK, emoji, anything > U+00FF that CP1252 cannot produce) mean the
  * text is NOT a CP1252 mis-decode, so repair aborts. */
object EncodingRepair {

  val MaxHops = 3

  /** CP1252 bytes 0x80-0x9F decode to these chars (U+0081 etc. for the
    * five holes — the sloppy form). Everything else maps identically. */
  private val C1Chars: Array[Char] = Array(
    '\u20ac', '\u0081', '\u201a', '\u0192', // 80 81 82 83
    '\u201e', '\u2026', '\u2020', '\u2021', // 84 85 86 87
    '\u02c6', '\u2030', '\u0160', '\u2039', // 88 89 8a 8b
    '\u0152', '\u008d', '\u017d', '\u008f', // 8c 8d 8e 8f
    '\u0090', '\u2018', '\u2019', '\u201c', // 90 91 92 93
    '\u201d', '\u2022', '\u2013', '\u2014', // 94 95 96 97
    '\u02dc', '\u2122', '\u0161', '\u203a', // 98 99 9a 9b
    '\u0153', '\u009d', '\u017e', '\u0178') // 9c 9d 9e 9f

  /** char → CP1252 byte, or -1 if the char is not CP1252-encodable. */
  private val reverse: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](64)
    var b = 0x80
    while (b <= 0x9f) { m.put(C1Chars(b - 0x80), b.toByte); b += 1 }
    m
  }

  private def cp1252Byte(c: Char): Int =
    if (c < 0x80) c
    else if (c >= 0xa0 && c <= 0xff) c
    else {
      val hit = reverse.get(c)
      if (hit == null) -1 else hit.toInt & 0xff
    }

  /** One repair hop: null when the string is not a CP1252 mis-decode of
    * valid UTF-8 (unmappable char, or strict decode fails). */
  private def hop(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = cp1252Byte(s.charAt(i))
      if (b < 0) return null
      bytes(i) = b.toByte
      i += 1
    }
    try StandardCharsets.UTF_8.newDecoder()
      .decode(ByteBuffer.wrap(bytes)).toString
    catch { case _: CharacterCodingException => null }
  }

  def repair(text: UTF8String): UTF8String = {
    // fast path: pure-ASCII payload cannot be mojibake (every multi-byte
    // UTF-8 sequence mis-decoded through CP1252 leaves a >=0x80 char)
    val n = text.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { ascii = (text.getByte(i) & 0x80) == 0; i += 1 }
    if (ascii) return text
    var s = text.toString
    var hops = 0
    var changed = false
    while (hops < MaxHops) {
      val next = hop(s)
      if (next == null || next == s) hops = MaxHops
      else { s = next; changed = true; hops += 1 }
    }
    if (changed) UTF8String.fromString(s) else text
  }

  // ---- Column wrapper (full whole-stage codegen via StaticInvoke) -------

  def repairCol(text: Column): Column =
    GraftExpressionBridge.column(StaticInvoke(
      EncodingRepair.getClass, StringType, "repair",
      Seq(GraftExpressionBridge.expression(text)),
      Seq(StringType), propagateNull = true, returnNullable = false))
}
