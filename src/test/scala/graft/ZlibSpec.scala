package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Zlib

class ZlibSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def lens(texts: String*): Seq[Long] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .orderBy("id")
      .select(Zlib.deflatedLenCol(col("t")))
      .as[Long].collect().toSeq

  test("compressibility orders: repetition << prose << high-entropy hex") {
    val rep = Seq.fill(80)("spam").mkString(" ")
    val prose = ("the quick brown fox jumps over a lazy dog while a " +
      "slow red crab walks under the warm green bridge near town ") * 3
    val hex = (0 until 30).map(i =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"z$i")).mkString(" ")
    // compare RATIOS (deflate/raw) so differing raw lengths can't fake
    // the ordering the quality filter relies on
    val Seq(lr, lp, lh) = lens(rep, prose, hex)
    val Seq(rr, rp, rh) = Seq(
      lr.toDouble / rep.getBytes("UTF-8").length,
      lp.toDouble / prose.getBytes("UTF-8").length,
      lh.toDouble / hex.getBytes("UTF-8").length)
    assert(rr < rp / 4, s"repetition must crush: $rr vs prose $rp")
    assert(rp < rh, s"prose must beat hex garbage: $rp vs $rh")
  }

  test("kernel equals a direct Deflater run; stable across rows and empty-safe") {
    val texts = Seq("", "a", "hello world hello world", "äöü 模型 🙂")
    val got = lens(texts: _*)
    val expected = texts.map { t =>
      val d = new java.util.zip.Deflater(Zlib.Level, false)
      d.setInput(t.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      n
    }
    assert(got === expected)
  }

  test("deflatedLenCol plans as a shuffle-free codegen'd map (StaticInvoke)") {
    val plan = spark.range(8)
      .select(Zlib.deflatedLenCol(concat(lit("text "), col("id"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("*("), s"codegen lost (no *(n) stage):\n$plan")
  }
}
