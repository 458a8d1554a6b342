package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.EncodingRepair

/** Mojibake repair kernel: the CP1252-in-UTF8 inversions, the strict-decode
  * safety latch, and the Column form inside a plan. */
class EncodingRepairSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fix(s: String): String =
    EncodingRepair.repair(UTF8String.fromString(s)).toString

  test("single-encoded mojibake is inverted byte-for-byte") {
    assert(fix("Caf\u00c3\u00a9") === "Caf\u00e9")   // A-tilde copyright -> e-acute
    assert(fix("d\u00c3\u00a4ta") === "d\u00e4ta")   // A-tilde currency -> a-umlaut
    // curly apostrophe U+2019: UTF-8 E2 80 99 mis-decodes to a-circ euro tm
    assert(fix("it\u00e2\u20ac\u2122s") === "it\u2019s")
    // em dash U+2014: E2 80 94 mis-decodes to a-circ euro right-dquote
    assert(fix("a\u00e2\u20ac\u201db") === "a\u2014b")
  }

  test("double-encoded mojibake needs two hops and gets them") {
    assert(fix("Caf\u00c3\u0192\u00c2\u00a9") === "Caf\u00e9")
    assert(fix("d\u00c3\u0192\u00c2\u00a4ta") === "d\u00e4ta")
  }

  test("the strict-decode latch: genuine text passes through untouched") {
    // real Latin-1-range prose: e-acute followed by ASCII is malformed UTF-8
    assert(fix("caf\u00e9 latte") === "caf\u00e9 latte")
    // CJK cannot be a CP1252 mis-decode at all
    assert(fix("\u4e2d\u6587 text") === "\u4e2d\u6587 text")
    // pure ASCII takes the fast path
    assert(fix("plain ascii") === "plain ascii")
    // an emoji (surrogate pair) aborts the hop
    assert(fix("ok \ud83d\ude00") === "ok \ud83d\ude00")
  }

  test("sloppy-CP1252 holes participate: a mis-decode through 0x9d inverts") {
    // U+00DD is C3 9D in UTF-8; byte 0x9D is a CP1252 hole, so the
    // mis-decoder passed it through as U+009D -- the sloppy table maps it
    // back and the repair still lands
    assert(fix("\u00c3\u009d") === "\u00dd")
  }

  test("repairCol: codegen'd column form repairs planted rows only") {
    val df = Seq(
      (1L, "Caf\u00c3\u00a9 row"),
      (2L, "clean ascii row"),
      (3L, "caf\u00e9 stays")
    ).toDF("id", "s")
    val got = df.select(col("id"),
        EncodingRepair.repairCol(col("s")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "Caf\u00e9 row")
    assert(got(2L) === "clean ascii row")
    assert(got(3L) === "caf\u00e9 stays")
  }
}
