package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, IncrementalScrub, Snapshot}

/** Incremental boilerplate scrub: the frequency-delta refresh must equal
  * the batch spanScrub over the new corpus version, INCLUDING the
  * cross-document ripples only a corpus-frequency stage has — a window
  * crossing the df threshold in either direction changes the scrub
  * output of docs nobody touched. */
class IncrementalScrubSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val W = 4
  private val tailA = " ta1 ta2 ta3 ta4 ta5 ta6 ta7 ta8"
  private val tailB = " tb1 tb2 tb3 tb4 tb5 tb6 tb7 tb8"
  private val tailC = " tc1 tc2 tc3 tc4 tc5 tc6 tc7 tc8"
  private def body(i: Long): String =
    (0 until 16).map(j => s"u${i}w$j").mkString(" ")

  // tails appended to unique bodies: the windows fully inside a tail are
  // identical across holders (df = holder count), boundary windows differ
  private val prevDocs = (0L until 50L).map { i =>
    val t = if (i >= 20 && i <= 29) tailA
            else if (i == 30 || i == 31) tailB
            else if (i == 40) tailC
            else ""
    (i, body(i) + t)
  }.toDF("doc_id", "text")

  // curr: remove 31 (tailB df 2→1 ⇒ UNTOUCHED doc 30 restored); add 100
  // with tailC (df 1→2 ⇒ UNTOUCHED doc 40 cut); change 25 to drop its
  // tailA (df 10→9, still ≥2 ⇒ only 25 reworked); add plain 101
  private val currDocs = (
    (0L until 50L).filterNot(_ == 31L).map { i =>
      val t = if (i >= 20 && i <= 29 && i != 25) tailA
              else if (i == 30) tailB
              else if (i == 40) tailC
              else ""
      (i, body(i) + t)
    } ++ Seq((100L, body(100) + tailC), (101L, body(101)))
  ).toDF("doc_id", "text")

  private def rows(df: DataFrame): Set[(Long, String, Long, Long)] =
    df.select(col("id"), col("scrubbed_text"), col("n_tokens"), col("n_removed"))
      .as[(Long, String, Long, Long)].collect().toSet

  test("refresh equals batch spanScrub over version 2, both ripple directions included") {
    try {
      val st = IncrementalScrub.state(prevDocs, "doc_id", "text", W, 2)
      val next = IncrementalScrub.refresh(st, currDocs,
        Snapshot.diff(prevDocs, currDocs, "doc_id", "text"),
        "doc_id", "text", W, 2)
      val got = rows(next.scrubbed)
      val want = rows(Dedup.spanScrub(currDocs, "doc_id", "text", W, 2)
        .withColumnRenamed("doc_id", "id"))
      assert(got === want)
      val prevBy = rows(st.scrubbed).map(r => r._1 -> r).toMap
      val gotBy = got.map(r => r._1 -> r).toMap
      // ripple down: doc 30 was scrubbed, is now restored — untouched
      assert(prevBy(30L)._4 === 8L && gotBy(30L)._4 === 0L)
      // ripple up: doc 40 was clean, is now cut — untouched
      assert(prevBy(40L)._4 === 0L && gotBy(40L)._4 === 8L)
      // non-crossing rework: 25 lost its tail, the other tailA holders
      // keep being scrubbed with unchanged rows
      assert(gotBy(25L)._4 === 0L && gotBy(26L) === prevBy(26L))
      // the fresh tailC holder is cut on arrival
      assert(gotBy(100L)._4 === 8L && gotBy(101L)._4 === 0L)
      // verbatim passthrough for every unaffected doc
      val untouchedIds = got.map(_._1) -- Set(25L, 30L, 31L, 40L, 100L, 101L)
      untouchedIds.foreach(i => assert(gotBy(i) === prevBy(i), s"doc $i"))
    } finally Dedup.unpersistIntermediates()
  }

  test("refreshed state equals a fresh bootstrap over version 2") {
    try {
      val st = IncrementalScrub.state(prevDocs, "doc_id", "text", W, 2)
      val next = IncrementalScrub.refresh(st, currDocs,
        Snapshot.diff(prevDocs, currDocs, "doc_id", "text"),
        "doc_id", "text", W, 2)
      val fresh = IncrementalScrub.state(currDocs, "doc_id", "text", W, 2)
      assert(next.wins.as[(Long, Int, Long)].collect().sorted.toSeq ===
        fresh.wins.as[(Long, Int, Long)].collect().sorted.toSeq)
      assert(next.df.as[(Long, Long)].collect().toSet ===
        fresh.df.as[(Long, Long)].collect().toSet)
    } finally Dedup.unpersistIntermediates()
  }

  test("empty delta: scrub lake and state pass through unchanged") {
    try {
      val st = IncrementalScrub.state(prevDocs, "doc_id", "text", W, 2)
      val next = IncrementalScrub.refresh(st, prevDocs,
        Snapshot.diff(prevDocs, prevDocs, "doc_id", "text"),
        "doc_id", "text", W, 2)
      assert(rows(next.scrubbed) === rows(st.scrubbed))
      assert(next.df.as[(Long, Long)].collect().toSet ===
        st.df.as[(Long, Long)].collect().toSet)
    } finally Dedup.unpersistIntermediates()
  }
}
