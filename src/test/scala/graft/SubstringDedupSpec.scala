package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Anchored exact-substring dedup (r20, D44 — the Lee et al. 2022 tier):
  * cross-boundary recall, exact sub-minLen precision, alignment freedom,
  * the hot-bucket guard, and the cross-doc-only contract. */
class SubstringDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(tag: String, n: Int) =
    (0 until n).map(j => s"$tag$j").mkString(" ")

  test("planted cross-alignment pair is caught; a 49-token overlap never pairs") {
    val seed = run("ss", 120)   // the shared 120-token passage
    val seedC = run("sc", 49)   // one token short of minLen
    val docs = Seq(
      // the SAME passage at different offsets — 30- vs 17-token prefixes,
      // the alignment a fixed window grid straddles
      (1L, run("pa", 30) + " " + seed + " " + run("qa", 10)),
      (2L, run("pb", 17) + " " + seed + " " + run("qb", 25)),
      // 49 shared tokens: no identical 50-token window can exist, so
      // precision is EXACT — this pair must never appear
      (3L, run("pc", 20) + " " + seedC + " " + run("qc", 31)),
      (4L, run("pd", 11) + " " + seedC + " " + run("qd", 40)),
      // unrelated doc: must pair with nothing
      (5L, run("zz", 90))
    ).toDF("doc_id", "text")
    val pairs = Dedup.anchoredSubstringPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    // anchors are a pure function of content: the ss-seed passage admits
    // exactly 4 anchored offsets whose 50-token window fits inside it
    // (the md5 last-hex-digit 1/8 sample over offsets 1..71), and both
    // copies anchor at the same relative offsets whatever their absolute
    // position — so the pair count is a content-determined constant
    assert(pairs.toSeq === Seq((1L, 2L, 4L)))
  }

  test("a repeat WITHIN one doc never self-pairs; cap guard bounds a boilerplate span") {
    val seed = run("ss", 120)
    // one doc carrying the passage twice: the id_a < id_b filter makes
    // within-doc repetition span_scrub's business, not this tier's
    val solo = Seq((1L, seed + " mid gap filler tokens " + seed))
      .toDF("doc_id", "text")
    assert(Dedup.anchoredSubstringPairs(solo, "doc_id", "text").count() === 0)
    // 30 docs all carrying the same passage: with the default cap the
    // B^2/2 pairs emit; capped at 10 the hot span keys drop and the
    // pair list empties (the minhash hot-bucket trade, documented)
    val herd = (1 to 30).map(i =>
      (i.toLong, s"u$i " + seed + s" v$i")).toDF("doc_id", "text")
    assert(Dedup.anchoredSubstringPairs(herd, "doc_id", "text")
      .count() === 30L * 29 / 2)
    assert(Dedup.anchoredSubstringPairs(herd, "doc_id", "text",
      maxBucket = 10).count() === 0)
  }

  test("short docs and degenerate inputs are safe") {
    val docs = Seq(
      (1L, run("aa", 49)),                 // below minLen: no windows
      (2L, ""),                            // empty
      (3L, null.asInstanceOf[String]),     // null
      (4L, run("aa", 49))                  // identical 49-token doc: still no pair
    ).toDF("doc_id", "text")
    assert(Dedup.anchoredSubstringPairs(docs, "doc_id", "text").count() === 0)
    intercept[IllegalArgumentException] {
      Dedup.anchoredSubstringPairs(docs, "doc_id", "text", minLen = 3,
        shingleK = 5)
    }
  }
}
