package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Toxicity}

/** The blocklist-lexicon gate (r20, the C4 bad-words pass as a density
  * verdict): operator semantics — punctuation-stripping token match,
  * integer cross-multiplied threshold, ledger shape — and its staged
  * composition as the curation funnel's toxicity stage. */
class ToxicitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("blocklistScore: density verdicts, punctuation match, boundary, empty doc") {
    val docs = Seq(
      (1L, "clean words only nothing blocked at all"),        // 0 blocked
      (2L, "Zap, zap! and ZAP? but mostly other words here"), // 3/9 = 333‰
      (3L, "one zap inside twenty tokens a b c d e f g h i j k l m n o"), // 1/21
      (4L, ""),                                               // empty: passes
      (5L, null.asInstanceOf[String]),                        // null: passes
      (6L, "zap zap zap zap zap zap zap zap zap clean")       // 9/10 = 900‰
    ).toDF("doc_id", "text")
    val cfg = Toxicity.Cfg(blocked = Seq("zap"), maxPerMille = 100)
    val got = Toxicity.blocklistScore(docs, "doc_id", "text", cfg)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 7L, 0L, 0L, true)))
    // punctuation-stripping tokenization: "Zap," "zap!" "ZAP?" all match
    assert(got(2L) === ((2L, 9L, 3L, 333L, false)))
    assert(got(3L) === ((3L, 20L, 1L, 50L, true)))
    assert(got(4L) === ((4L, 0L, 0L, 0L, true)))
    assert(got(5L) === ((5L, 0L, 0L, 0L, true)))
    assert(got(6L) === ((6L, 10L, 9L, 900L, false)))
    // boundary: EXACTLY at the ceiling passes (<=, the integer
    // cross-multiplication — 1 blocked in 10 tokens at 100‰)
    val b = Toxicity.blocklistScore(
      Seq((7L, "zap a b c d e f g h i")).toDF("doc_id", "text"),
      "doc_id", "text", cfg).as[(Long, Long, Long, Long, Boolean)].head()
    assert(b === ((7L, 10L, 1L, 100L, true)))
    // zero tolerance: maxPerMille = 0 is the original C4 rule
    val z = Toxicity.blocklistScore(docs, "doc_id", "text",
        Toxicity.Cfg(Seq("zap"), maxPerMille = 0))
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .filter(_._5).map(_._1).toSet
    assert(z === Set(1L, 4L, 5L))
  }

  test("funnel + provenance: the toxicity stage drops exactly its casualty and reconciles") {
    // gopher-passing docs (>= 50 words, stopwords present); doc 3 carries
    // 10 blocked tokens in 80 (125‰ > 100‰ — the stage's casualty), doc 4
    // carries 1 in 71 (14‰ — the nonzero-pass arm)
    val base = "the cat sat of mat and dogs that have ran with joy here"
    def padded(tag: String): String =
      (0 until 5).map(j => s"$base $tag$j").mkString(" ")
    val docs = Seq(
      (1L, padded("aa"), "bulk"),
      (2L, padded("bb"), "bulk"),
      (3L, padded("cc") + " zap zip zap zip zap zip zap zip zap zip", "bulk"),
      (4L, padded("dd") + " zap", "bulk"),
      (5L, "the of short", "bulk")) // gopher casualty: the earlier arm intact
      .toDF("doc_id", "text", "source")
    val cfg = Toxicity.Cfg(blocked = Seq("zap", "zip"), maxPerMille = 100)
    val census = Curation.funnel(docs, "doc_id", "text", "source",
        nllKeep = 6.0, cap = 10, toxicity = Some(cfg))
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(census.toSeq === Seq(
      (0, "raw", 5L, 0L),
      (1, "gopher_rules", 4L, 1L), // doc 5 out
      (2, "toxicity", 3L, 1L),     // doc 3 out — and ONLY doc 3
      (3, "lm_keep", 3L, 0L),
      (4, "exact_dedup", 3L, 0L),
      (5, "domain_cap", 3L, 0L)))
    val rows = Curation.provenance(docs, "doc_id", "text", "source",
        nllKeep = 6.0, cap = 10, toxicity = Some(cfg))
      .as[(Long, String, String, String, String, String, String, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // (doc_id, pass_gopher, pass_toxicity, pass_lm, is_canonical,
    //  within_cap, drop_stage, keep)
    assert(rows(3L) === ((3L, "pass", "fail", "not_reached", "not_reached",
      "not_reached", "toxicity", false)))
    assert(rows(4L)._3 === "pass") // nonzero blocked count, under the ceiling
    assert(rows(4L)._8 === true)
    assert(rows(5L) === ((5L, "fail", "not_reached", "not_reached",
      "not_reached", "not_reached", "gopher_rules", false)))
    // reconciliation: count(drop_stage = toxicity) == census n_dropped
    assert(rows.values.count(_._7 == "toxicity") === 1)
    graft.operators.Dedup.unpersistIntermediates()
  }
}
