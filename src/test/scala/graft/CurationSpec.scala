package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("funnel: each stage drops exactly its planted casualty") {
    val t1 = ("the cat sat of mat and dogs that have ran with joy here " * 5).trim
    val t2 = t1.replace("cat", "dog") // one-word variant: near-identical LM profile
    val salad = "the of " + (1 to 48).map(i => f"qx$i%02d").mkString(" ")
    val docs = ((1 to 6).map(i => (i.toLong, t1, "bulk")) ++ Seq(
      (7L, t2, "bulk"),      // survives everything but the cap
      (8L, "the of short", "bulk"), // gopher: word_count < 50
      (9L, salad, "bulk")))  // LM outlier: every bigram unique
      .toDF("doc_id", "text", "source")
    val got = Curation.funnel(docs, "doc_id", "text", "source",
      nllKeep = 2.5, cap = 1)
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0, "raw", 9L, 0L),
      (1, "gopher_rules", 8L, 1L),   // doc 8 out
      (2, "lm_keep", 7L, 1L),        // doc 9 out
      (3, "exact_dedup", 2L, 5L),    // docs 2-6 are copies of doc 1
      (4, "domain_cap", 1L, 1L)))    // one "bulk" slot
  }

  test("provenance: per-doc verdicts, staged not_reached, funnel reconciliation") {
    val t1 = ("the cat sat of mat and dogs that have ran with joy here " * 5).trim
    val t2 = t1.replace("cat", "dog")
    val salad = "the of " + (1 to 48).map(i => f"qx$i%02d").mkString(" ")
    val docs = ((1 to 6).map(i => (i.toLong, t1, "bulk")) ++ Seq(
      (7L, t2, "bulk"),
      (8L, "the of short", "bulk"),
      (9L, salad, "bulk")))
      .toDF("doc_id", "text", "source")
    val rows = Curation.provenance(docs, "doc_id", "text", "source",
        nllKeep = 2.5, cap = 1)
      .as[(Long, String, String, String, String, String, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // the gopher casualty: later gates were never evaluated
    assert(rows(8L)._2 === "fail")
    assert(rows(8L)._3 === "not_reached" && rows(8L)._5 === "not_reached")
    assert(rows(8L)._6 === "gopher_rules" && !rows(8L)._7)
    // the LM outlier: gopher pass, lm fail, rest not_reached
    assert(rows(9L) === ((9L, "pass", "fail", "not_reached", "not_reached",
      "lm_keep", false)))
    // doc 1 is the canonical copy and wins the single cap slot... or
    // doc 7: the cap rank is md5-ordered over {1, 7} — exactly ONE of
    // them is kept, the other is a domain_cap casualty
    val kept = Seq(1L, 7L).filter(rows(_)._7)
    assert(kept.size === 1)
    val capped = (Seq(1L, 7L).toSet - kept.head).head
    assert(rows(capped) === ((capped, "pass", "pass", "pass", "fail",
      "domain_cap", false)))
    // the dup copies 2-6: reached dedup, lost canonicity, cap not_reached
    (2L to 6L).foreach { i =>
      assert(rows(i) === ((i, "pass", "pass", "fail", "not_reached",
        "exact_dedup", false)))
    }
    // reconciliation: count(drop_stage = s) == the funnel's n_dropped
    val funnel = Curation.funnel(docs, "doc_id", "text", "source",
        nllKeep = 2.5, cap = 1)
      .as[(Int, String, Long, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    val byStage = rows.values.groupBy(_._6).view.mapValues(_.size.toLong).toMap
    Seq("gopher_rules", "lm_keep", "exact_dedup", "domain_cap").foreach { s =>
      assert(byStage.getOrElse(s, 0L) === funnel(s), s"stage $s")
    }
    assert(byStage("kept") === 1L)
    graft.operators.Dedup.unpersistIntermediates()
  }

  // ---- full production chain (r18: line_cut / near_dup / span_scrub) ----

  // one planted casualty per stage, every later arm insulated from every
  // earlier one (fox pads break near-dup shingle overlap; letter pads
  // survive lineNorm; the dup text is self-repeating so its canonical is
  // the scrub casualty — the same design as the entry-gate plants)
  private val foxSent = "the cat sat of mat and dogs that have ran with joy here"
  private def foxPadded(tag: String): String =
    (0 until 5).map(j => s"$foxSent $tag$j").mkString(" ")
  private val banner = "subscribe for unlimited premium access and member content today"
  private def fullChainDocs = {
    val t1 = (foxSent + " ") * 5
    ((1 to 3).map(i => (i.toLong, t1.trim, "bulk")) ++ Seq(
      (7L, t1.trim.replace("joy", "glee"), "bulk"), // near-dup of doc 1 (same first-2-token block, J = 10/16)
      (8L, "the of short", "bulk"),                 // gopher: word_count < 50
      (9L, "the of " + (1 to 48).map(i => f"qx$i%02d").mkString(" "), "bulk"), // LM outlier
      (10L, foxPadded("pa"), "capd"),               // cap pair: same source,
      (11L, foxPadded("pb"), "capd"),               //   one loses the single slot
      (12L, foxPadded("lc") + "\n" + banner, "l1"), // banner carriers: the cut
      (13L, foxPadded("ld") + "\n" + banner, "l2"), //   strips line 2, they
      (14L, foxPadded("le") + "\n" + banner, "l3"), //   flow on intact
      (15L, banner, "l0")))                         // pure banner: line_cut drop
      .toDF("doc_id", "text", "source")
  }
  private val fullChainArgs = (
    Some(graft.operators.CorpusPipeline.LineCut(minCount = 4L)), // 3 carriers + 1 pure = 4
    Some(graft.operators.CorpusPipeline.NearDup(
      t => org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.slice(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.trim(t), "\\s+"), 1, 2)),
      n = 3, threshold = 0.6)),
    Some(graft.operators.CorpusPipeline.SpanScrub(window = 8, minDf = 2)))

  test("funnel full chain: every production stage drops exactly its planted casualty") {
    val (lc, nd, sc) = fullChainArgs
    val got = Curation.funnel(fullChainDocs, "doc_id", "text", "source",
      nllKeep = 2.5, cap = 1, lineCut = lc, nearDup = nd, scrub = sc)
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0, "raw", 12L, 0L),
      (1, "line_cut", 11L, 1L),     // doc 15 (pure banner) emptied
      (2, "gopher_rules", 10L, 1L), // doc 8 out
      (3, "lm_keep", 9L, 1L),       // doc 9 out
      (4, "exact_dedup", 7L, 2L),   // docs 2-3 are copies of doc 1
      (5, "near_dup", 6L, 1L),      // doc 7 (higher id of the 0.625 pair)
      (6, "span_scrub", 5L, 1L),    // doc 1: fully self-repeating text
      (7, "domain_cap", 4L, 1L)))   // one "capd" slot
    graft.operators.Dedup.unpersistIntermediates()
  }

  test("provenance full chain: staged verdicts + exact funnel reconciliation") {
    val (lc, nd, sc) = fullChainArgs
    val docs = fullChainDocs
    val rows = Curation.provenance(docs, "doc_id", "text", "source",
        nllKeep = 2.5, cap = 1, lineCut = lc, nearDup = nd, scrub = sc)
      .as[(Long, String, String, String, String, String, String, String,
           String, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows.size === 12)
    // pure banner: cut to empty, nothing later was evaluated
    assert(rows(15L) === ((15L, "fail", "not_reached", "not_reached",
      "not_reached", "not_reached", "not_reached", "not_reached",
      "line_cut", false)))
    // the near-dup loser: canonical, then dropped beside doc 1
    assert(rows(7L) === ((7L, "pass", "pass", "pass", "pass", "fail",
      "not_reached", "not_reached", "near_dup", false)))
    // the scrub casualty: survived near-dup, scrubbed to zero tokens
    assert(rows(1L) === ((1L, "pass", "pass", "pass", "pass", "pass",
      "fail", "not_reached", "span_scrub", false)))
    // banner carriers: the cut stripped their banner, they keep
    Seq(12L, 13L, 14L).foreach(i => assert(rows(i)._10, s"doc $i kept"))
    // exactly one of the cap pair survives the single slot
    assert(Seq(10L, 11L).count(rows(_)._10) === 1)
    // reconciliation: count(drop_stage = s) == the funnel's n_dropped
    val funnel = Curation.funnel(docs, "doc_id", "text", "source",
        nllKeep = 2.5, cap = 1, lineCut = lc, nearDup = nd, scrub = sc)
      .as[(Int, String, Long, Long)].collect()
      .map(r => r._2 -> r._4).toMap
    val byStage = rows.values.groupBy(_._9).view.mapValues(_.size.toLong).toMap
    Seq("line_cut", "gopher_rules", "lm_keep", "exact_dedup", "near_dup",
        "span_scrub", "domain_cap").foreach { s =>
      assert(byStage.getOrElse(s, 0L) === funnel(s), s"stage $s")
    }
    assert(byStage("kept") === 4L)
    graft.operators.Dedup.unpersistIntermediates()
  }
}
