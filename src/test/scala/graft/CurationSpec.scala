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
}
