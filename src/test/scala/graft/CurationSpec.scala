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
}
