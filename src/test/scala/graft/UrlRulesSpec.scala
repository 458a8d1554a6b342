package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPipeline, Curation, UrlRules}

/** URL/domain rule gate (r19): parse-level verdicts, the synthetic-url
  * arithmetic, the production blocklist-table form, and the stage's
  * composition into the curation funnel/provenance chain. */
class UrlRulesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("urlFilter: each rule fires on its own URL shape and only there") {
    val urls = Seq(
      (1L, "https://good.example.com/s1/s2/f3.html"),             // clean
      (2L, "https://src7.example.net/s1/s2/f3.html"),             // blocked host
      (3L, "https://good.example.com/s1/s2/f3.jpg"),              // asset ext
      (4L, "https://good.example.com/a/b/c/d/e/f/g.html"),        // too deep
      (5L, "https://good.example.com/s1/f2.html?sid=42"),         // junk query
      (6L, "https://good.example.com/s1/f2.html?q=term&page=2"),  // benign query
      (7L, "https://good.example.com/s1/f2.HTML")                 // case-folded ext
    ).toDF("doc_id", "url")
    val v = UrlRules.urlFilter(urls, "doc_id")
      .select("doc_id", "blocked_domain", "bad_ext", "too_deep",
        "junk_query", "pass_url")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(v(1L) === ((1L, false, false, false, false, true)))
    assert(v(2L) === ((2L, true, false, false, false, false)))
    assert(v(3L) === ((3L, false, true, false, false, false)))
    assert(v(4L) === ((4L, false, false, true, false, false)))
    assert(v(5L) === ((5L, false, false, false, true, false)))
    assert(v(6L) === ((6L, false, false, false, false, true)))
    assert(v(7L) === ((7L, false, false, false, false, true)))
  }

  test("withSyntheticUrl: the residue arms produce exactly their rule failures") {
    // ids chosen per residue: 10 (clean in every class), 3 (%97=3 →
    // .jpg), 94 (%89=5 → 6 segments), 90 (%83=7 → ?sid=), 107 (%7=2 ∧
    // src7 → blocked host)
    val docs = Seq(
      (10L, "src0"), (3L, "src3"), (94L, "src14"), (90L, "src10"),
      (107L, "src7")
    ).toDF("doc_id", "source")
    val v = UrlRules.urlFilter(UrlRules.withSyntheticUrl(docs), "doc_id")
      .select("doc_id", "url", "blocked_domain", "bad_ext", "too_deep",
        "junk_query")
      .as[(Long, String, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(v(10L) === ((10L, "https://src0.example.com/s0/s1/f10.html",
      false, false, false, false)))
    assert(v(3L)._4 && v(3L)._2.endsWith(".jpg"))
    assert(v(94L)._5 && v(94L)._2.contains("/s4/s5/s6/s7/s8/s9"))
    assert(v(90L)._6 && v(90L)._2.endsWith("?sid=90"))
    assert(v(107L)._3 && v(107L)._2.startsWith("https://src7.example.net/"))
  }

  test("curation plant ids all sit outside every failing residue class") {
    // the chain CTE's s0u comment pins this: the url gate must not
    // perturb the downstream stage plants
    val plantIds = Seq(9300001L) ++ (9300011L to 9300015L) ++
      (9300100L to 9300111L) ++ (9300200L to 9300205L) ++
      Seq(9300299L, 9300301L, 9300302L)
    plantIds.foreach { id =>
      assert(id % 97 != 3 && id % 89 != 5 && id % 83 != 7,
        s"plant $id falls in a failing residue class")
      // plant sources (plantlm/plantdup/...) never form a blocked host
    }
  }

  test("filterAgainstBlocklist: broadcast anti-join equals the literal blocklist") {
    val docs = UrlRules.withSyntheticUrl(
      spark.range(0, 300).select(col("id").as("doc_id"),
        concat(lit("src"), (col("id") % 20).cast("string")).as("source")))
    val lit5 = UrlRules.urlFilter(docs, "doc_id")
      .filter(col("pass_url")).select("doc_id")
    val blk = Seq("src7.example.net", "src12.example.net").toDF("host")
    val viaTable = UrlRules.filterAgainstBlocklist(docs, "doc_id", blk)
      .select("doc_id")
    assert(lit5.exceptAll(viaTable).count() === 0)
    assert(viaTable.exceptAll(lit5).count() === 0)
    // and the plan side: the blocklist join must be broadcast, not shuffled
    val plan = viaTable.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti-join, got:\n$plan")
  }

  test("funnel/provenance with url_rules: the gate drops its residue doc first and reconciles") {
    // doc 94 fails ONLY the depth rule; the rest are gopher-passing
    // copies so later stages stay non-vacuous
    val t1 = ("the cat sat of mat and dogs that have ran with joy here " * 5).trim
    val docs = UrlRules.withSyntheticUrl(
      Seq((1L, t1, "bulk"), (2L, t1 + " extra tail word", "bulk"),
        (94L, t1 + " other tail entirely", "bulk"))
        .toDF("doc_id", "text", "source"))
    val census = Curation.funnel(docs, "doc_id", "text", "source",
      nllKeep = 6.0, cap = 10, urlRules = Some(UrlRules.Cfg()))
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(census.head === ((0, "raw", 3L, 0L)))
    assert(census(1) === ((1, "url_rules", 2L, 1L))) // doc 94, depth rule
    val prov = Curation.provenance(docs, "doc_id", "text", "source",
      nllKeep = 6.0, cap = 10, urlRules = Some(UrlRules.Cfg()))
    val r94 = prov.filter(col("doc_id") === 94).collect().head
    assert(r94.getAs[String]("pass_url") === "fail")
    assert(r94.getAs[String]("pass_gopher") === "not_reached")
    assert(r94.getAs[String]("drop_stage") === "url_rules")
    assert(!r94.getAs[Boolean]("keep"))
    // reconciliation at the new stage
    val dropped = prov.filter(col("drop_stage") === "url_rules").count()
    assert(dropped === census(1)._4)
    graft.operators.Dedup.unpersistIntermediates()
  }
}
