package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Incremental, Snapshot}

/** Generative gate for the incremental tier: for RANDOM two-version
  * corpora, the delta refresh must equal the batch rebuild. The planted
  * spec cases cover the ripples we know about (promotion, demotion,
  * filter exits, added dups); random (corpus, delta) pairs hunt the ones
  * we don't. Texts draw from a SMALL body pool so content collisions —
  * the interesting dedup structure — are frequent, and one pool entry
  * fails the keep rules so filter transitions occur; ops (keep / remove
  * / edit / add) are drawn per id. */
object IncrementalProps extends Properties("Incremental") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private def body(seed: Int): String =
    (1 to 30).map(i => s"pool$seed word$i token").mkString(" ").take(300) +
      " tail marker closing words here"

  // bodies 0-5 pass the keep rules; index 6 is a rule-failing short text
  private val bodies: Vector[String] =
    (0 to 5).map(body).toVector :+ "short 123"
  private val bodyIx: Gen[Int] = Gen.chooseNum(0, bodies.size - 1)

  private val keep: Column => Column = t =>
    graft.operators.TextOps.corpusFilterRules(t)
      .collect { case (n, r) if n != "no_terminal_punct" => r }
      .reduce(_ && _)
  private val docShard: Column => Column = k =>
    conv(substring(md5(k.cast("string")), 1, 4), 16, 10).cast("long") % 8

  private def pack(docs: DataFrame): DataFrame =
    Incremental.batch(docs, "doc_id", "text", keep,
      maxTokens = 8, overlap = 2, budget = 24L, shards = 8, docShard)

  private def rows(df: DataFrame): Set[(Long, Int, Long, Int, Long)] = {
    import spark.implicits._
    df.select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("shard").cast("int"), col("seq_id"))
      .as[(Long, Int, Long, Int, Long)].collect().toSet
  }

  // per-id op: 0-5 keep-as-is bias, 6 = remove, 7-8 = edit to a fresh draw
  private case class Ver(v1: Seq[(Long, Int)], v2: Seq[(Long, Int)])
  private val versionsGen: Gen[Ver] = for {
    n <- Gen.chooseNum(6, 14)
    v1b <- Gen.listOfN(n, bodyIx)
    ops <- Gen.listOfN(n, Gen.chooseNum(0, 8))
    edits <- Gen.listOfN(n, bodyIx)
    nAdd <- Gen.chooseNum(0, 4)
    addB <- Gen.listOfN(nAdd, bodyIx)
  } yield {
    val v1 = v1b.zipWithIndex.map { case (b, i) => (i.toLong, b) }
    val v2kept = v1.zip(ops).zip(edits).flatMap {
      case (((id, b), op), e) =>
        if (op == 6) None
        else if (op >= 7) Some((id, e))
        else Some((id, b))
    }
    val v2 = v2kept ++ addB.zipWithIndex.map { case (b, i) => (1000L + i, b) }
    Ver(v1, v2)
  }

  property("repack(random delta) == batch rebuild, whatever the collision structure") =
    forAll(versionsGen) { ver =>
      import spark.implicits._
      val prev = ver.v1.map { case (id, b) => (id, bodies(b)) }.toDF("doc_id", "text")
      val curr = ver.v2.map { case (id, b) => (id, bodies(b)) }.toDF("doc_id", "text")
      val led = Incremental.ledger(prev, "doc_id", "text", keep)
      val got = rows(Incremental.repack(led, pack(prev), curr,
        Snapshot.diff(prev, curr, "doc_id", "text"),
        "doc_id", "text", keep,
        maxTokens = 8, overlap = 2, budget = 24L, shards = 8, docShard))
      got == rows(pack(curr))
    }

  // ---- scrub refresh: random df-crossing structure ------------------

  private val tails: Vector[String] = Vector("",
    " ta1 ta2 ta3 ta4 ta5 ta6", " tb1 tb2 tb3 tb4 tb5 tb6",
    " tc1 tc2 tc3 tc4 tc5 tc6")
  private def scrubBody(i: Long): String =
    (0 until 10).map(j => s"u${i}w$j").mkString(" ")

  private case class ScrubVer(v1: Seq[(Long, Int)], v2: Seq[(Long, Int)])
  // per-id a tail index for each version: edits move a doc between tail
  // groups, so shared-window df counts cross the minDf=2 threshold in
  // both directions at random (the ripple structure under test); removals
  // and additions change holder counts of docs NOBODY touched
  private val scrubGen: Gen[ScrubVer] = for {
    n <- Gen.chooseNum(5, 12)
    t1 <- Gen.listOfN(n, Gen.chooseNum(0, tails.size - 1))
    ops <- Gen.listOfN(n, Gen.chooseNum(0, 9)) // 0-6 keep, 7 remove, 8-9 re-tail
    t2 <- Gen.listOfN(n, Gen.chooseNum(0, tails.size - 1))
    nAdd <- Gen.chooseNum(0, 3)
    addT <- Gen.listOfN(nAdd, Gen.chooseNum(0, tails.size - 1))
  } yield {
    val v1 = t1.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val v2 = v1.zip(ops).zip(t2).flatMap { case (((id, t), op), nt) =>
      if (op == 7) None else if (op >= 8) Some((id, nt)) else Some((id, t))
    } ++ addT.zipWithIndex.map { case (t, i) => (1000L + i, t) }
    ScrubVer(v1, v2)
  }

  private def scrubRows(df: DataFrame): Set[(Long, String, Long, Long)] = {
    import spark.implicits._
    df.select(col("id"), col("scrubbed_text"), col("n_tokens"), col("n_removed"))
      .as[(Long, String, Long, Long)].collect().toSet
  }

  property("scrub refresh == batch spanScrub over random df-crossing deltas") =
    forAll(scrubGen) { ver =>
      import spark.implicits._
      import graft.operators.{Dedup, IncrementalScrub}
      val prev = ver.v1.map { case (id, t) => (id, scrubBody(id) + tails(t)) }
        .toDF("doc_id", "text")
      val curr = ver.v2.map { case (id, t) => (id, scrubBody(id) + tails(t)) }
        .toDF("doc_id", "text")
      try {
        val st = IncrementalScrub.state(prev, "doc_id", "text", 4, 2)
        val next = IncrementalScrub.refresh(st, curr,
          Snapshot.diff(prev, curr, "doc_id", "text"),
          "doc_id", "text", 4, 2)
        val want = scrubRows(
          Dedup.spanScrub(curr, "doc_id", "text", 4, 2)
            .select(col("doc_id").as("id"), col("scrubbed_text"),
              col("n_tokens"), col("n_removed")))
        scrubRows(next.scrubbed) == want
      } finally Dedup.unpersistIntermediates()
    }
}
