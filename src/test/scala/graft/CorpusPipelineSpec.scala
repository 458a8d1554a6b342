package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPipeline, QualityModel, TextOps}

class CorpusPipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // A corpus with a known outcome per stage: doc 1 is canonical, doc 2 is a
  // cosmetic variant of it (case + whitespace — dedup must collapse them),
  // doc 3 fails the length filter, doc 4 is long enough to chunk, doc 5 is
  // digit-heavy (filter must drop it).
  private val longText =
    (1 to 120).map(i => s"word$i token").mkString(" ") + " tail."
  private val corpus = Seq(
    (1L, ("alpha beta gamma delta " * 10).trim + " end."),
    (2L, ("ALPHA  beta\tgamma   DELTA " * 10).trim + "\tEND."),
    (3L, "too short."),
    (4L, longText),
    (5L, "1234567890 " * 30)
  ).toDF("doc_id", "text")

  test("summary: stage counts, conservation, budget flag") {
    val row = CorpusPipeline.summary(corpus, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2).collect().head
    assert(row.getAs[Long]("docs_in") === 5L)
    assert(row.getAs[Long]("docs_unique") === 4L, "doc 2 must dedup into doc 1")
    assert(row.getAs[Long]("docs_kept") === 2L, "docs 3 and 5 must be filtered")
    assert(row.getAs[Boolean]("budget_ok"))
    // conservation: packed token total == chunk-stage token total computed
    // independently (chunkDocs over the surviving canonical docs)
    val survivors = corpus.filter(col("doc_id").isin(1L, 4L))
      .select(col("doc_id"), TextOps.normalizeTextNfc(col("text")).as("t"))
    val chunkTokens = TextOps.chunkDocs(survivors, "doc_id", "t",
        maxTokens = 32, overlap = 8)
      .agg(sum("n_tokens")).as[Long].collect().head
    assert(row.getAs[Long]("packed_tokens") === chunkTokens)
    assert(row.getAs[Long]("n_chunks") > 2L, "doc 4 must split into chunks")
  }

  test("prepare: packed chunks trace back to surviving docs, bins respect budget") {
    val packed = CorpusPipeline.prepare(corpus, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2)
      .as[(Long, Int, Long, Int, Long)].collect()
    assert(packed.map(_._1).distinct.sorted === Array(1L, 4L))
    // chunk ids are dense per doc starting at 0
    val chunksOf4 = packed.filter(_._1 == 4L).map(_._2).sorted
    assert(chunksOf4 === (0 until chunksOf4.length).toArray)
    // every multi-chunk bin within budget
    packed.groupBy(p => (p._4, p._5)).foreach { case (_, bin) =>
      assert(bin.map(_._3).sum <= 128L || bin.length == 1)
    }
    // deterministic end to end
    val again = CorpusPipeline.prepare(corpus, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2)
      .as[(Long, Int, Long, Int, Long)].collect()
    assert(packed.sortBy(p => (p._1, p._2)) === again.sortBy(p => (p._1, p._2)))
  }

  test("near-dup drop: jittered copy dropped keep-first; scrub cuts shared boilerplate") {
    // NON-cyclic bodies (a repeating "x y z w * 10" body would self-match
    // its own stride-1 windows and scrub itself away entirely)
    def pseudoWords(prefix: String) = (0 until 40)
      .map(i => s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}ph")
      .mkString(" ")
    val (body1, body2) = (pseudoWords("a"), pseudoWords("b"))
    // 8 tokens, '.' attached so the terminal-punct default rule passes
    val boiler = "shared license boilerplate sentence repeated across documents verbatim."
    val corpus2 = Seq(
      (1L, body1 + " " + boiler),
      (2L, body2 + " " + boiler),
      // near-dup of doc 1: same prefix block, four appended tokens
      (3L, body1 + " " + boiler + " tiny appended jitter tail.")
    ).toDF("doc_id", "text")
    val nd = CorpusPipeline.NearDup(
      t => concat_ws(" ", slice(split(trim(t), "\\s+"), 1, 2)),
      n = 3, threshold = 0.6)
    val sc = CorpusPipeline.SpanScrub(window = 8, minDf = 2)
    val row = CorpusPipeline.summary(corpus2, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2,
      nearDup = Some(nd), scrub = Some(sc)).collect().head
    assert(row.getAs[Long]("docs_kept") === 3L)
    assert(row.getAs[Long]("docs_after_neardup") === 2L,
      "doc 3 must be dropped as the higher id of a >=0.6 Jaccard pair")
    // the 8-token boilerplate tail repeats across the two survivors →
    // scrub removes exactly those 8 tokens from each (boundary windows
    // straddling body+tail are unique per doc and must not be cut)
    assert(row.getAs[Long]("tokens_removed_scrub") === 16L)
    assert(row.getAs[Long]("docs_after_scrub") === 2L)
    // conservation across the new edges: chunk input = before - removed
    val expectedChunkInput =
      row.getAs[Long]("tokens_before_scrub") - row.getAs[Long]("tokens_removed_scrub")
    // replay chunking analytically over what the pipeline should emit
    val survivors = Seq((1L, body1), (2L, body2)).toDF("id", "norm_text")
    val chunkTokens = TextOps.chunkDocs(survivors, "id", "norm_text",
        maxTokens = 32, overlap = 8)
      .agg(sum("n_tokens")).as[Long].collect().head
    assert(row.getAs[Long]("packed_tokens") === chunkTokens)
    val survivorTokens = survivors
      .select(size(split(col("norm_text"), " ")).cast("long")).as[Long]
      .collect().sum
    assert(expectedChunkInput === survivorTokens)
  }

  test("banded near-dup strategy: LSH candidates reach the same drop for " +
       "near-identical pairs; block key unused") {
    // same corpus as the exact-block test — the jittered copy sits at
    // Jaccard ~0.93, where the 8x4 banding S-curve is ~1, so the banded
    // strategy must reach the identical stage outcome the exact form pins
    def pseudoWords(prefix: String) = (0 until 40)
      .map(i => s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}ph")
      .mkString(" ")
    val (body1, body2) = (pseudoWords("a"), pseudoWords("b"))
    val boiler = "shared license boilerplate sentence repeated across documents verbatim."
    val corpus2 = Seq(
      (1L, body1 + " " + boiler),
      (2L, body2 + " " + boiler),
      (3L, body1 + " " + boiler + " tiny appended jitter tail.")
    ).toDF("doc_id", "text")
    val nd = CorpusPipeline.NearDup(
      // a degenerate constant block key: banded generation must ignore it
      _ => lit("unused"),
      n = 3, threshold = 0.6, banded = true)
    val row = CorpusPipeline.summary(corpus2, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2,
      nearDup = Some(nd),
      scrub = Some(CorpusPipeline.SpanScrub(window = 8, minDf = 2)))
      .collect().head
    assert(row.getAs[Long]("docs_after_neardup") === 2L,
      "banded LSH candidates must drop the jittered higher-id copy")
    assert(row.getAs[Long]("tokens_removed_scrub") === 16L)
    assert(row.getAs[Long]("docs_after_scrub") === 2L)
  }

  test("stages default to off: prepare/summary unchanged without configs") {
    val withDefaults = CorpusPipeline.summary(corpus, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2).collect().head
    assert(withDefaults.getAs[Long]("docs_after_neardup")
      === withDefaults.getAs[Long]("docs_kept"))
    assert(withDefaults.getAs[Long]("tokens_removed_scrub") === 0L)
    assert(withDefaults.getAs[Long]("docs_after_scrub")
      === withDefaults.getAs[Long]("docs_kept"))
  }

  test("custom keep-predicate reaches the filter stage") {
    val none = CorpusPipeline.summary(corpus, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2,
      keep = _ => lit(false)).collect().head
    assert(none.getAs[Long]("docs_kept") === 0L)
    assert(none.getAs[Long]("docs_unique") === 4L)
    // the empty-pipeline path must read 0/0/OK, not NULL aggregates
    assert(none.getAs[Long]("n_chunks") === 0L)
    assert(none.getAs[Long]("packed_tokens") === 0L)
    assert(none.getAs[Boolean]("budget_ok"), "empty packing is vacuously within budget")
  }

  test("model filter composes into keep: drops heuristic-passing gibberish only") {
    // a doc that PASSES the default heuristic rules (length, digits, word
    // length in range, terminal punctuation) but has zero stopwords and
    // maxed word-length — exactly the doc only a trained model rejects
    val modelBad = (100L, (1 to 40).map(i => f"qzxwvutsrq")
      .zipWithIndex.map { case (w, i) => w.dropRight(2) + ('b' + i % 24).toChar + "m" }
      .mkString(" ") + " closing.")
    val wts = QualityModel.Weights(6.423447,
      Array(2.151676, 1.776349, -10.556339, 0.0))
    val base = CorpusPipeline.summary(corpus, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2).collect().head
    val withDoc = corpus.unionByName(Seq(modelBad).toDF("doc_id", "text"))
    val heuristicOnly = CorpusPipeline.summary(withDoc, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2).collect().head
    assert(heuristicOnly.getAs[Long]("docs_kept") === base.getAs[Long]("docs_kept") + 1,
      "the gibberish doc passes every heuristic rule")
    val composed = CorpusPipeline.summary(withDoc, "doc_id", "text",
      maxTokens = 32, overlap = 8, budget = 128L, shards = 2,
      keep = t => CorpusPipeline.defaultKeep(t) && QualityModel.logitCol(t, wts) > 0)
      .collect().head
    assert(composed.getAs[Long]("docs_kept") === base.getAs[Long]("docs_kept"),
      "the composed model predicate drops the gibberish doc and nothing else")
  }
}
