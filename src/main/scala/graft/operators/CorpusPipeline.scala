package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-preparation pipeline a production training-data run
  * actually executes: [line-cut →] normalize → exact-dedup →
  * quality-filter → near-dup-drop → span-scrub → chunk → pack, end to end
  * over one documents table (line-cut is the opt-in CCNet first tier,
  * running on RAW text because normalization collapses the newlines that
  * define lines). The individual stages exist (and are gated) as
  * standalone operators — [[Dedup.lineDedup]], [[TextOps.normalizeTextNfc]],
  * [[Dedup.exactByHash]], [[TextOps.corpusFilterRules]],
  * [[Dedup.ngramJaccardPairs]], [[Dedup.spanScrub]], [[TextOps.chunkDocs]],
  * [[Packing.packSequences]] — but the composition is the product: what
  * reaches the tokenizer is exactly the packed output of the whole chain,
  * and a token lost between stages is a training bug no per-stage gate can
  * see. (Reference analogue: the asset graph chains ingest → validate →
  * transform the same way, base_assets.py:60+ — the edges between assets
  * are the pipeline.)
  *
  * Stage order note: near-dup drop runs BEFORE span-scrub on purpose — a
  * near-duplicate pair shares most of its stride-1 windows, so scrubbing
  * first would count those windows twice, mark both documents as repeated
  * end to end, and gut both; dropping the duplicate first leaves the
  * survivor's text intact for genuine cross-document boilerplate
  * detection.
  *
  * Scale shape, stage by stage:
  *   - normalize: pure codegen'd projection, no shuffle;
  *   - dedup: one hash shuffle on the 128-bit content hash (16-byte keys,
  *     never documents);
  *   - filter: row-local predicates fused into the same stage as the
  *     dedup window's output — no extra exchange;
  *   - near-dup: candidate pairs + exact-Jaccard verify + one left-anti
  *     join on the loser ids. Candidates come from the caller's block key
  *     (|block|² pair space — replayable, right when a second engine must
  *     replay the stage) or, with `banded = true`, from MinHash LSH
  *     banding whose bucket cardinality grows with the corpus and whose
  *     hot buckets are guarded — the 100 TB form;
  *   - scrub: spanScrub's one persisted tokenize pass + skinny-key
  *     frequency aggregate + left-semi attach;
  *   - chunk: projection + explode, no shuffle;
  *   - pack: one repartition on the hash shard, greedy scan per shard.
  * Nothing is collected to the driver at any size.
  */
object CorpusPipeline {

  /** Default keep-predicate: every [[TextOps.corpusFilterRules]] rule must
    * pass on the normalized text. Callers tune the ruleset per corpus —
    * e.g. a terminal-punctuation rule is wrong for a code corpus. */
  def defaultKeep(normText: Column): Column =
    TextOps.corpusFilterRules(normText).map(_._2).reduce(_ && _)

  /** Near-dup stage configuration: `block` derives the blocking key from
    * the NORMALIZED text (pairs are only compared within a block — pass a
    * SimHash band derivation at moderate scale, a replayable prefix key
    * when a second engine must replay the stage); `n` is the word-shingle
    * width and `threshold` the exact-Jaccard cut. Within a verified pair
    * the HIGHER id is dropped (keep-first — deterministic, order-free).
    *
    * `banded = true` switches candidate generation to MinHash LSH banding
    * ([[Dedup.minhashNearDups]] — `block` is then unused): band-bucket
    * cardinality grows WITH the corpus and hot buckets are guarded, so the
    * pair space stays bounded at any size — the 100 TB strategy. The trade
    * is LSH recall at the threshold boundary (the S-curve: ~1 for the
    * near-identical pairs dedup exists for, <1 for pairs sitting exactly
    * at t) against the block join's exact-but-|block|² pair space — at
    * sf1 the exact prefix-block gate shape already costs 60+ s of pure
    * pair join, and it is quadratic in the decade after that. */
  case class NearDup(block: Column => Column, n: Int = 3, threshold: Double = 0.6,
                     banded: Boolean = false)

  /** Span-scrub stage configuration: [[Dedup.spanScrub]]'s window width
    * and corpus-wide occurrence floor; documents scrubbed to zero tokens
    * are dropped from the pipeline (all-boilerplate docs). */
  case class SpanScrub(window: Int = 8, minDf: Int = 2)

  /** Per-line exact-dedup stage configuration ([[Dedup.lineDedup]], the
    * CCNet first tier): lines whose normalized form repeats `minCount`+
    * times corpus-wide are cut from every document BEFORE normalization —
    * it must run on the RAW text, because [[TextOps.normalizeText]]
    * collapses the newlines that define lines. A doc cut to "" flows on
    * and falls to the too-short filter rule (counted, not vanished). */
  case class LineCut(minCount: Long = 2L)

  /** Apply the opt-in line-cut stage: docs with `textCol` replaced by
    * [[Dedup.lineDedup]]'s cleaned text (ledger columns dropped — the
    * standalone `line_dedup` gate pins those). */
  private[operators] def lineCutDocs(docs: DataFrame, idCol: String,
                                     textCol: String,
                                     cfg: LineCut): DataFrame =
    Dedup.lineDedup(docs, idCol, textCol, cfg.minCount)
      .select(col("id").as(idCol), col("cleaned_text").as(textCol))

  /** One flagged frame carrying every stage's verdict per document:
    * (id, norm_text, is_canonical, passes_filters). Computing flags
    * instead of filtering lets [[summary]] count all stages in a single
    * aggregate, and [[prepare]] filter once. The chain is evaluated
    * deliberately uncached: at corpus scale streaming passes beat
    * persisting a corpus-sized normalized intermediate, and each pass is
    * a map-side projection plus small-key shuffles. */
  private def flagged(docs: DataFrame, idCol: String, textCol: String,
                      keep: Column => Column): DataFrame = {
    val norm = docs.select(
      col(idCol).as("id"),
      TextOps.normalizeTextNfc(col(textCol)).as("norm_text"))
    // lowest-id row per distinct normalized content is the canonical copy
    // (same rule as Dedup.exactByHash; inlined as a flag so survivors and
    // losers stay in one frame for the stage counts)
    val w = Window.partitionBy(md5(col("norm_text"))).orderBy(col("id").asc)
    norm
      .withColumn("is_canonical", row_number().over(w) === 1)
      .withColumn("passes_filters", keep(col("norm_text")))
  }

  /** The staged lazy frames shared by [[prepare]] and [[summary]]:
    * (filter survivors, near-dup survivors, scrub output over them,
    * post-scrub docs that still have tokens). */
  private def stages(docs: DataFrame, idCol: String, textCol: String,
                     keep: Column => Column,
                     nearDup: Option[NearDup], scrub: Option[SpanScrub])
      : (DataFrame, DataFrame, Option[DataFrame], DataFrame) = {
    // With either new stage on, the normalize+dedup-window chain feeds
    // many consumers (pair generation, the anti-join probe, the scrub
    // tokenize pass, three audit aggregates) — persist the skinny
    // (id, norm_text) projection once instead of re-normalizing the
    // corpus per consumer (tracked cache; callers drain via
    // Dedup.unpersistIntermediates). With both stages off the chain has
    // two consumers and the original two-streaming-passes trade stands.
    val survivorsRaw = flagged(docs, idCol, textCol, keep)
      .filter(col("is_canonical") && col("passes_filters"))
      .select(col("id"), col("norm_text"))
    val survivors =
      if (nearDup.isEmpty && scrub.isEmpty) survivorsRaw
      else Dedup.persistTracked(survivorsRaw)
    val afterNearDup = nearDup match {
      case None => survivors
      case Some(cfg) =>
        val pairs =
          if (cfg.banded)
            Dedup.minhashNearDups(survivors, "id", "norm_text",
              shingleWidth = cfg.n, threshold = cfg.threshold)
          else {
            val blocked =
              survivors.withColumn("__block", cfg.block(col("norm_text")))
            Dedup.ngramJaccardPairs(blocked, "id", "norm_text", "__block",
              cfg.n, cfg.threshold)
          }
        // persisted: the anti-joined survivor frame feeds several
        // consumers (the stage count, the scrub chain, chunking), and
        // without this each one re-executes the whole pair generation —
        // the single most expensive stage. The loser-id set is the
        // skinniest thing that cuts that lineage (O(dropped docs) longs).
        val losers = Dedup.persistTracked(
          pairs.select(col("id_b").as("id")).distinct())
        survivors.join(losers, Seq("id"), "left_anti")
    }
    val scrubbed = scrub.map { cfg =>
      Dedup.spanScrub(afterNearDup, "id", "norm_text", cfg.window, cfg.minDf)
    }
    val chunkInput = scrubbed match {
      case None => afterNearDup
      case Some(sc) => sc
        .filter(col("n_tokens") - col("n_removed") > 0)
        .select(col("id"), col("scrubbed_text").as("norm_text"))
    }
    (survivors, afterNearDup, scrubbed, chunkInput)
  }

  /** Run the full chain and return the packed training chunks:
    * (doc_id, chunk_id, n_tokens, shard, seq_id). The near-dup and scrub
    * stages are opt-in (None = stage off, prior behavior). Chunks are
    * keyed by `doc_id * 1e6 + chunk_id` inside the packer
    * (collision-free while a single document stays under a million
    * chunks — 32M tokens at the default window; callers with longer docs
    * split upstream). REQUIRES nonnegative doc ids below 2^63/1e6 ≈
    * 9.2e12: the key multiply overflows past that bound, and a negative
    * id would make the integer div/pmod decode below disagree on which
    * chunk a key names. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              maxTokens: Int = 512, overlap: Int = 64,
              budget: Long = 4096L, shards: Int = 64,
              keep: Column => Column = defaultKeep,
              nearDup: Option[NearDup] = None,
              scrub: Option[SpanScrub] = None,
              lineCut: Option[LineCut] = None): DataFrame = {
    val input = lineCut.fold(docs)(lineCutDocs(docs, idCol, textCol, _))
    val (_, _, _, chunkInput) =
      stages(input, idCol, textCol, keep, nearDup, scrub)
    val chunks = TextOps.chunkDocs(chunkInput, "id", "norm_text", maxTokens, overlap)
      .withColumn("chunk_key", col("id") * lit(1000000L) + col("chunk_id"))
    Packing.packSequences(chunks, "chunk_key", "n_tokens", budget, shards)
      .select(
        // integer division, not double `/` + cast: exact for every legal
        // key (double division loses ULPs past 2^53 and truncates toward
        // zero, which disagrees with pmod for negatives)
        expr("id div 1000000").as("doc_id"),
        pmod(col("id"), lit(1000000L)).cast("int").as("chunk_id"),
        col("n_tokens"), col("shard"), col("seq_id"))
  }

  /** Single-row audit of the whole chain — the conservation gate: every
    * token that leaves chunking must land in exactly one packed sequence
    * (`packed_tokens` = chunk-stage token sum, which a second engine can
    * replay analytically), every multi-chunk bin must respect the budget,
    * each stage's survivor count is pinned, and the scrub stage's token
    * ledger balances exactly (tokens_before_scrub − tokens_removed_scrub
    * tokens enter chunking). Each aggregate is a single-row frame; the
    * final assembly is broadcast cross-joins of scalars. */
  def summary(docs: DataFrame, idCol: String, textCol: String,
              maxTokens: Int = 512, overlap: Int = 64,
              budget: Long = 4096L, shards: Int = 64,
              keep: Column => Column = defaultKeep,
              nearDup: Option[NearDup] = None,
              scrub: Option[SpanScrub] = None,
              lineCut: Option[LineCut] = None): DataFrame = {
    val docsIn = lineCut.fold(docs)(lineCutDocs(docs, idCol, textCol, _))
    val stageCounts = flagged(docsIn, idCol, textCol, keep).agg(
      count(lit(1)).as("docs_in"),
      sum(when(col("is_canonical"), 1L).otherwise(0L)).as("docs_unique"),
      sum(when(col("is_canonical") && col("passes_filters"), 1L).otherwise(0L))
        .as("docs_kept"))
    val (_, afterNearDup, scrubbed, chunkInput) =
      stages(docsIn, idCol, textCol, keep, nearDup, scrub)
    val ndCount = afterNearDup.agg(count(lit(1)).as("docs_after_neardup"))
    // scrub ledger: token counts before/removed come from spanScrub's own
    // per-doc accounting; with the stage off the ledger reads
    // (pre-chunk token sum, 0, docs_after_neardup) so the schema is stable
    val scrubLedger = scrubbed match {
      case Some(sc) => sc.agg(
        coalesce(sum("n_tokens"), lit(0L)).as("tokens_before_scrub"),
        coalesce(sum("n_removed"), lit(0L)).as("tokens_removed_scrub"),
        coalesce(sum(when(col("n_tokens") - col("n_removed") > 0, 1L)
          .otherwise(0L)), lit(0L)).as("docs_after_scrub"))
      case None => afterNearDup.agg(
        coalesce(sum(size(split(trim(col("norm_text")), "\\s+"))
          .cast("long")), lit(0L)).as("tokens_before_scrub"),
        lit(0L).as("tokens_removed_scrub"),
        count(lit(1)).as("docs_after_scrub"))
    }
    val chunks = TextOps.chunkDocs(chunkInput, "id", "norm_text", maxTokens, overlap)
      .withColumn("chunk_key", col("id") * lit(1000000L) + col("chunk_id"))
    val packed = Packing.packSequences(chunks, "chunk_key", "n_tokens", budget, shards)
    val bins = packed.groupBy("shard", "seq_id")
      .agg(sum("n_tokens").as("seq_tokens"), count(lit(1)).as("n_chunks"))
    // coalesce: a keep-predicate that rejects every document leaves the
    // packed frame empty, and sum/min over zero rows are NULL — the audit
    // row must then read 0 chunks / 0 tokens / budget vacuously OK, not
    // three NULLs a downstream gate would misread
    val totals = bins.agg(
      coalesce(sum("n_chunks"), lit(0L)).as("n_chunks"),
      coalesce(sum("seq_tokens"), lit(0L)).as("packed_tokens"),
      coalesce(min(when(col("seq_tokens") <= budget || col("n_chunks") === 1, 1)
        .otherwise(0)), lit(1)).as("__budget_ok"))
    // four single-row frames → broadcast-joined scalar row, no real shuffle
    stageCounts.crossJoin(ndCount).crossJoin(scrubLedger).crossJoin(totals)
      .select(col("docs_in"), col("docs_unique"), col("docs_kept"),
        col("docs_after_neardup"),
        col("tokens_before_scrub"), col("tokens_removed_scrub"),
        col("docs_after_scrub"),
        col("n_chunks"), col("packed_tokens"),
        (col("__budget_ok") === 1).as("budget_ok"))
  }
}
