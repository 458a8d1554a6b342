package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-preparation pipeline a production training-data run
  * actually executes: normalize → exact-dedup → quality-filter → chunk →
  * pack, end to end over one documents table. The individual stages exist
  * (and are gated) as standalone operators — [[TextOps.normalizeTextNfc]],
  * [[Dedup.exactByHash]], [[TextOps.corpusFilterRules]],
  * [[TextOps.chunkDocs]], [[Packing.packSequences]] — but the composition
  * is the product: what reaches the tokenizer is exactly the packed output
  * of the whole chain, and a token lost between stages is a training bug
  * no per-stage gate can see. (Reference analogue: the asset graph chains
  * ingest → validate → transform the same way, base_assets.py:60+ — the
  * edges between assets are the pipeline.)
  *
  * Scale shape, stage by stage:
  *   - normalize: pure codegen'd projection, no shuffle;
  *   - dedup: one hash shuffle on the 128-bit content hash (16-byte keys,
  *     never documents);
  *   - filter: row-local predicates fused into the same stage as the
  *     dedup window's output — no extra exchange;
  *   - chunk: projection + explode, no shuffle;
  *   - pack: one repartition on the hash shard, greedy scan per shard.
  * Total: two shuffles for the whole corpus pass, both on small keys, at
  * any corpus size. Nothing is collected to the driver.
  */
object CorpusPipeline {

  /** Default keep-predicate: every [[TextOps.corpusFilterRules]] rule must
    * pass on the normalized text. Callers tune the ruleset per corpus —
    * e.g. a terminal-punctuation rule is wrong for a code corpus. */
  def defaultKeep(normText: Column): Column =
    TextOps.corpusFilterRules(normText).map(_._2).reduce(_ && _)

  /** One flagged frame carrying every stage's verdict per document:
    * (id, norm_text, is_canonical, passes_filters). Computing flags
    * instead of filtering lets [[summary]] count all stages in a single
    * aggregate, and [[prepare]] filter once. [[summary]] evaluates the
    * chain twice — once for the stage counts, once through the packer —
    * deliberately uncached: at corpus scale two streaming passes beat
    * persisting a corpus-sized normalized intermediate, and each pass is
    * a map-side projection plus one small-key shuffle. */
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

  /** Run the full chain and return the packed training chunks:
    * (doc_id, chunk_id, n_tokens, shard, seq_id). Chunks are keyed by
    * `doc_id * 1e6 + chunk_id` inside the packer (collision-free while a
    * single document stays under a million chunks — 32M tokens at the
    * default window; callers with longer docs split upstream). REQUIRES
    * nonnegative doc ids below 2^63/1e6 ≈ 9.2e12: the key multiply
    * overflows past that bound, and a negative id would make the integer
    * div/pmod decode below disagree on which chunk a key names. */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
              maxTokens: Int = 512, overlap: Int = 64,
              budget: Long = 4096L, shards: Int = 64,
              keep: Column => Column = defaultKeep): DataFrame = {
    val survivors = flagged(docs, idCol, textCol, keep)
      .filter(col("is_canonical") && col("passes_filters"))
      .select(col("id"), col("norm_text"))
    val chunks = TextOps.chunkDocs(survivors, "id", "norm_text", maxTokens, overlap)
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
    * and each stage's survivor count is pinned. Two jobs: one aggregate
    * over the flagged frame, one over the packed output. */
  def summary(docs: DataFrame, idCol: String, textCol: String,
              maxTokens: Int = 512, overlap: Int = 64,
              budget: Long = 4096L, shards: Int = 64,
              keep: Column => Column = defaultKeep): DataFrame = {
    val stages = flagged(docs, idCol, textCol, keep).agg(
      count(lit(1)).as("docs_in"),
      sum(when(col("is_canonical"), 1L).otherwise(0L)).as("docs_unique"),
      sum(when(col("is_canonical") && col("passes_filters"), 1L).otherwise(0L))
        .as("docs_kept"))
    val packed = prepare(docs, idCol, textCol, maxTokens, overlap, budget, shards, keep)
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
    // two single-row frames → broadcast-joined scalar row, no real shuffle
    stages.crossJoin(totals)
      .select(col("docs_in"), col("docs_unique"), col("docs_kept"),
        col("n_chunks"), col("packed_tokens"),
        (col("__budget_ok") === 1).as("budget_ok"))
  }
}
