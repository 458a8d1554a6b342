package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: assign documents to
  * fixed-token-budget sequences (the pre-tokenization shuffle step before
  * examples are concatenated into model context windows).
  *
  * Scale shape: documents are hash-sharded (shards pack independently — at
  * 100 TB every shard is a separate task, no global coordination), each
  * shard is sorted by id and greedily packed. The greedy scan is genuine
  * per-partition imperative logic — the one place `mapPartitions` is the
  * right tool — while sharding, sorting, and schema stay declarative.
  * Oversized documents get a sequence of their own (callers chunk or drop
  * them upstream).
  */
object Packing {

  /** Pack `(idCol, tokenCol)` rows into sequences of at most `budget`
    * tokens within `shards` hash shards. Output: (id, n_tokens, shard,
    * seq_id) with seq_id unique per shard, deterministic for a given
    * (input, shards, budget).
    *
    * `shardOn` overrides the default xxhash64 shard routing with a
    * caller-supplied int expression in [0, shards) — pass md5-prefix
    * arithmetic when the assignment itself must replay in a second
    * engine (the packed_token_stream gate), or a metadata column when
    * shards must align with an existing layout.
    *
    * `perDocOverhead` reserves budget for per-document structure tokens
    * a downstream stream builder inserts — the document-separator (EOS)
    * convention every real trainer uses (`doc₁ EOS doc₂ EOS …`): with
    * overhead 1, a sequence holding d MULTI-PACKED documents spends
    * Σnᵢ + d of its budget. 0 (the default) is the bare-concatenation
    * form.
    *
    * Overflow contract for docs AT or ABOVE the budget: a doc with
    * n ≥ budget − overhead + 1 opens its own sequence and that sequence
    * OVERFLOWS the modeled window — it carries min(n, budget) + overhead
    * accounting slots but a downstream EOS stream emits all n tokens
    * plus the separator (an exactly-budget-sized doc thus yields a
    * budget+1-token sequence). This is deliberate: the packer never
    * truncates content — a trainer that must hard-cap the window
    * chunk-splits oversized docs UPSTREAM (chunk_docs) rather than
    * asking the packer to silently drop tokens — and the DuckDB packer
    * replay (`LEAST(n, budget) + overhead`) mirrors the same accounting,
    * so the gates pin this shape end to end. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, shards: Int,
                    shardOn: Option[org.apache.spark.sql.Column] = None,
                    perDocOverhead: Long = 0L): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    require(perDocOverhead >= 0, "perDocOverhead must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val shardExpr = shardOn
      .getOrElse(pmod(xxhash64(col(idCol)), lit(shards.toLong)))
    val prepped = df
      .select(
        col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n_tokens"),
        shardExpr.cast("int").as("shard"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Long, Int)]
    prepped.mapPartitions { it =>
      // greedy first-fit on sorted order: one sequential pass per shard
      var seq = 0L
      var used = 0L
      var cur = Int.MinValue
      it.map { case (id, n, shard) =>
        if (shard != cur) { cur = shard; seq = 0L; used = 0L }
        if (used > 0 && used + n + perDocOverhead > budget) { seq += 1; used = 0L }
        used += math.min(n, budget) + perDocOverhead
        (id, n, shard, seq)
      }
    }.toDF("id", "n_tokens", "shard", "seq_id")
  }

  /** Best-fit-decreasing packing (Johnson 1973's BFD — the classic
    * ≤ 11/9·OPT + 1 offline bin-packing rule; "sorted packing" in the
    * training-data literature): same contract as [[packSequences]], but
    * within each shard documents are taken LARGEST-FIRST (ties by id)
    * and each is placed into the FULLEST already-open sequence it fits
    * (ties to the smallest seq_id), opening a new sequence only when
    * none fits. Trades [[packSequences]]' stream-order scan (which
    * preserves id locality and needs O(1) state) for materially less
    * padding — the padding-waste census (`packing_efficiency`) measures
    * the gap on the real corpus; a training loader picks per epoch.
    *
    * Fit test: `used + min(n, budget) + perDocOverhead <= budget` — an
    * oversized doc (n ≥ budget) never fits an open sequence and gets the
    * same own-sequence overflow contract as the greedy packer (content
    * is never truncated; hard caps belong upstream in chunk_docs).
    *
    * Scale shape: identical to the greedy packer — one skinny row per
    * doc, shards pack independently in one `mapPartitions` pass. The
    * open-bin state is a TreeMap keyed by load (best fit = floorEntry),
    * O(log bins) per doc; bins per shard is bounded by the shard's doc
    * count, and shard count is the operator's parallelism knob, so at
    * 100 TB the state per task stays the shard's open-bin set, not the
    * corpus'. Deterministic for a given (input, shards, budget): the
    * order and both tie-breaks are total. */
  def packBestFit(df: DataFrame, idCol: String, tokenCol: String,
                  budget: Long, shards: Int,
                  shardOn: Option[org.apache.spark.sql.Column] = None,
                  perDocOverhead: Long = 0L): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    require(perDocOverhead >= 0, "perDocOverhead must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val shardExpr = shardOn
      .getOrElse(pmod(xxhash64(col(idCol)), lit(shards.toLong)))
    val prepped = df
      .select(
        col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n_tokens"),
        shardExpr.cast("int").as("shard"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("id"))
      .as[(Long, Long, Int)]
    prepped.mapPartitions { it =>
      // per-shard best-fit state: load -> ordered open-seq ids at that
      // load; floorEntry(budget - need) is the fullest sequence with room
      var loadToSeqs: java.util.TreeMap[Long, java.util.TreeSet[Long]] = null
      var nextSeq = 0L
      var cur = Int.MinValue
      it.map { case (id, n, shard) =>
        if (shard != cur) {
          cur = shard
          loadToSeqs = new java.util.TreeMap[Long, java.util.TreeSet[Long]]
          nextSeq = 0L
        }
        val need = math.min(n, budget) + perDocOverhead
        val fit = loadToSeqs.floorEntry(budget - need)
        val seq =
          if (fit == null) { val s = nextSeq; nextSeq += 1; s }
          else {
            val seqs = fit.getValue
            val s = seqs.first()
            seqs.remove(s)
            if (seqs.isEmpty) loadToSeqs.remove(fit.getKey): Unit
            s
          }
        val newLoad = (if (fit == null) 0L else fit.getKey) + need
        val atLoad = loadToSeqs.computeIfAbsent(newLoad,
          _ => new java.util.TreeSet[Long])
        atLoad.add(seq): Unit
        (id, n, shard, seq)
      }
    }.toDF("id", "n_tokens", "shard", "seq_id")
  }
}
