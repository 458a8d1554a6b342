package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-only Bloom filter over a key column — the constant-size
  * pre-filter that makes the incremental-crawl novelty gate (D15,
  * Dedup.novelDocs) cheap at 100 TB. The plain gate anti-joins every
  * fresh batch against the corpus's content-hash projection: correct, but
  * each refresh shuffles O(|corpus|) 16-byte keys to re-answer mostly
  * "never seen". A Bloom filter built ONCE per corpus refresh answers
  * "definitely novel" for the overwhelming majority of fresh docs with a
  * broadcast-attach + k bit tests (map-only, no shuffle); only the
  * bloom-POSITIVE sliver pays the exact anti-join, and Bloom's no-false-
  * negative guarantee means the combined verdicts equal the exact gate's.
  *
  * Everything is DataFrame/Column — no UDF, no sketch-library driver
  * object in the hot path. The filter is materialized as S rows of
  * (shard, array<long> bit words): build explodes each key into its k bit
  * positions (seeded xxhash64), groupBy (shard, word index) bit_or's the
  * masks (map-side combined — the shuffle carries at most S·words rows
  * regardless of corpus size), and one small aggregate assembles the word
  * arrays. Probe joins the S-row frame on the shard key — broadcast while
  * the filter fits ([[maxBroadcastBits]]), shuffled-hash above that so a
  * 100 TB-corpus filter never materializes on the driver — and tests the
  * k bits with element_at + shift arithmetic inside codegen.
  *
  * Sizing: bits/key ≈ 10 gives ~1% false positives at k=5 (standard
  * Bloom math, n·10 bits). `shards` bounds the per-row array so a
  * 100 TB-corpus filter (tens of GB of bits) never needs a single giant
  * array: each probe row touches exactly one shard's words. At that scale
  * the S-row frame is still data, not driver material — only the probe's
  * broadcast ships it.
  */
object Bloom {

  /** Bit positions of `key` (string) for hash seed `i` within a
    * `bitsPerShard`-bit shard: pmod(xxhash64(key, i), bits). Seeds > 0;
    * seed -1 is reserved for shard routing so position hashes and the
    * shard hash are independent. */
  private def bitPos(key: Column, i: Int, bitsPerShard: Long): Column =
    pmod(xxhash64(key, lit(i)), lit(bitsPerShard))

  private def shardOf(key: Column, shards: Int): Column =
    if (shards == 1) lit(0L) else pmod(xxhash64(key, lit(-1)), lit(shards))

  /** Words per shard at which the assembly stays cheap: the dense word
    * array is expanded by indexing an ArrayBasedMapData, whose lookup is
    * a LINEAR scan — words×lookup is QUADRATIC in words-per-shard (a 19.5k
    * -word shard measured ~50 s of pure assembly at sf10). Capping a shard
    * at 1024 words (65,536 bits) and scaling the SHARD COUNT instead keeps
    * assembly linear in total bits: shards × 1024 × O(≤1024). */
  val maxBitsPerShard: Long = 65536L

  /** Filter sizing for `nKeys` keys at `bitsPerKey` (10 ≈ 1% fp at k=5):
    * fixed 65,536-bit shards, however many it takes. */
  def sized(nKeys: Long, bitsPerKey: Int = 10): (Long, Int) =
    (maxBitsPerShard,
      math.max(1L, (nKeys * bitsPerKey + maxBitsPerShard - 1) / maxBitsPerShard).toInt)

  /** Build a sharded Bloom filter over `df`'s `keyCol`: returns S rows of
    * (__shard, __words: array<long>), each array `bitsPerShard/64` words.
    * `bitsPerShard` must be a multiple of 64 — and should stay at
    * [[maxBitsPerShard]] (use [[sized]]) so assembly never goes quadratic;
    * grow `shards` for bigger corpora, not the per-shard array. */
  def build(df: DataFrame, keyCol: String, bitsPerShard: Long, k: Int,
            shards: Int = 1): DataFrame = {
    require(bitsPerShard > 0 && bitsPerShard % 64 == 0,
      s"bitsPerShard must be a positive multiple of 64, got $bitsPerShard")
    require(k >= 1 && shards >= 1, "k and shards must be >= 1")
    val nWords = bitsPerShard / 64
    val key = col(keyCol)
    val positions = df
      .select(shardOf(key, shards).as("__shard"),
        explode(array((0 until k).map(i => bitPos(key, i, bitsPerShard)): _*))
          .as("__pos"))
      // word index / bit offset via shifts-and-masks (no fp division);
      // functions.shiftleft only takes a constant distance, so the
      // variable-distance mask goes through call_function
      .select(col("__shard"), shiftright(col("__pos"), 6).as("__w"),
        call_function("shiftleft", lit(1L),
          col("__pos").bitwiseAND(lit(63L)).cast("int")).as("__mask"))
      .groupBy("__shard", "__w").agg(bit_or(col("__mask")).as("__word"))
    positions
      .groupBy("__shard")
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__word"))))
        .as("__wm"))
      .select(col("__shard"),
        // try_element_at, not element_at: ANSI mode throws on a missing
        // map key, and most word slots of a sparse filter are unset
        transform(sequence(lit(0L), lit(nWords - 1)),
          i => coalesce(try_element_at(col("__wm"), i), lit(0L))).as("__words"))
  }

  /** Filter size above which [[probe]] stops broadcasting: a broadcast
    * materializes the WHOLE filter on the driver and again on every
    * executor, so a 100 TB-corpus filter (tens of GB of bits — ~1B docs at
    * 10 bits/key is already 1.25 GB) would kill the driver at exactly the
    * corpus scale the tier exists for. 2^28 bits = 32 MiB of words (~26M
    * keys) still broadcasts comfortably; past that the S-row filter frame
    * is treated as DATA — the batch shuffles by `__shard` and equi-joins
    * it shuffled-hash (S is then ≥ 4096 shards, so the join key
    * distributes across partitions; the batch-side shuffle is the price of
    * not shipping tens of GB to every node, and it ships 16-byte hashes,
    * never documents). */
  val maxBroadcastBits: Long = 1L << 28

  /** Attach the filter to `df` and add `outCol` = might-contain verdict
    * for `keyCol`. Below `broadcastMaxBits` total filter bits the S-row
    * filter frame joins broadcast on the shard key (S=1 collapses to a
    * single-row attach — the map-only fast path); above it the join runs
    * shuffled-hash with the filter as build side (see [[maxBroadcastBits]]).
    * Either way the verdict is k element_at + shift + bit-test steps, all
    * codegen'd. */
  def probe(df: DataFrame, filter: DataFrame, keyCol: String,
            bitsPerShard: Long, k: Int, shards: Int = 1,
            outCol: String = "__might_contain",
            broadcastMaxBits: Long = maxBroadcastBits): DataFrame = {
    val key = col(keyCol)
    val tests = (0 until k).map { i =>
      val pos = bitPos(key, i, bitsPerShard)
      val word = element_at(col("__words"),
        (shiftright(pos, 6) + 1).cast("int")) // element_at is 1-based
      (call_function("shiftright", word,
        pos.bitwiseAND(lit(63L)).cast("int")).bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)
    require(bitsPerShard > 0 && shards > 0,
      s"bitsPerShard and shards must be positive, got $bitsPerShard/$shards")
    // division form: bitsPerShard * shards can overflow Long for absurd
    // (but caller-reachable) sizes, and an overflowed product would
    // silently pick broadcast for a filter far too big to broadcast
    val filterSide =
      if (bitsPerShard <= broadcastMaxBits / shards) broadcast(filter)
      // explicit shuffle_hash hint: stats on a small test frame would
      // otherwise let the planner broadcast anyway, and a sort-merge join
      // would pay a pointless sort on both sides for a pure hash probe
      else filter.hint("shuffle_hash")
    df.withColumn("__shard", shardOf(key, shards))
      .join(filterSide, Seq("__shard"), "left")
      .withColumn(outCol,
        // an empty corpus builds an empty filter frame: no __words row
        // means no bits set — definitely not contained
        when(col("__words").isNull, lit(false)).otherwise(tests))
      .drop("__shard", "__words")
  }

  /** The D15 novelty gate behind a Bloom pre-filter: verdict-identical to
    * [[Dedup.novelDocs]] (no false negatives ⇒ nothing novel is lost;
    * bloom false positives are caught by the exact verify), but the
    * definitely-novel majority never joins the corpus — it flows scan →
    * hash → k bit tests → out, map-only. Only bloom positives (true dups
    * + ~1% fp) pay the anti-join, whose left side is now a sliver. */
  def novelDocsBloom(fresh: DataFrame, corpus: DataFrame, contentCol: String,
                     idCol: String, bitsPerShard: Long = 0L, k: Int = 5,
                     shards: Int = 0): DataFrame = {
    // the hash projection feeds the build, the positive verify, and (when
    // auto-sizing) a count — persist it once, released by the shared
    // Dedup.unpersistIntermediates discipline
    val seen = Dedup.persistTracked(
      corpus.select(md5(col(contentCol)).as("__h")).distinct())
    // auto-size (bitsPerShard/shards = 0): one counting pass over the
    // hash projection per refresh — trivially amortized, and it keeps the
    // per-shard array inside the linear-assembly cap as the corpus grows
    val (bps, s) =
      if (bitsPerShard > 0 && shards > 0) (bitsPerShard, shards)
      else sized(seen.count())
    val filter = build(seen, "__h", bps, k, s)
    // same batch-self-dedup as the exact gate, then hash once
    val batch = Dedup.exactByHash(fresh, contentCol, idCol)
      .withColumn("__h", md5(col(contentCol)))
    val probed = probe(batch, filter, "__h", bps, k, s)
    val definitelyNovel = probed.filter(!col("__might_contain"))
    // verify the positive sliver with the join FLIPPED: semi-join the
    // corpus projection against the tiny broadcast positive-hash set, so
    // the big side streams map-only (no corpus shuffle per batch — the
    // structural point of the tier); `matched` is ≤ |positives| rows and
    // broadcasts back for the final anti
    val positives = probed.filter(col("__might_contain"))
    val matched = seen.join(
      broadcast(positives.select("__h").distinct()), Seq("__h"), "left_semi")
    val falsePositives = positives.join(broadcast(matched), Seq("__h"), "left_anti")
    definitelyNovel.unionByName(falsePositives)
      .drop("__might_contain", "__h")
  }
}
