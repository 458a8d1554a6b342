package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental boilerplate scrub — the frequency-delta form of
  * [[Dedup.spanScrub]], extending the [[Incremental]] loop to the stage
  * whose state is not per-document: a window's scrub verdict depends on
  * its CORPUS-WIDE occurrence count, so adding or removing one document
  * can change the scrub output of documents nobody touched (a window at
  * df = minDf−1 crossing up cuts text from every holder; a window at
  * minDf crossing down restores it). A per-doc ledger cannot see that;
  * the carried state here is
  *
  *   - `wins`: the window POSTING INDEX (id, start, whash) — which doc
  *     holds which window where; O(corpus tokens) rows but 20 B each,
  *     and only ever scanned MAP-ONLY via broadcast probes;
  *   - `df`:   the per-window-hash occurrence count (whash, df) —
  *     the frequency table the threshold reads;
  *   - `scrubbed`: the scrub output lake (id, scrubbed_text, n_tokens,
  *     n_removed) — the thing downstream consumes.
  *
  * One refresh ([[refresh]]):
  *   1. window the DELTA text only; read removed/changed docs' old
  *      windows off the posting index (map-only semi probe — their text
  *      is gone, the index is what remembers it);
  *   2. net the two into per-hash adjustments (delta-bound), fold into
  *      the frequency table with a broadcast join (map-only scan), and
  *      read off the CROSSED hashes — those whose qualifying verdict
  *      (df ≥ minDf) flipped in either direction;
  *   3. affected docs = holders of crossed windows (posting-index probe)
  *      ∪ surviving delta docs; everyone else's scrub row passes through
  *      VERBATIM;
  *   4. re-scrub only the affected docs: unchanged docs' windows come
  *      from the index (never re-tokenized), delta docs' from step 1,
  *      qualifying verdicts from the updated frequency table restricted
  *      to the affected hash set, and the rebuild is the exact
  *      [[Dedup.scrubFromStarts]] fold the batch form uses.
  *
  * Scale shape per refresh: text work O(|delta|); state scans map-only;
  * shuffles delta-bound (the adjustment aggregate, the per-affected-doc
  * start lists); rework bounded by |delta| + |holders of crossed
  * windows| — the latter is the honest cost of a boilerplate string
  * crossing the threshold, and exactly the set of docs whose output
  * actually changes. Output equality with the batch rebuild is the
  * gate (`incremental_scrub`) and the spec.
  */
object IncrementalScrub {

  /** Carried state: posting index, frequency table, scrub output lake. */
  case class State(wins: DataFrame, df: DataFrame, scrubbed: DataFrame)

  /** Stride-1 windows of `docs` — identical derivation to
    * [[Dedup.spanScrub]]'s (same sequence bound, same 0-based starts,
    * same xxhash64 of the space-joined slice): (id, start, whash). */
  private def windowsOf(docs: DataFrame, window: Int): DataFrame =
    docs
      .select(col("id"), split(trim(col("__text")), "\\s+").as("__toks"))
      .select(col("id"),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("__toks")) - (window - 1), lit(1))),
          st => xxhash64(array_join(slice(col("__toks"), st, lit(window)), " ")))))
      .select(col("id"), col("pos").as("start"), col("col").as("whash"))

  /** Bootstrap the state from a full corpus — the batch pass a lake runs
    * once, then refreshes forever. The scrub output is derived off the
    * SAME window index the state carries (one tokenize+window pass, not
    * [[Dedup.spanScrub]]'s second one); the spec pins that the result is
    * identical to the standalone batch form. */
  def state(docs: DataFrame, idCol: String, textCol: String,
            window: Int = 8, minDf: Int = 2): State = {
    val c = docs.select(col(idCol).as("id"), col(textCol).as("__text"))
    val wins = Dedup.persistTracked(windowsOf(c, window))
    val dfState = wins.groupBy("whash").agg(count(lit(1)).as("df"))
    val repStarts = wins
      .join(dfState.filter(col("df") >= minDf).select("whash"),
        Seq("whash"), "left_semi")
      .groupBy("id")
      .agg(sort_array(collect_list(col("start"))).as("__rep_starts"))
    val src = c
      .select(col("id").as("__id"),
        split(trim(col("__text")), "\\s+").as("__toks"))
      .join(repStarts.withColumnRenamed("id", "__id"), Seq("__id"), "left")
      .withColumn("__rep_starts",
        coalesce(col("__rep_starts"), array().cast("array<int>")))
    State(wins, dfState, Dedup.scrubFromStarts(src, "id", window))
  }

  /** The delta-bound pieces of one refresh, alongside the assembled full
    * state frames: what a PARTITIONED state lake needs to rewrite only
    * the directories a wave touches ([[graft.streaming.ScrubStream]]) —
    * `dIds` names the posting-index/scrub shards to rework,
    * `newDeltaWins` and `rescrubbed` are their replacement rows,
    * `dfTouched`/`dfUpdated` the frequency-table rows that change
    * (everything delta-bound; the unchanged state mass never
    * materializes through these). `state` is exactly [[refresh]]'s
    * output. */
  case class RefreshParts(dIds: DataFrame, newDeltaWins: DataFrame,
                          dfTouched: DataFrame, dfUpdated: DataFrame,
                          gone: DataFrame, rescrubbed: DataFrame,
                          state: State)

  /** One refresh: the new state, with `scrubbed` provably equal to the
    * batch `spanScrub(curr)`. `delta` is the [[Snapshot.diff]] of the two
    * corpus versions. */
  def refresh(prev: State, curr: DataFrame, delta: DataFrame,
              idCol: String, textCol: String,
              window: Int = 8, minDf: Int = 2): State =
    refreshParts(prev, curr, delta, idCol, textCol, window, minDf).state

  /** [[refresh]] with its delta-bound parts exposed (see
    * [[RefreshParts]]); the full-frame `state` member is byte-identical
    * to what [[refresh]] returns. */
  def refreshParts(prev: State, curr: DataFrame, delta: DataFrame,
                   idCol: String, textCol: String,
                   window: Int = 8, minDf: Int = 2): RefreshParts = {
    val c = curr.select(col(idCol).as("id"), col(textCol).as("__text"))
    // delta-bound state frames are eagerly localCheckpoint'd, not
    // persist'd: each layer broadcasts the previous layers into multiple
    // consumers, and a cache-only cut leaves the logical tree duplicating
    // the upstream DAG per consumer — the driver then pays optimizer +
    // plan-stringification passes over the blown-up tree on every action
    // (see Incremental.plan for the measured pathology). The posting
    // index (prev.wins) stays persist-only: it is O(corpus tokens) and
    // its lineage is one window pass, not a layered delta DAG.
    def pin(df: DataFrame): DataFrame = df.localCheckpoint()
    val dIds = pin(delta.select(col(idCol).as("id")))

    // 1. delta windows: new text windowed fresh, old text read off the
    //    posting index (map-only probe — the index is what remembers
    //    removed/changed docs' windows)
    val newDeltaWins = pin(
      windowsOf(c.join(broadcast(dIds), Seq("id"), "left_semi"), window))
    val oldDeltaWins = prev.wins.join(broadcast(dIds), Seq("id"), "left_semi")

    // 2. per-hash net adjustment (delta-bound), folded into the frequency
    //    table with a broadcast join; crossed = qualifying verdict flipped
    val adj = pin(
      newDeltaWins.groupBy("whash").agg(count(lit(1)).as("__a"))
        .join(oldDeltaWins.groupBy("whash").agg(count(lit(1)).as("__r")),
          Seq("whash"), "full_outer")
        .select(col("whash"),
          (coalesce(col("__a"), lit(0L)) - coalesce(col("__r"), lit(0L)))
            .as("adj"))
        .filter(col("adj") =!= 0L))
    val merged = prev.df.join(broadcast(adj), Seq("whash"), "left")
      .select(col("whash"), col("df"),
        (col("df") + coalesce(col("adj"), lit(0L))).as("__ndf"),
        col("adj").isNotNull.as("__hit"))
    // hashes in adj but absent from the table are NEW (old df = 0); a
    // hash only in oldDeltaWins is by invariant already in the table
    val matched = merged.filter(col("__hit")).select("whash") // delta-bound
    val newOnly = adj.join(broadcast(matched), Seq("whash"), "left_anti")
    val newDfState = merged.filter(col("__ndf") > 0)
      .select(col("whash"), col("__ndf").as("df"))
      .unionByName(newOnly.select(col("whash"), col("adj").as("df")))
    val crossed = pin(
      merged.filter(col("__hit") &&
          ((col("df") >= minDf) =!= (col("__ndf") >= minDf)))
        .select("whash")
        .unionByName(newOnly.filter(col("adj") >= minDf).select("whash")))

    // 3. affected docs: holders of crossed windows (index probe) plus the
    //    surviving delta docs; removed docs are in dIds and excluded
    val affectedUnchanged = pin(
      prev.wins.join(broadcast(crossed), Seq("whash"), "left_semi")
        .select("id").distinct()
        .join(broadcast(dIds), Seq("id"), "left_anti"))
    // ALL surviving delta ids, not just those that produced windows: a
    // null-text doc explodes to zero window rows but the batch form
    // still emits its scrub row
    val affectedIds = pin(
      affectedUnchanged
        .unionByName(c.join(broadcast(dIds), Seq("id"), "left_semi")
          .select("id"))
        .distinct())

    // 4. re-scrub the affected docs only: windows from the index (never
    //    re-tokenized) or the delta pass; qualifying verdicts from the
    //    updated table restricted to the affected hash set
    val affWins = prev.wins
      .join(broadcast(affectedUnchanged), Seq("id"), "left_semi")
      .unionByName(newDeltaWins)
    val affHashes = affWins.select("whash").distinct()
    val qual = prev.df
      .join(broadcast(affHashes), Seq("whash"), "left_semi")
      .join(broadcast(adj), Seq("whash"), "left")
      .select(col("whash"),
        (col("df") + coalesce(col("adj"), lit(0L))).as("__ndf"))
      .unionByName(newOnly.join(broadcast(affHashes), Seq("whash"), "left_semi")
        .select(col("whash"), col("adj").as("__ndf")))
      .filter(col("__ndf") >= minDf)
      .select("whash")
    val repStarts = affWins.join(broadcast(qual), Seq("whash"), "left_semi")
      .groupBy("id")
      .agg(sort_array(collect_list(col("start"))).as("__rep_starts"))
    val affSrc = c.join(broadcast(affectedIds), Seq("id"), "left_semi")
      .select(col("id").as("__id"),
        split(trim(col("__text")), "\\s+").as("__toks"))
      .join(repStarts.withColumnRenamed("id", "__id"), Seq("__id"), "left")
      .withColumn("__rep_starts",
        coalesce(col("__rep_starts"), array().cast("array<int>")))
    val rescrubbed = Dedup.scrubFromStarts(affSrc, "id", window)

    // assemble: verbatim passthrough for everyone else, fresh state
    val gone = dIds.unionByName(affectedIds).distinct()
    // the frequency-table rows that actually change: adj hashes that
    // remain (new df value) — dfTouched minus these are the hashes whose
    // row disappears (df fell to 0)
    val dfUpdated = merged.filter(col("__hit") && col("__ndf") > 0)
      .select(col("whash"), col("__ndf").as("df"))
      .unionByName(newOnly.select(col("whash"), col("adj").as("df")))
    RefreshParts(dIds, newDeltaWins,
      adj.select("whash"), dfUpdated, gone, rescrubbed,
      State(
        prev.wins.join(broadcast(dIds), Seq("id"), "left_anti")
          .unionByName(newDeltaWins),
        newDfState,
        prev.scrubbed.join(broadcast(gone), Seq("id"), "left_anti")
          .unionByName(rescrubbed)))
  }
}
