package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.ml.FatalityModel
import graft.operators._
import graft.sources.{Jsonl, Sink, Tables}
import graft.streaming.{EventStream, IncrementalStream}

/** Driver contract: one `queries` entry per implemented operator from
  * SURVEY.md §2, with matching DuckDB `oracleSql` where the semantics are
  * ANSI-SQL-expressible. Column names/aliases are kept identical on both
  * sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on sf0.001: the reference's headline report rollup
    * (daily activity trend, report.py:62). */
  def entry(spark: SparkSession): DataFrame =
    Analytics.dailyCounts(Tables.events(spark, "/root/testdata/sf0.001"))

  /** Session-scoped memo for trained driver-side artifacts: entries are
    * evicted when the owning session's SparkContext ends, so stopped
    * sessions (and the models keyed by them) are not retained for the
    * JVM lifetime. One listener per live session, self-removing. */
  private final class SessionMemo[K, V] {
    private val entries =
      scala.collection.concurrent.TrieMap.empty[(SparkSession, K), V]
    private val hooked =
      scala.collection.concurrent.TrieMap.empty[SparkSession, Unit]
    def getOrElseUpdate(s: SparkSession, k: K)(v: => V): V = {
      hooked.getOrElseUpdate(s, {
        s.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
                : Unit = {
              entries.keysIterator.filter(_._1 eq s).toList
                .foreach(entries.remove)
              hooked.remove(s): Unit
            }
          })
      })
      entries.getOrElseUpdate((s, k), v)
    }
    def clear(s: SparkSession): Unit =
      entries.keysIterator.filter(_._1 eq s).toList.foreach(entries.remove)
  }

  /** Drop every memoized trained artifact (GBT fit, BPE merges, DSIR
    * ratio table, quality weights) for `s`. Bench hook: BenchOne's fresh
    * mode calls this per iteration so a family's first member can be
    * pinned BUILD-INCLUSIVE — the cost it actually bills inside the full
    * sorted bench run, where the alphabetically-first sibling pays the
    * one-time build and the rest score against the memo. */
  def clearSessionMemos(s: SparkSession): Unit = {
    modelCache.clear(s); bpeMergeCache.clear(s)
    dsirRatioCache.clear(s); qualityWeightsCache.clear(s)
  }

  /** One GBT training per (session, dir): `fatality_model` and
    * `prediction_perf` share a single fit instead of each paying a full
    * training pass (the predictions frame is cached inside the result). */
  private val modelCache = new SessionMemo[String, FatalityModel.ModelResult]
  private def trainedModel(s: SparkSession, d: String): FatalityModel.ModelResult =
    modelCache.getOrElseUpdate(s, d) {
      val r = FatalityModel.trainAndEvaluate(Tables.events(s, d))
      r.copy(predictions = r.predictions.cache())
    }

  /** One BPE merge-table training per (session, dir, numMerges): training
    * is a full-corpus explode+groupBy+collect pass, and four registered
    * queries (bpe_merges, bpe_token_count, bpe_encode, packed_token_stream)
    * need the SAME deterministic table — each paying an independent train
    * pass is a corpus scan apiece at scale. Same memo discipline as the
    * GBT fit above; the cached value is the skinny driver-side merge list
    * (≤ numMerges pairs), not a Spark cache. */
  private val bpeMergeCache = new SessionMemo[(String, Int), Seq[(String, String)]]
  private def trainedMerges(s: SparkSession, d: String, numMerges: Int): Seq[(String, String)] =
    bpeMergeCache.getOrElseUpdate(s, (d, numMerges))(
      Bpe.train(Tables.documents(s, d), "text", numMerges))

  /** One DSIR ratio-table estimation per (session, dir): the model is a
    * dense 1024-row (bucket, logratio) list — skinny driver data, the
    * Bpe.train memo discipline — and three registered queries score
    * against the SAME model; each estimating independently would pay an
    * extra corpus feature pass apiece. Also the production shape:
    * estimate once on a snapshot, score every batch after. */
  private val dsirRatioCache = new SessionMemo[String, Seq[(Long, Double)]]
  private def dsirRatio(s: SparkSession, d: String): Seq[(Long, Double)] =
    dsirRatioCache.getOrElseUpdate(s, d)(
      graft.operators.Dsir.ratioTable(Tables.documents(s, d),
        length(col("source")) === 4, "doc_id", "text"))

  /** One quality-classifier training per (session, dir): the trainer is a
    * TakeOrdered corpus pass + 400 driver-side GD iterations, and both
    * registered queries (quality_classifier, quality_classifier_weights)
    * need the SAME deterministic weights — the memo discipline above. */
  private val qualityWeightsCache = new SessionMemo[String, QualityModel.Weights]
  private def qualityWeights(s: SparkSession, d: String): QualityModel.Weights =
    qualityWeightsCache.getOrElseUpdate(s, d)(
      QualityModel.train(Tables.documents(s, d), "doc_id", "text"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §A core relational engine -----------------------------------
    "q1_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          avg("l_quantity").as("avg_qty"),
          avg("l_extendedprice").as("avg_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    "q2_top_events" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("event_type").asc)
        .limit(3)
    }),
    "q3_join_agg" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      // orders⋈lineitem shuffle on orderkey; customer side broadcast at
      // dim scale (AQE handles it when the stats say so).
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          countDistinct("o_orderkey").as("n_orders"),
          // round: double sums are accumulation-order-dependent; rounding to
          // cents makes the result engine-portable (Spark vs DuckDB oracle).
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),
    "q4_multi_join" -> ((s, d) => {
      // Star join: fact orders against broadcast dims — no shuffle on the
      // dim side at any scale.
      val r = broadcast(Tables.region(s, d))
      val n = broadcast(Tables.nation(s, d))
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("total_price"))
    }),
    "q5_window_rank" -> ((s, d) =>
      Analytics.topPerGroup(
        Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
        "o_custkey", "o_totalprice", "o_orderkey")),
    "q7_part_supplier" -> ((s, d) => {
      // Fact-to-two-dims star: lineitem against broadcast part + supplier
      // (closes coverage of the last two testdata tables). Revenue rounded
      // for engine-portable hashing, as in q3.
      val l = Tables.lineitem(s, d)
      val p = broadcast(Tables.part(s, d))
      val su = broadcast(Tables.supplier(s, d))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          countDistinct("s_suppkey").as("n_suppliers"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),
    "q6_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    }),

    // ---- §B ACLED-pipeline analytics ---------------------------------
    "daily_counts" -> ((s, d) => Analytics.dailyCounts(Tables.events(s, d))),
    "event_type_dist" -> ((s, d) =>
      Analytics.distributionWithPct(Tables.events(s, d), "event_type")),
    "regional_agg" -> ((s, d) =>
      Analytics.groupedStats(Tables.events(s, d), pmod(col("user_id"), lit(10L)), "cohort", "value")),
    "weekly_agg" -> ((s, d) =>
      Analytics.timeBucketStats(Tables.events(s, d), "week")),
    "monthly_trends" -> ((s, d) =>
      Analytics.timeBucketStats(Tables.events(s, d), "month")),
    "rolling_7d" -> ((s, d) => Analytics.rolling7d(Tables.events(s, d))),
    "report_window_7d" -> ((s, d) =>
      // ReportConfig(start, end) applied under the daily rollup
      // (report.py:37-43). eventsWindowed bounds the RAW nanos column, so
      // the predicate reaches the parquet scan (row-group pruning) instead
      // of filtering after the µs conversion.
      Analytics.dailyCounts(
        Tables.eventsWindowed(s, d, "2024-01-10", "2024-01-17"))),
    "report_window_30d" -> ((s, d) =>
      Analytics.timeBucketStats(
        Tables.eventsWindowed(s, d, "2024-01-01", "2024-01-31"), "week")),
    "regional_multi_agg" -> ((s, d) =>
      // Full ukraine_region_query shape (report.py:96-110): count + sum +
      // avg(value) + per-region means of two extra measures (the lat/lon
      // centroid analogue) in one aggregate pass.
      Analytics.groupedStatsMulti(
        Tables.events(s, d)
          .withColumn("prop_k", get_json_object(col("props"), "$.k").cast("double")),
        pmod(col("user_id"), lit(10L)), "cohort", "value",
        Seq(col("prop_k") -> "avg_prop", col("user_id").cast("double") -> "avg_user"))),
    "top_high_value" -> ((s, d) =>
      Analytics.topNByValue(Tables.events(s, d), 20, 30.0)),
    "value_buckets" -> ((s, d) => Analytics.valueBuckets(Tables.events(s, d))),
    "completeness_profile" -> ((s, d) =>
      Quality.completenessProfile(Tables.documents(s, d), Seq("text", "lang", "source"))),
    "range_validation" -> ((s, d) =>
      Quality.rangeValidation(Tables.events(s, d), "value", 0.0, 50.0)),
    "domain_validation" -> ((s, d) =>
      Quality.domainValidation(Tables.events(s, d), "event_type",
        Seq("click", "view", "purchase", "signup"))),
    "dup_check" -> ((s, d) =>
      Quality.duplicateGroups(
        Tables.events(s, d).withColumn("day", to_date(col("ts"))),
        Seq("user_id", "event_type", "day"))),
    "upsert_latest" -> ((s, d) =>
      Dedup.latestWins(Tables.events(s, d), Seq("user_id", "event_type"), "ts", "event_id")
        .select("user_id", "event_type", "event_id", "value")),
    "typed_ingest" -> ((s, d) => Ingest.typedEvents(Tables.events(s, d))),
    "actor_presence" -> ((s, d) =>
      Quality.presenceCounts(Tables.events(s, d), Seq("event_type", "props"))),
    "value_validation" -> ((s, d) =>
      Quality.valueValidation(Tables.events(s, d), "value")),
    "schema_validation" -> ((s, d) =>
      // Contract check against the expected events schema (plus one
      // deliberately absent column). Pure schema inspection; the oracle is
      // the golden VALUES table — the gate pins the contract itself.
      Quality.schemaValidation(Tables.events(s, d), Seq(
        "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
        "event_type" -> "string", "value" -> "double", "props" -> "string",
        "not_a_column" -> "string"))),
    "quarantine_stats" -> ((s, d) =>
      // Validation-gate rollup: per-rule violation counters in one pass
      // (the reference's blocking/non-blocking check split, base_checks.py).
      Quality.quarantineStats(Tables.events(s, d), Seq(
        "neg_value" -> (col("value") >= 0),
        "extreme_value" -> (col("value") <= 50),
        "bad_type" -> col("event_type").isin("click", "view", "purchase", "signup")))),
    "region_fanout" -> ((s, d) =>
      // Per-region event-type distribution (country_assets.py:88 builds a
      // value_counts per region asset) — Spark-first this is ONE two-level
      // aggregate with a per-region pct window, not N per-region jobs.
      Tables.events(s, d)
        .groupBy(pmod(col("user_id"), lit(10L)).as("region"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("pct", round(col("cnt") * 100.0 /
          sum("cnt").over(org.apache.spark.sql.expressions.Window.partitionBy("region")), 2))),
    "partition_date_check" -> ((s, d) =>
      // Partition-integrity gate (acled_checks.py:195, blocking): every
      // event date must equal its partition's date. The partition here is
      // assigned the way the bug actually happens in a backfill — by
      // *processing* time (event time shifted one hour) — so rows landing
      // in the first hour of each day fall into the previous day's
      // partition and the check has real violations to surface. The
      // assignment is a pure function of ts, so DuckDB replays it exactly.
      Quality.partitionDateCheck(
        Tables.events(s, d)
          .withColumn("partition_date",
            to_date(col("ts") - expr("INTERVAL 1 HOUR"))),
        "partition_date")),
    "report_bundle" -> ((s, d) =>
      // The composed monthly report (ml.py:775-890): quality + daily +
      // event-type + region + weekly sections as ONE grouping-sets pass
      // over one bounded scan — the relational twin of corpus_pipeline —
      // plus the actor-presence counters folded into every row's
      // aggregate (actor_query) and the top-20 high-value event rows
      // unioned as the top_events section (high_fatality_events_query,
      // value >= 10 desc, id-asc tie-break): all eight report sections.
      Analytics.reportBundle(
        Tables.eventsWindowed(s, d, "2024-01-01", "2024-01-31"),
        pmod(col("user_id"), lit(10L)),
        Seq(get_json_object(col("props"), "$.k").cast("double") -> "avg_prop",
            col("user_id").cast("double") -> "avg_user"),
        topN = 20, topMin = 10.0)),
    "report_heatmap" -> ((s, d) =>
      // The heatmap artifact (report.py:553-624 acled_ua_heatmap +
      // io_manager.py:127 ReportsS3IOManager): bounded-window region
      // counts → PNG render → publish to the artifact path → decode the
      // PUBLISHED bytes back. The oracle recomputes counts AND the
      // integer shade per region and asserts shade = decoded_shade, so
      // the whole render/publish/read chain is inside the gate.
      Report.heatmapArtifact(s,
        Tables.eventsWindowed(s, d, "2024-01-08", "2024-01-15"),
        sinkPath(d, "heatmap") + "/region_heatmap.png")),
    "salted_agg" -> ((s, d) =>
      // Same stats as a direct groupBy (the oracle is the direct form) but
      // computed via the two-phase salted plan — the skew-safe variant for
      // hot keys (a few event types dominate ACLED-shaped feeds).
      // salt on the stable unique id: one cheap hash per row, perfect
      // spread even for duplicate-heavy feeds (vs whole-row hashing)
      Skew.saltedStats(Tables.events(s, d), col("event_type"), "event_type", "value",
        saltOn = Seq(col("event_id")))),

    "sql_api" -> ((s, d) => {
      // The SQL front door: tables published as views, the query is the
      // SAME text the DuckDB oracle runs — busiest 3 days per event type.
      GraftExtensions.registerTables(s, d)
      s.sql(SqlApiQuery)
    }),
    "range_join" -> ((s, d) => {
      // Interval enrichment as a grid equi-join (RangeJoin): events.value
      // against 20 overlapping value bands. The oracle runs the plain
      // BETWEEN theta-join — results must agree exactly.
      val bands = s.range(0, 20).select(
        col("id").as("band_id"),
        (col("id") * 2.5).as("lo"),
        (col("id") * 2.5 + 5.0).as("hi"))
      RangeJoin.rangeJoin(Tables.events(s, d).select("event_id", "value"),
          "value", bands, "lo", "hi", grid = 2.5)
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("band_value"))
    }),
    "sketch_profile" -> ((s, d) => {
      // HLL distinct + approximate percentiles per event type — the
      // constant-memory substitutes for nunique()/describe() at 100 TB.
      // The gate ALSO computes the exact statistics and emits each sketch
      // as a within-tolerance flag: DuckDB reproduces the exact columns
      // independently and pins every flag TRUE (|approx−exact| ≤ 3·rsd for
      // HLL, 5% relative for the percentile sketch) — the sketches are
      // verified against ground truth, not against themselves.
      val ev = Tables.events(s, d)
      val approx = Sketch.approxProfile(ev, col("event_type"), "event_type",
        "user_id", "value")
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("__xd"),
          percentile(col("value"), lit(0.5)).as("__x50"),
          percentile(col("value"), lit(0.95)).as("__x95"),
          percentile(col("value"), lit(0.99)).as("__x99"))
      def band(approxC: Column, exactC: Column): Column =
        abs(approxC - exactC) <= greatest(abs(exactC) * 0.05, lit(0.01))
      approx.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_rows"),
          col("__xd").as("exact_distinct"),
          (abs(col("approx_distinct") - col("__xd")) <= col("__xd") * (3 * 0.02))
            .as("distinct_ok"),
          round(col("__x50"), 4).as("p50"), band(col("p50"), col("__x50")).as("p50_ok"),
          round(col("__x95"), 4).as("p95"), band(col("p95"), col("__x95")).as("p95_ok"),
          round(col("__x99"), 4).as("p99"), band(col("p99"), col("__x99")).as("p99_ok"))
    }),
    "stratified_sample" -> ((s, d) => {
      // Reproducible hash-keyed class rebalancing: downsample dominant
      // types, keep rare ones whole. Deterministic (xxhash64 on the key),
      // so the per-stratum kept-counts are stable run to run — the oracle
      // pins them as GOLDEN rows (computed once on the gate corpus) plus
      // an in-query binomial sanity band: each stratum must land within
      // ±3σ of its target fraction (σ = sqrt(f(1-f)n); exact strata with
      // f=1.0 get σ=0, so the +1 slack only matters there).
      val fracs = Map("click" -> 0.1, "view" -> 0.5,
        "purchase" -> 1.0, "signup" -> 1.0)
      val ev = Tables.events(s, d)
      val totals = ev.groupBy("event_type").agg(count(lit(1)).as("__n"))
      val sampled = Sample.stratifiedHashSample(ev, col("event_type"),
          col("event_id"), fracs)
        .groupBy("event_type").agg(count(lit(1)).as("n_sampled"))
      val f = fracs.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
        when(col("event_type") === k, lit(v)).otherwise(acc) }
      sampled.join(totals, Seq("event_type"))
        .select(col("event_type"), col("n_sampled"),
          (abs(col("n_sampled") - f * col("__n")) <=
            lit(3.0) * sqrt(f * (lit(1.0) - f) * col("__n")) + lit(1.0))
            .as("frac_ok"))
    }),
    "asof_join" -> ((s, d) => {
      // Point-in-time lookup: each click joined to the user's most recent
      // purchase at or before it. Purchases are pre-aggregated per
      // (user, ts) so the as-of payload is unique; single shuffle on
      // user_id, no range cross-join.
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("purchase_value"))
      AsOf.asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts", Seq("purchase_value"))
        .select(col("event_id"), col("asof_purchase_value"))
    }),

    // ---- §D LLM-data pipeline ----------------------------------------
    "exact_dedup" -> ((s, d) =>
      Dedup.exactByHash(Tables.documents(s, d), "text", "doc_id")
        .select("doc_id", "lang", "source", "n_chars")),
    "para_dedup" -> ((s, d) =>
      // Passage-granularity dedup: corpus-frequency-thresholded 8-token
      // windows; per-doc repeated-span mass + scrubbed text. The oracle is
      // a FULL DuckDB replay grouping the passage STRINGS (so the 64-bit
      // hash grouping is cross-checked against the semantic spec).
      Dedup.paraDedup(Tables.documents(s, d), "doc_id", "text")),
    "span_dedup" -> ((s, d) =>
      // Stride-1 repeated-span detection: every 8-token window counted
      // across the corpus, repeated windows coalesced into maximal spans
      // per doc (catches passages at arbitrary alignment that para_dedup's
      // fixed windows straddle). Full DuckDB replay: same windows, string-
      // grouped frequencies, lag-based span starts, position-union cover.
      Dedup.spanDedup(Tables.documents(s, d), "doc_id", "text")),
    "minhash_dedup" -> ((s, d) =>
      Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text", threshold = 0.5)),
    "simhash_dedup" -> ((s, d) =>
      Dedup.simhashNearDups(Tables.documents(s, d), "doc_id", "text", maxHamming = 8)),
    "minhash_guard_stats" -> ((s, d) =>
      // The hot-bucket guard's observability: bucket census + exactly what
      // a cap of 1 would drop at this corpus (cap 1 so the gate exercises
      // the capped/dropped counters — the corpus's organic near-dup band
      // collisions are its only multi-member buckets). Deterministic (the
      // banding chain is seeded), so the gate pins golden values; at
      // production corpora the same one-aggregate probe is what a
      // pipeline monitors for boilerplate-flood step changes.
      Dedup.minhashGuardStats(Tables.documents(s, d), "doc_id", "text",
        maxBucket = 1)),
    "minhash_planted_pairs" -> ((s, d) => {
      // End-to-end MinHash check with a KNOWN answer: plant exact copies of
      // docs 0..9 at id+1000000 — identical text ⇒ identical signature ⇒
      // same bands ⇒ candidate ⇒ Jaccard exactly 1.0. The corpus has no
      // organic exact dups (exact_dedup keeps all 500 rows), so the
      // (id, id+1000000) pairs are exactly the planted ones.
      val docs = Tables.documents(s, d)
      val planted = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.minhashNearDups(
          docs.select("doc_id", "text").unionByName(planted),
          "doc_id", "text", threshold = 0.5)
        .filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }),
    "simhash_planted_pairs" -> ((s, d) => {
      // Same planted-recovery shape for SimHash: identical text ⇒ identical
      // 64-bit fingerprint ⇒ hamming 0 through band blocking + verify.
      val docs = Tables.documents(s, d)
      val planted = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.simhashNearDups(
          docs.select("doc_id", "text").unionByName(planted),
          "doc_id", "text", maxHamming = 8)
        .filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    }),
    "ngram_jaccard" -> ((s, d) =>
      // Block on a 16-bit SimHash band, not a metadata column: bucket count
      // grows with the corpus (|block|² stays bounded), while near-identical
      // docs still collide — the scale-safe blocking key.
      Dedup.ngramJaccardPairs(
        Tables.documents(s, d)
          .withColumn("simband", shiftrightunsigned(Dedup.simhash(col("text")), 48)),
        "doc_id", "text", "simband")),
    "ngram_jaccard_exact" -> ((s, d) =>
      // Oracle-checkable slice of the same operator: Jaccard over hashed
      // shingles equals Jaccard over the shingle strings themselves (the
      // hash is injective up to negligible collisions), and blocking on a
      // metadata column is a shape DuckDB can replay with list functions —
      // so every pair's similarity is verified end to end by a second
      // engine. The simband-blocked production form above stays the scale
      // path.
      Dedup.ngramJaccardPairs(
          Tables.documents(s, d).filter(col("doc_id") < 100),
          "doc_id", "text", "lang")
        .select(col("block"), col("id_a"), col("id_b"),
          round(col("jaccard"), 4).as("jaccard"))),
    "embedding_dedup" -> ((s, d) => {
      // Random vectors have no organic cos>0.8 pairs at this SF, so the query
      // plants deterministic jittered copies of the first 20 vectors — the
      // operator must recover exactly those near-dup pairs (verifiable, not
      // vacuous; a test compares against brute-force cosine).
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 20).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("float")
            - lit(500.0f)) / lit(100000.0f))).as("embedding"))
      // gate output is the recovered PAIRS (the verifiable property; the
      // golden VALUES oracle lists them) — cos itself is float math over
      // hash jitter no second engine reproduces; SimilaritySpec checks it
      // against brute force
      Similarity.nearDupPairs(emb.unionByName(planted), "vec_id", "embedding",
        dim = 64, nPlanes = 12, threshold = 0.8)
        .select("id_a", "id_b")
    }),
    "semantic_dedup" -> ((s, d) => {
      // SemDeDup-style cluster-blocked dedup: the same planted jittered
      // copies as embedding_dedup, but candidate blocking is the TRAINED
      // KMeans coarse quantizer instead of random hyperplanes — a
      // near-identical copy must land in its original's cluster (argmax
      // over the same centroids), so the golden pairs are recovered
      // through data-adaptive blocking. cos itself is float math over
      // hash jitter; the golden oracle pins the recovered pair ids.
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 20).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("float")
            - lit(500.0f)) / lit(100000.0f))).as("embedding"))
      Similarity.semanticDedupPairs(emb.unionByName(planted), "vec_id", "embedding",
          nlist = 16, threshold = 0.8)
        .select("id_a", "id_b")
    }),
    "cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
    }),
    "lsh_ann" -> ((s, d) => {
      // Recall gate with a KNOWN answer: three jittered near-copies of
      // each query are planted into the corpus (cos ≈ 0.9999 — the true
      // top-3 by construction, same trick as embedding_dedup), ground
      // truth is the oracle-green brute-force cosine_topk over the SAME
      // corpus, and the multi-probe LSH top-5 must hit ≥3 of 5 of it
      // (recall@5 ≥ 0.6 — the floor is asserted in-query; golden rows pin
      // the exact hit counts). Unstructured random vectors have no
      // locality for ANN to exploit, so the planted neighbors are what
      // "recall" verifiably means here.
      val (corpus, q) = plantedAnnCorpus(s, d)
      val ann = Similarity.lshTopK(corpus, q, "vec_id", "embedding",
        dim = 64, k = 5, nPlanes = 6, probeBits = 3)
      annRecall(Similarity.cosineTopK(corpus, q, "vec_id", "embedding", k = 5),
        ann, minHits = 3)
    }),
    "ivf_ann" -> ((s, d) => {
      // Same planted-recall gate for the IVF tier: a jittered copy lands
      // in its original's inverted list, so nprobe=4 of nlist=16 must
      // recover the planted true neighbors (floor recall@5 ≥ 0.6).
      val (corpus, q) = plantedAnnCorpus(s, d)
      val ann = Similarity.ivfTopK(corpus, q, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4)
      annRecall(Similarity.cosineTopK(corpus, q, "vec_id", "embedding", k = 5),
        ann, minHits = 3)
    }),
    "ivf_topk_broadcast" -> ((s, d) => {
      // Large-nlist IVF path parity, surfaced to the driver gate: the
      // broadcast-centroid variant must return EXACTLY the literal-matrix
      // variant's neighbors (SimilaritySpec proves it per-row; this pins
      // it in CORRECTNESS against golden counts).
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 8)
      val lit_ = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4).select("query_id", "vec_id", "rank")
      val bc = Similarity.ivfTopKBroadcast(emb, q, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4).select("query_id", "vec_id", "rank")
      bc.agg(count(lit(1)).as("n_rows")).crossJoin(
        bc.exceptAll(lit_).unionByName(lit_.exceptAll(bc))
          .agg(count(lit(1)).as("n_mismatch")))
    }),
    "ivf_ann_trained" -> ((s, d) => {
      // Production-quantizer tier: KMeans-fitted coarse centroids (MLlib,
      // hash-sampled fit), same literal-matrix probe machinery — now under
      // the same planted-neighbor recall gate as lsh_ann/ivf_ann: a
      // jittered copy quantizes to (almost surely) its original's list, so
      // the trained tier must recover the planted true neighbors too
      // (recall@5 ≥ 0.6 asserted in-query; golden hit counts pinned).
      val (corpus, q) = plantedAnnCorpus(s, d)
      val ann = Similarity.ivfTopKTrained(corpus, q, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4)
      annRecall(Similarity.cosineTopK(corpus, q, "vec_id", "embedding", k = 5),
        ann, minHits = 3)
    }),
    "ivf_pq_ann" -> ((s, d) => {
      // The memory-bound ANN tier under the same planted-neighbor recall
      // gate as lsh_ann/ivf_ann/ivf_ann_trained: vectors live as 8 one-
      // byte PQ codes (32× smaller than float32×64), search scores codes
      // via a per-(query, list) asymmetric-distance table, and a jittered
      // near-copy's codes collapse to the query's own argmin rows — so
      // the planted true neighbors must surface even through the coarse
      // 16-codeword-per-subspace quantizer (recall@5 ≥ 0.6 asserted
      // in-query; golden hit counts pinned).
      val (corpus, q) = plantedAnnCorpus(s, d)
      val ann = Similarity.ivfPqTopK(corpus, q, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4, m = 8, codebookSize = 16)
      annRecall(Similarity.cosineTopK(corpus, q, "vec_id", "embedding", k = 5),
        ann, minHits = 3)
    }),
    "ivf_pq_rerank" -> ((s, d) => {
      // Two-stage retrieval quality gate: ADC shortlists 50 from codes,
      // exact cosine re-ranks only the shortlist. Quantization error can
      // then only cost a candidate its shortlist spot, not its order —
      // recall must be >= the plain PQ gate's (golden hit counts pin it).
      val (corpus, q) = plantedAnnCorpus(s, d)
      val ann = Similarity.ivfPqTopKRerank(corpus, q, "vec_id", "embedding",
        k = 5, shortlist = 50, nlist = 16, nprobe = 4, m = 8, codebookSize = 16)
      annRecall(Similarity.cosineTopK(corpus, q, "vec_id", "embedding", k = 5),
        ann, minHits = 3)
    }),
    "ivf_opq_rerank" -> ((s, d) => {
      // OPQ tier: a seeded orthogonal rotation decorrelates coordinates
      // before PQ coding (Ge et al., CVPR 2013 — the FAISS OPQMatrix
      // init), then the same two-stage ADC-shortlist + exact-cosine
      // re-rank as ivf_pq_rerank. Rotation preserves inner products, so
      // the brute-force gate is unchanged; recall must hold through the
      // rotated codebooks (recall@5 ≥ 0.6 in-query; golden hit counts
      // pinned). This is the live caller of the VecOps.matvec kernel.
      val (corpus, q) = plantedAnnCorpus(s, d)
      val ann = Similarity.ivfOpqTopKRerank(corpus, q, "vec_id", "embedding",
        k = 5, dim = 64, shortlist = 50, nlist = 16, nprobe = 4, m = 8,
        codebookSize = 16)
      annRecall(Similarity.cosineTopK(corpus, q, "vec_id", "embedding", k = 5),
        ann, minHits = 3)
    }),
    "embedding_quantize" -> ((s, d) => {
      // int8 storage tier roundtrip: quantize → dequantize → cosine vs
      // original over a single scan (no self-join), rolled up to prove the
      // 4× compression keeps similarity structure. The scale (an O(dim)
      // array_max reduction) is hoisted behind a projection boundary:
      // higher-order transform() lambdas re-evaluate their whole body per
      // element, so scale inlined in the lambda is O(dim²) per row — the
      // hoist measured 3× on this gate. CollapseProject keeps the stages
      // apart because dscale is non-cheap and referenced twice.
      Tables.embeddings(s, d)
        .select(col("embedding"),
          (greatest(array_max(transform(col("embedding"), x => abs(x.cast("double")))),
            lit(1e-12)) / 127.0).as("dscale"))
        // qvec from the DOUBLE scale, dequantize through the stored FLOAT
        // scale — cast-for-cast what quantize()/dequantize() persist.
        .select(col("embedding"),
          col("dscale").cast("float").as("fscale"),
          transform(col("embedding"),
            x => round(x.cast("double") / col("dscale")).cast("tinyint")).as("qvec"))
        .select(col("embedding"),
          Similarity.dequantize(col("qvec"), col("fscale")).as("deq"))
        .select(Similarity.cosine(
          col("embedding"), col("deq"),
          Similarity.l2norm(col("embedding")), Similarity.l2norm(col("deq"))).as("cos"))
        .agg(count(lit(1)).as("n_vectors"),
          round(min("cos"), 4).as("worst_cosine"),
          round(avg("cos"), 4).as("avg_cosine"))
    }),
    "bpe_merges" -> ((s, d) => {
      // The trained byte-level BPE merge table itself, as rows: training
      // is deterministic (global word-freq dict, hash-capped sample,
      // lexicographic tie-break), so the gate pins the merges as golden
      // VALUES — the training half of the tokenizer-faithful token-count
      // story (bpe_token_count gates the application half). Symbols are
      // 2-hex-digit UTF-8 bytes, so the table is ASCII whatever the
      // corpus script.
      import s.implicits._
      trainedMerges(s, d, 16)
        .zipWithIndex
        .map { case ((a, b), r) => (r.toLong, s"$a $b") }
        .toDF("rank", "pair")
    }),
    "bpe_fertility" -> ((s, d) => {
      // Tokenizer FERTILITY per language — the standard tokenizer-eval
      // table (tokens/word and bytes/token by lang exposes a tokenizer
      // that fragments one language's text): per-lang sums of the native
      // kernel's BPE counts, whitespace words, and UTF-8 bytes, ratios
      // derived from the exact integer sums so both engines divide
      // identical doubles. Rides the memoized per-(session, dir) train;
      // one map-side-combined agg to O(|langs|) rows.
      val docs = Tables.documents(s, d)
      val merges = trainedMerges(s, d, 16)
      docs.select(col("lang"),
          Bpe.tokenCountCol(col("text"), merges).as("n_tok"),
          size(filter(split(col("text"), "\\s+"), w => w =!= ""))
            .cast("long").as("n_w"),
          octet_length(col("text")).cast("long").as("n_b"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_w")).as("n_words"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("n_b")).as("n_bytes"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
          col("n_bytes"),
          round(col("n_tokens") / when(col("n_words") =!= 0, col("n_words")), 4)
            .as("tokens_per_word"),
          round(col("n_bytes") / when(col("n_tokens") =!= 0, col("n_tokens")), 4)
            .as("bytes_per_token"))
    }),
    "bpe_token_count" -> ((s, d) => {
      // Tokenizer-faithful token counts: the 16-merge byte-level BPE
      // trained on this corpus, applied by the native kernel (merge table
      // as one plan literal). The corpus is augmented with PLANTED
      // non-ASCII docs (fr/de accents, CJK — built from \u escapes here
      // and chr() codepoints in the oracle, so no encoding channel can
      // skew either side) to prove counting is byte-faithful outside
      // [a-z]: every non-ASCII char counts as its UTF-8 bytes rather than
      // being stripped. The oracle replays APPLICATION in DuckDB — a
      // recursive first-occurrence-replace over comma-delimited
      // hex-byte-symbol strings with the same pinned merge table — so
      // both train (bpe_merges) and apply are second-engine-checked.
      import s.implicits._
      val docs = Tables.documents(s, d)
      val merges = trainedMerges(s, d, 16)
      val planted = Seq(
        (9000001L, "café déjà naïve entrée"),
        (9000002L, "über straße größer"),
        (9000003L, "模型 训练 数据"))
        .toDF("doc_id", "text")
      docs.select(col("doc_id"), col("text")).unionByName(planted)
        .select(col("doc_id"),
          Bpe.tokenCountCol(col("text"), merges).as("n_bpe_tokens"),
          size(filter(split(col("text"), "\\s+"), w => w =!= ""))
            .cast("long").as("n_words"))
    }),
    "bpe_encode" -> ((s, d) => {
      // The ENCODE half of the tokenizer story: actual token-ID sequences
      // (GPT-2 id convention — bytes 0-255, merge rank r mints 256+r),
      // not just counts. This is what a training-export writes; exploded
      // to (doc_id, pos, token_id) rows so the full sequence is
      // second-engine-checked: the oracle replays merge application per
      // distinct word (the bpe_token_count recursion), then maps final
      // symbols to ids (byte value, or 256+min producing rank) and
      // reassembles per-doc order. Same planted non-ASCII docs — CJK/
      // accented text must encode to its UTF-8 byte ids, not vanish.
      import s.implicits._
      val docs = Tables.documents(s, d)
      val merges = trainedMerges(s, d, 16)
      val planted = Seq(
        (9000001L, "café déjà naïve entrée"),
        (9000002L, "über straße größer"),
        (9000003L, "模型 训练 数据"))
        .toDF("doc_id", "text")
      docs.select(col("doc_id"), col("text")).unionByName(planted)
        .select(col("doc_id"),
          posexplode(Bpe.encodeCol(col("text"), merges)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
    }),
    "bpe_vocab" -> ((s, d) => {
      // The VOCABULARY artifact a tokenizer consumer ships beside the
      // merge table (the vocab.json half of the GPT-2 pair): one row per
      // mintable id — 0-255 the base bytes, 256+r for each merge rank
      // whose concatenation is a FIRST occurrence (a duplicate
      // concatenation never mints; encode resolves it to the min rank).
      // Derived deterministically from the trained merges, so the oracle
      // rebuilds it from the same pinned VALUES table bpe_merges gates.
      import s.implicits._
      val merges = trainedMerges(s, d, 16)
      val base = (0 until 256).map(b => (b.toLong, f"$b%02x"))
      val seen = scala.collection.mutable.HashSet.empty[String]
      val minted = merges.zipWithIndex.flatMap { case ((a, b), r) =>
        val sym = a + b
        if (seen.add(sym)) Some((256L + r, sym)) else None
      }
      (base ++ minted).toDF("token_id", "symbol_hex")
    }),
    "bpe_decode" -> ((s, d) => {
      // The DECODE half closing the tokenizer roundtrip: ids → UTF-8
      // bytes → text. encode keeps no end-of-word marker (documented
      // deviation), so the roundtrip contract is decode(encode(text)) ==
      // text with every \s+ run deleted, byte for byte — which is what
      // the oracle computes INDEPENDENTLY (regexp_replace over the raw
      // corpus, no BPE machinery at all): any byte lost or invented
      // anywhere in train→encode→decode breaks equality. Same planted
      // non-ASCII docs — multi-byte UTF-8 must survive the id roundtrip,
      // and the decoded CJK/accented STRINGS (not just ids) cross the
      // engine-vs-DuckDB hash compare.
      import s.implicits._
      val docs = Tables.documents(s, d)
      val merges = trainedMerges(s, d, 16)
      val planted = Seq(
        (9000001L, "café déjà naïve entrée"),
        (9000002L, "über straße größer"),
        (9000003L, "模型 训练 数据"))
        .toDF("doc_id", "text")
      docs.select(col("doc_id"), col("text")).unionByName(planted)
        .select(col("doc_id"),
          Bpe.decodeCol(Bpe.encodeCol(col("text"), merges), merges)
            .as("decoded"))
    }),
    "packed_token_stream" -> ((s, d) => {
      // The END-TO-END training last mile: documents → trained-BPE token
      // ids → greedy sequence packing (budget 512, 4 shards) → the packed
      // TOKEN STREAM (shard, seq_id, pos, token_id) a training job would
      // memory-map. Every stage is replayed in the oracle: encode via the
      // bpe_encode recursion, shard routing via md5-prefix arithmetic
      // (the replayable shardOn override), the greedy first-fit scan as a
      // row-by-row recursive CTE, and stream positions from the packing
      // offsets + per-doc token order. Scale shape: encode is map-only;
      // packing shuffles one skinny (id, n_tokens, shard) row per doc;
      // the stream rebuild pays one window over doc-level rows and one
      // broadcast-sized join back to the id arrays per shard — no stage
      // touches more than O(corpus tokens) rows once.
      packedStream(s, d)
    }),
    "packed_token_stream_eos" -> ((s, d) =>
      // D29 with document separators: every doc followed by the reserved
      // EOS id 272, packer budget charged one slot per doc — the stream
      // form a trainer actually memory-maps. The oracle extends the
      // recursive-CTE packer replay with the +1 overhead and the per-doc
      // separator rows.
      packedStreamEos(s, d)),
    "token_stream_export_eos" -> ((s, d) => {
      // the separator stream LANDED per shard (the F18 roundtrip gate):
      // the position-weighted checksum now also pins every EOS to its
      // slot — a dropped or shifted separator flips the manifest
      val path = sinkPath(d, "token_stream_eos")
      Sink.reset(path)
      Sink.exportTokenStream(s, packedStreamEos(s, d), path)
    }),
    "packed_stream_roundtrip" -> ((s, d) => {
      // The CONSUMER gate closing the train-data chain end to end: a
      // trainer's data loader reads the landed stream, cuts it at the
      // EOS separators, and feeds segments — so this query does exactly
      // that (encode → pack(+EOS) → export → READ BACK → split on id 272
      // → decode) and emits each rebuilt segment's decoded text. The
      // oracle computes the expected text INDEPENDENTLY of all BPE and
      // packing machinery (the D26b contract: whitespace-deleted raw
      // text) and the segment coordinates from the packer replay — any
      // token dropped, shifted, or invented anywhere in the chain breaks
      // a per-document string equality, not just a checksum. Scale
      // shape: the segment rebuild groups ≤ budget+docs tokens per
      // (shard, seq), the EOS-count window runs inside those bounded
      // groups, and decode is one native kernel call per segment.
      import org.apache.spark.sql.expressions.Window
      val eosId = 272
      val merges = trainedMerges(s, d, 16)
      val path = sinkPath(d, "token_stream_eos_rt")
      Sink.reset(path)
      Sink.exportTokenStream(s, packedStreamEos(s, d), path)
        .queryExecution.toRdd.count(): Unit // land the stream
      val landed = s.read.parquet(path)
      // seg_idx = separators seen strictly before this pos + 1; stream
      // order within a sequence IS doc-id order (the packer's window)
      val wSeen = Window.partitionBy("shard", "seq_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      landed
        .select(col("shard").cast("long").as("shard"), col("seq_id"),
          col("pos"), col("token_id"))
        .withColumn("seg_idx",
          coalesce(sum(when(col("token_id") === eosId, 1L)).over(wSeen),
            lit(0L)) + 1L)
        .filter(col("token_id") =!= eosId)
        .groupBy("shard", "seq_id", "seg_idx")
        .agg(sort_array(collect_list(struct(col("pos"), col("token_id"))))
          .as("pt"))
        .select(col("shard"), col("seq_id"), col("seg_idx"),
          size(col("pt")).cast("long").as("n_tokens"),
          Bpe.decodeCol(transform(col("pt"), p => p.getField("token_id")),
            merges).as("decoded"))
    }),
    "token_stream_export" -> ((s, d) => {
      // The last seam in the training-export chain closed (VERDICT r12
      // #7b): the D29 packed stream LANDED as one parquet file per shard
      // in stream order (Sink.exportTokenStream), manifest recomputed
      // from the WRITTEN tree with a position-weighted token checksum —
      // Σ (pos+1)·token_id mod 1e9+7 pins every token to its stream
      // position, so the gate proves the write→read roundtrip preserved
      // the exact stream a training job would memory-map. The oracle
      // replays the whole chain (encode → shard → greedy pack → stream
      // positions) and aggregates the same manifest per shard.
      val path = sinkPath(d, "token_stream")
      Sink.reset(path)
      Sink.exportTokenStream(s, packedStream(s, d), path)
    }),
    "lang_id" -> ((s, d) => TextOps.langId(Tables.documents(s, d), "doc_id", "text")),
    "lang_id_trained" -> ((s, d) =>
      // fastText-style trained language ID (Joulin et al. 2016): hashed
      // char 1/2/3-gram features, seed-trained softmax weights as 1e6-
      // scaled LONG plan literals — per-doc class scores are exact
      // integer sums, so the full DuckDB replay (features, buckets,
      // argmax, margin, routing) is float-order-proof. Map-only, no
      // shuffle, no UDF; the model never trains in-query (it is a
      // compiled-in constant — no memo, no first-query build billing).
      LangIdModel.scored(Tables.documents(s, d), "doc_id", "text")),
    "lang_id_model_check" -> ((s, d) =>
      // the trained model head as a golden gate (the bpe_merges
      // pattern): per-class nonzero count, weight sum, and position-
      // weighted checksum pinned against hardcoded values — trainer
      // drift (seed edit, GD change, hash change) flips this red even
      // though the scoring oracle interpolates the live weights
      LangIdModel.modelCheck(s)),
    "quality_score" -> ((s, d) =>
      TextOps.qualityScore(Tables.documents(s, d), "doc_id", "text")),
    "token_count" -> ((s, d) =>
      TextOps.tokenCounts(Tables.documents(s, d), "doc_id", "text")),
    "quality_classifier_weights" -> ((s, d) => {
      // The trained model itself as a golden gate (the bpe_merges
      // pattern): deterministic driver-side gradient descent on a capped
      // sample — real docs vs synthetic gibberish — must reproduce the
      // exact 6dp weights every run; a drift in feature extraction, the
      // negative generator, or the trainer flips the row red.
      import s.implicits._
      val w = qualityWeights(s, d)
      Seq((w.bias, w.w(0), w.w(1), w.w(2), w.w(3)))
        .toDF("bias", "w_len", "w_stop", "w_wordlen", "w_punct")
    }),
    "quality_classifier" -> ((s, d) => {
      // Model-based quality filtering (the CCNet/GPT-3 recipe): score
      // the whole corpus with the trained weights. Scoring is ONE
      // codegen'd projection — portable 4dp features, the weights as
      // five plan literals, rounded linear logit, keep verdict — and the
      // DuckDB oracle replays the entire pass with the pinned weights,
      // so Spark's training AND scoring must both land exactly.
      QualityModel.score(Tables.documents(s, d), "doc_id", "text",
        qualityWeights(s, d))
    }),
    "fingerprint" -> ((s, d) =>
      // Rolling polynomial + content-minhash fingerprints are fully
      // deterministic, so docs 0-9 gate against GOLDEN rows (xxhash64 has
      // no DuckDB mirror; the pinned values were computed once and any
      // tokenization/hash drift breaks the hash compare). TextOpsSpec
      // covers the full-corpus invariants.
      TextOps.fingerprint(
        Tables.documents(s, d).filter(col("doc_id") < 10), "doc_id", "text")),
    "tfidf_top_terms" -> ((s, d) =>
      TextOps.tfIdfTopTerms(Tables.documents(s, d), "doc_id", "text", topN = 3)),
    "ngram_lm_perplexity" -> ((s, d) =>
      // CCNet-style LM quality gate: bigram model (add-1 smoothing)
      // trained on the corpus, every doc scored for avg NLL + perplexity,
      // keep = NLL ≤ 6 nats. Map-only bigram build (zip_with, no window),
      // vocab-bounded model aggregations, one stream-to-model shuffle
      // join — the oracle replays the whole model + scoring in SQL.
      NgramLm.score(Tables.documents(s, d), "doc_id", "text")),
    "ngram_lm_cross_score" -> ((s, d) => {
      // the actual CCNet setup: LM trained on the trusted slice
      // (single-digit sources src0-src9), the WHOLE corpus scored against
      // it with smoothing-mass backoff for unseen bigrams; n_oov is the
      // out-of-domain signal
      val docs = Tables.documents(s, d)
      NgramLm.scoreAgainst(docs.filter(length(col("source")) === 4),
        docs, "doc_id", "text")
    }),
    "ngram_lm_top_bigrams" -> ((s, d) =>
      // the trained model's head — dashboard query; TakeOrdered, never a
      // global sort of the model table
      NgramLm.topBigrams(Tables.documents(s, d), "doc_id", "text", topN = 20)),
    "perplexity_bucket_assign" -> ((s, d) => {
      // CCNet head/middle/tail assignment (Wenzek et al. 2020 §4):
      // tertile split of the cross-score NLL — threshold-based (value
      // cutoffs off a bounded 4dp-nll histogram), NOT a global ntile
      // sort, so the shape survives corpus scale
      val docs = Tables.documents(s, d)
      NgramLm.bucketAssign(docs.filter(length(col("source")) === 4),
          docs, "doc_id", "text")
        .select("doc_id", "n_bigrams", "n_oov", "avg_nll", "bucket")
    }),
    "perplexity_buckets" -> ((s, d) => {
      // the per-bucket census + the two global cutoffs — the CCNet
      // stratification dashboard row; O(4) rows
      val docs = Tables.documents(s, d)
      NgramLm.perplexityBuckets(docs.filter(length(col("source")) === 4),
        docs, "doc_id", "text")
    }),
    "domain_cap" -> ((s, d) =>
      // RefinedWeb-style per-source diversity cap: one ranked window
      // whose mega-domain skew is defused by InferWindowGroupLimit's
      // map-side group-limit (plan-shape spec + CapScale probe guard
      // the claim); priority is md5(source:id) so the oracle's window
      // replays it exactly
      Sample.domainCap(Tables.documents(s, d), "doc_id", "source", cap = 10)
        .select("doc_id", "source", "rk")),
    "domain_cap_stats" -> ((s, d) =>
      Sample.domainCapStats(Tables.documents(s, d), "doc_id", "source", cap = 10)),
    "gopher_quality_rules" -> ((s, d) =>
      // the full Gopher §A2.1 rule bitmap per doc — every ratio compared
      // in cross-multiplied integer form, so the oracle is float-free
      TextOps.gopherQualityRules(Tables.documents(s, d), "doc_id", "text")),
    "gopher_rule_stats" -> ((s, d) =>
      TextOps.gopherRuleStats(Tables.documents(s, d), "doc_id", "text")),
    "char_entropy" -> ((s, d) =>
      // encoding-junk / gibberish detector: per-doc Shannon entropy over
      // characters, keep = H ≥ 2 nats; one char explode into a (doc,ch)
      // histogram agg (map-side combined to ≤|alphabet| rows/doc) then a
      // per-doc reduce
      TextOps.charEntropy(Tables.documents(s, d), "doc_id", "text")),
    "dsir_weights" -> ((s, d) =>
      // DSIR importance resampling: every doc scored by the hashed-ngram
      // log-likelihood ratio of target (trusted single-digit sources, the
      // cross_score convention) vs raw distribution; keep = weight ≥ 0.
      // The ratio table is bucket-bounded (1024 rows) so it broadcasts at
      // ANY corpus scale — no model-side shuffle, unlike the LM gate.
      // All three dsir queries score against the memoized per-(session,
      // dir) model (the Bpe.train discipline): one estimation pass, then
      // each query is a single scoring pass.
      Dsir.weights(Tables.documents(s, d), length(col("source")) === 4,
        "doc_id", "text", ratio = Some(dsirRatio(s, d)))),
    "dsir_mix_shift" -> ((s, d) =>
      // the resampling census: what selection did to the source mix —
      // holdings vs kept per source, O(|sources|) rows
      Dsir.mixShift(Tables.documents(s, d), length(col("source")) === 4,
        "doc_id", "text", "source", ratio = Some(dsirRatio(s, d)))),
    "dsir_resample" -> ((s, d) =>
      // the paper's actual selection protocol: Gumbel-top-k draw of a
      // fixed-size corpus with prob ∝ exp(weight/τ) — md5-prefix uniforms,
      // 4dp keys, doc_id tiebreak, TakeOrderedAndProject (per-partition
      // heaps, no global sort)
      Dsir.resample(Tables.documents(s, d), length(col("source")) === 4,
        "doc_id", "text", k = 200, ratio = Some(dsirRatio(s, d)))),
    "epoch_mix_plan" -> ((s, d) =>
      // the pre-training mixture table: single-digit sources weighted 2x
      // (the "trusted slice" of the cross-score setup), 100M-token budget
      // — per-source target tokens + repetition factor
      Sample.epochMixPlan(Tables.documents(s, d), col("source"),
        size(TextOps.tokens(col("text"))).cast("long"),
        when(length(col("source")) === 4, lit(2.0)).otherwise(lit(1.0)),
        budgetTokens = 100000000L)),
    "epoch_shuffle" -> ((s, d) =>
      // reproducible epoch-1 training order: every doc gets a (shard,
      // pos) slot off md5("ep:1:"||id) — one uniform hash shuffle +
      // in-shard sort, no global sort, checkpoint resume = seek
      Sample.epochOrder(Tables.documents(s, d), "doc_id", epoch = 1,
        numShards = 8)),
    "diversity_sample" -> ((s, d) =>
      // D4-family cluster-balanced selection: 60 slots filled round-robin
      // over 8 md5-drawn centroids, most-prototypical-first — assignment
      // is a map-only literal-matrix cosine, the per-cluster rank rides
      // the InferWindowGroupLimit pushdown (the domain_cap lesson), and
      // the whole selection replays bit-for-bit in the oracle
      Similarity.diversitySample(Tables.embeddings(s, d), "vec_id",
        "embedding", k = 60, nlist = 8)),
    "diversity_sample_trained" -> ((s, d) => {
      // the ACTUAL D4 protocol (Tirumala et al. 2023): SemDeDup removes
      // the near-copies first, THEN cluster-balanced selection fills the
      // slots with Lloyd-TRAINED centroids over the survivor set — the
      // trained tier above diversity_sample's md5-drawn gate quantizer.
      // Every stage is deterministic (hash-ordered Lloyd sample, fixed
      // iters, pure-double kernels), so the 60 picked rows pin as a
      // golden oracle at the gate corpus. The planted jittered copies
      // (the semantic_dedup setup) must be gone before selection.
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val planted = emb.filter(col("vec_id") < 20).select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("float")
            - lit(500.0f)) / lit(100000.0f))).as("embedding"))
      val corpus = emb.unionByName(planted)
      val losers = Similarity.semanticDedupPairs(corpus, "vec_id", "embedding",
          nlist = 16, threshold = 0.8)
        .select(col("id_b").as("vec_id")).distinct()
      val survivors = corpus.join(losers, Seq("vec_id"), "left_anti")
      val cents = Similarity.lloydCentroids(survivors, "vec_id", "embedding",
        nlist = 8)
      Similarity.diversitySample(survivors, "vec_id", "embedding", k = 60,
          centroids = Some(cents))
        .select("pick_order", "vec_id", "cluster_id", "cluster_rank")
    }),
    "split_leakage" -> ((s, d) => {
      // eval-contamination gate: duplicated content spanning splits —
      // the id-keyed split deals copies independently, so raw-corpus
      // dups can leak train→test; one hash agg, no text past the md5.
      // The gate corpus has no exact dups, so plant re-crawl copies of
      // docs 0-4 under fresh ids (+5e6): ids 0/1 land cross-split
      // (leaked), 2-4 same-split (benign dups) — both verdicts exercised.
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val recrawl = docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      Sample.splitLeakage(docs.unionByName(recrawl), "doc_id", "text",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
    }),
    "curation_funnel" -> ((s, d) =>
      // the composed stage census: raw → gopher → LM keep → exact dedup
      // → domain cap, one count row per stage — the "where did my corpus
      // go" report; every stage is an already-gated operator
      Curation.funnel(Tables.documents(s, d), "doc_id", "text", "source")),
    "dedup_clusters" -> ((s, d) => {
      // Pairs → transitive clusters → size distribution: the step that
      // makes pairwise near-dup output actionable (keep one per cluster).
      // The edge set is the UNION of every near-dup tier a production
      // dedup run emits — MinHash band pairs, SimHash hamming pairs, and
      // SemDeDup cluster-blocked embedding pairs (vec i embeds doc i) —
      // deduped by (src,dst) so a pair surfaced by several tiers enters
      // CC once. Each tier keeps its own recall gate; this gate exercises
      // the cross-tier transitive closure.
      val docs = Tables.documents(s, d)
      val minhash = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
        .select("id_a", "id_b")
      val simhash = Dedup.simhashNearDups(docs, "doc_id", "text")
        .select("id_a", "id_b")
      val semantic = Similarity.semanticDedupPairs(
          Tables.embeddings(s, d).select("vec_id", "embedding"),
          "vec_id", "embedding", nlist = 16, threshold = 0.8)
        .select("id_a", "id_b")
      val edges = minhash.unionByName(simhash).unionByName(semantic).distinct()
      Dedup.connectedComponents(edges, "id_a", "id_b")
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
    }),
    "dedup_clusters_exact" -> ((s, d) => {
      // Connected components verified end to end by a second engine over
      // a UNION of replayable edge families — the exact companion to the
      // multi-tier production form above (whose minhash/simhash/semantic
      // edges have no DuckDB mirror): (a) organic exact-dup stars — each
      // doc linked to the min-id doc sharing its
      // md5(normalizeTextNfc(text)), a hash groupBy + join on 16-byte
      // keys, NO quadratic pair join; (b) a second SIMILARITY tier —
      // prefix-blocked word-3-shingle Jaccard >= 0.6 over the raw text
      // (organic near-dup edges DuckDB rederives with list functions);
      // (c) a deterministic stress topology over synthetic ids (a 12-node
      // chain and a 7-node star: multi-hop shapes pointer jumping must
      // close in O(log n) rounds, present at every SF even when the
      // corpus has no normalized dups); (d) cross-tier BRIDGE edges
      // joining a document cluster to the chain and the star to the
      // chain — the multi-source risk is exactly cross-tier transitivity,
      // so the closure must merge components across edge families. The
      // union is deduped by (src,dst) before clustering, mirroring the
      // production union's dedup. DuckDB replays the clustering itself as
      // a recursive-CTE reachability closure + min-label GROUP BY.
      import s.implicits._
      val docs = Tables.documents(s, d)
      val h = docs.select(col("doc_id"),
        md5(TextOps.normalizeTextNfc(col("text"))).as("h"))
      val organic = h.join(h.groupBy("h").agg(min("doc_id").as("id_a")), "h")
        .filter(col("doc_id") =!= col("id_a"))
        .select(col("id_a"), col("doc_id").as("id_b"))
      val blocked = docs.select(col("doc_id"), col("text"),
        concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 2)).as("__blk"))
      val ngramEdges = Dedup.ngramJaccardPairs(blocked, "doc_id", "text",
          "__blk", threshold = 0.6)
        .select(col("id_a"), col("id_b"))
      val chain = (0 until 11).map(i => (10000L + i, 10001L + i))
      val star = (1 to 6).map(i => (20000L, 20000L + i))
      val synth = (chain ++ star).toDF("id_a", "id_b")
      val bridges = Seq((0L, 10000L), (20000L, 10011L)).toDF("id_a", "id_b")
      val edges = organic.unionByName(ngramEdges).unionByName(synth)
        .unionByName(bridges).distinct()
      Dedup.connectedComponents(edges, "id_a", "id_b")
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
    }),
    "novelty_check" -> ((s, d) => {
      // Incremental-crawl gate: which of the "new" docs (second half of the
      // corpus) are genuinely novel against the existing corpus (first
      // half)? Anti-join on content hash, self-dups collapsed first.
      val docs = Tables.documents(s, d)
      Dedup.novelDocs(docs.filter(col("doc_id") >= 250),
          docs.filter(col("doc_id") < 250), "text", "doc_id")
        .select("doc_id", "lang", "source")
    }),
    "novelty_bloom" -> ((s, d) => {
      // The 100 TB form of the novelty gate: a Bloom filter built once per
      // corpus refresh answers "definitely novel" map-only for the fresh
      // majority; only bloom positives pay the exact anti-join. No false
      // negatives ⇒ the verdicts equal novelty_check's exactly, so the
      // oracle is the SAME SQL — the equality IS the gate.
      val docs = Tables.documents(s, d)
      Bloom.novelDocsBloom(docs.filter(col("doc_id") >= 250),
          docs.filter(col("doc_id") < 250), "text", "doc_id",
          bitsPerShard = 4096, k = 5, shards = 2)
        .select("doc_id", "lang", "source")
    }),
    "novelty_near_dup" -> ((s, d) => {
      // The NEAR-dup form of the incremental-crawl gate: a re-crawled page
      // with a tweaked footer must NOT count as novel even though its
      // content hash differs. Fresh batch = second half of the corpus
      // plus planted probes: JITTERED copies of corpus docs 0-9 (four
      // appended tokens → ~0.95 Jaccard vs their originals — the
      // cross-batch near-dup the band-bucket probe must catch) and two
      // genuinely novel docs (no corpus near-match — must pass). Output
      // is the planted probes' verdicts (golden: the organic fresh docs'
      // verdicts ride the LSH-banding recall the D2 gates already pin,
      // and hash-derived bands have no DuckDB mirror).
      import s.implicits._
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") < 250).select("doc_id", "text")
      val jittered = corpus.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" crawl jitter suffix pad")).as("text"))
      val novel = Seq(
        (4000000L, "wholly novel planted crawl document zyx about nothing" +
          " previously indexed qqj in this corpus at all"),
        (4000001L, "another genuinely novel planted document kvw carrying" +
          " entirely fresh content pqz never crawled before"))
        .toDF("doc_id", "text")
      val fresh = docs.filter(col("doc_id") >= 250).select("doc_id", "text")
        .unionByName(jittered).unionByName(novel)
      val novelOut = Dedup.novelNearDups(fresh, corpus, "doc_id", "text",
        threshold = 0.7)
      fresh.filter(col("doc_id") >= 3000000L)
        .join(novelOut.select(col("doc_id"), lit(true).as("__novel")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("__novel"), lit(false)).as("is_novel"))
    }),
    "corpus_snapshot_diff" -> ((s, d) => {
      // Incremental-curation bookkeeping: the row-level delta between two
      // corpus versions. Gate versions are deterministic slices of the
      // documents table — prev = docs <400, curr = docs >=100 with every
      // 50th doc's text rewritten (a re-crawl edit) — so the output is
      // 100 added + 100 removed + the planted changed docs, replayable
      // exactly. The join ships (id, 16-byte hash), never text, and the
      // unchanged mass never materializes.
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") < 400)
      val curr = docs.filter(col("doc_id") >= 100)
        .withColumn("text", when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      Snapshot.diff(prev, curr, "doc_id", "text")
    }),
    "corpus_snapshot_summary" -> ((s, d) => {
      // The per-refresh census a pipeline pins to catch step changes
      // (a crawler rewriting 40% of the corpus is an incident): same gate
      // versions, one full-outer hash join + one aggregate.
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") < 400)
      val curr = docs.filter(col("doc_id") >= 100)
        .withColumn("text", when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      Snapshot.diffSummary(prev, curr, "doc_id", "text")
    }),
    "incremental_pipeline" -> ((s, d) => {
      // The loop the snapshot diff exists to feed (VERDICT r12 #4):
      // normalize → exact-dedup → filter → chunk → pack run INCREMENTALLY
      // over a two-version corpus — only the Snapshot.diff delta pays
      // text work, membership ripples (promotion/demotion) come off the
      // skinny ledger, and only delta-touched shards repack; untouched
      // shards pass through verbatim (Incremental.repack). The oracle is
      // the FULL REBUILD over version 2, replayed end-to-end in DuckDB
      // (normalize chain, min-id dedup, three keep rules, chunk
      // boundaries, md5 doc-sharding, the greedy packer as a recursive
      // CTE) — equality proves the incremental path IS the batch
      // rebuild. Planted version-2 work covers every delta class:
      // docs 40-49 and 60-62 removed; 50-59 edited (55's edit fails the
      // min-length rule — a changed doc leaving the survivor set);
      // doc 35 rewritten to doc 66's exact text (66, itself unchanged,
      // is DEMOTED — its content's canonical id drops to 35); dup
      // partners of 60-64 planted at id+1e6 in BOTH versions, so
      // removing 60-62 PROMOTES partners 1000060-62 from dup losers to
      // canonical survivors; 10 fresh docs added at id+2e6 plus one
      // exact dup of doc 90 the dedup stage must drop.
      val (prev, curr) = incrCorpus(s, d)
      val prevLedger = Incremental.ledger(prev, "doc_id", "text", incrKeep)
      val prevPacked = Incremental.batch(prev, "doc_id", "text", incrKeep,
        maxTokens = 32, overlap = 8, budget = 256L, shards = 64, incrShard)
      val delta = Snapshot.diff(prev, curr, "doc_id", "text")
      Incremental.repack(prevLedger, prevPacked, curr, delta,
        "doc_id", "text", incrKeep,
        maxTokens = 32, overlap = 8, budget = 256L, shards = 64, incrShard)
    }),
    "incremental_sink" -> ((s, d) => {
      // The WRITE-path twin of incremental_pipeline: the same planted
      // two-version corpus, but the refresh is applied IN PLACE to a
      // writePacked lake (Incremental.refreshInPlace — only affected
      // shard directories rewritten via dynamic partition overwrite,
      // emptied dirs deleted) and the gate reads the TREE back. Same
      // full-rebuild oracle: equality proves what is ON DISK after the
      // partial rewrite is the batch rebuild — write→read fidelity for
      // the refresh path, the partitioned_sink pattern applied to the
      // incremental lake.
      val (prev, curr) = incrCorpus(s, d)
      val path = sinkPath(d, "incr_lake")
      Sink.reset(path)
      Incremental.writePacked(
        Incremental.batch(prev, "doc_id", "text", incrKeep,
          maxTokens = 32, overlap = 8, budget = 256L, shards = 64, incrShard),
        path)
      // the write happens eagerly inside refreshInPlace; the returned
      // next-refresh ledger is not this gate's output
      Incremental.refreshInPlace(
        Incremental.ledger(prev, "doc_id", "text", incrKeep), path,
        curr, Snapshot.diff(prev, curr, "doc_id", "text"),
        "doc_id", "text", incrKeep,
        maxTokens = 32, overlap = 8, budget = 256L, shards = 64, incrShard): Unit
      s.read.parquet(path).select(
        col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("shard").cast("int").as("shard"), col("seq_id"))
    }),
    "incremental_scrub" -> ((s, d) => {
      // The frequency-delta scrub refresh (IncrementalScrub): the stage
      // whose state is NOT per-document — a window's verdict is its
      // corpus-wide df, so a delta can change the scrub output of docs
      // nobody touched. Planted version-2 work exercises both ripple
      // directions: tailB sits on docs 30+31 (df=2, scrubbed); removing
      // 31 drops it to 1 and RESTORES untouched doc 30. tailC sits on
      // doc 40 alone (df=1, kept); an added re-crawl (7000001 = doc 80's
      // body + tailC) lifts it to 2 and CUTS untouched doc 40. tailA on
      // 20-29 loses one holder (25's edit) without crossing — only 25
      // reworks. The oracle replays the BATCH spanScrub over version 2
      // in DuckDB (string-grouped window frequencies, interval cover,
      // token rebuild), so equality proves refresh ≡ batch — the same
      // verdict-equality pattern as incremental_pipeline, for the one
      // stage a per-doc ledger cannot increment.
      val (prev, curr) = scrubCorpus(s, d)
      val st = IncrementalScrub.state(prev, "doc_id", "text", 8, 2)
      val next = IncrementalScrub.refresh(st, curr,
        Snapshot.diff(prev, curr, "doc_id", "text"),
        "doc_id", "text", 8, 2)
      next.scrubbed.select(col("id").as("doc_id"),
        md5(col("scrubbed_text")).as("scrub_hash"),
        col("n_tokens"), col("n_removed"))
    }),
    "seq_packing" -> ((s, d) => {
      // Token-budget sequence packing over the corpus' whitespace token
      // counts: per-sequence fill statistics (greedy shard-local packing).
      val toks = TextOps.tokenCounts(Tables.documents(s, d), "doc_id", "text")
      Packing.packSequences(toks, "doc_id", "ws_tokens", budget = 1024, shards = 8)
        .groupBy("shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
    }),
    "seq_packing_check" -> ((s, d) => {
      // Invariant oracle for the packer, second-engine-pinned where a
      // second engine CAN pin it: DuckDB independently recomputes the
      // corpus' exact whitespace-token sum (conservation — every token
      // lands in exactly one bin, nothing dropped or double-packed), and
      // the structural invariants are pinned TRUE: no multi-doc bin over
      // budget (an oversized single doc legitimately gets its own bin),
      // and the bin count inside the greedy first-fit bounds — at least
      // ceil(total/budget) (pigeonhole), at most total/(budget-maxdoc)
      // closed bins (a bin only closes when the next doc doesn't fit, so
      // every closed bin holds > budget-maxdoc tokens) plus one open bin
      // per shard.
      val budget = 1024L
      val shards = 8
      val toks = TextOps.tokenCounts(Tables.documents(s, d), "doc_id", "text")
      val bins = Packing.packSequences(toks, "doc_id", "ws_tokens", budget, shards)
        .groupBy("shard", "seq_id")
        .agg(sum("n_tokens").as("seq_tokens"), count(lit(1)).as("n_docs"),
          max("n_tokens").as("max_doc"))
      bins.agg(
          sum("seq_tokens").as("total_tokens"),
          count(lit(1)).as("__bins"),
          max("max_doc").as("__maxdoc"),
          min(when(col("seq_tokens") <= budget || col("n_docs") === 1, 1)
            .otherwise(0)).as("__budget_ok"))
        .select(col("total_tokens"),
          (col("__budget_ok") === 1).as("budget_ok"),
          (col("__bins") >= ceil(col("total_tokens") / lit(budget.toDouble)) &&
            (col("__maxdoc") >= budget ||
              col("__bins") <= ceil(col("total_tokens") /
                (lit(budget.toDouble) - col("__maxdoc"))) + lit(shards)))
            .as("bins_ok"))
    }),
    "text_normalize" -> ((s, d) =>
      // Normalization before hashing/shingling: cosmetic variants (case,
      // CRLF, tab runs) collapse to one canonical form. Gate compares the
      // md5 of the canonical text against DuckDB running the same chain.
      Tables.documents(s, d).select(
        col("doc_id"),
        md5(TextOps.normalizeText(col("text"))).as("norm_hash"),
        length(TextOps.normalizeText(col("text"))).cast("long").as("norm_chars"))),
    "chunk_docs" -> ((s, d) =>
      // Long-document → context-window preparation: ≤32-token chunks with
      // 8 tokens of overlap (small window so the gate corpus actually
      // chunks). One projection + one explode; DuckDB replays the chunk
      // boundaries and text token-for-token.
      TextOps.chunkDocs(Tables.documents(s, d), "doc_id", "text",
          maxTokens = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_hash"))),
    "dataset_split" -> ((s, d) => {
      // Deterministic 80/10/10 train/val/test carve (Sample.hashSplit):
      // split is a pure function of doc_id, so the deal never reshuffles
      // as the corpus grows. Gate: per (split, lang) census with a
      // modular content checksum — membership itself is checked, not
      // just the counts.
      Sample.hashSplit(Tables.documents(s, d), col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 1000000007L).as("checksum"))
    }),
    "token_budget_sample" -> ((s, d) => {
      // Mixture draw by TOKEN budget per language (how a training mix is
      // specified), deterministic by hash order with at-most-one-doc
      // overshoot. Gate orders by md5 so DuckDB replays the exact draw;
      // the production default is the engine-standard xxhash64.
      val df = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      Sample.tokenBudgetSample(df, col("lang"), col("doc_id"), col("n_tokens"),
          Map("en" -> 2000L, "de" -> 800L, "fr" -> 500L),
          orderKey = Some(md5(col("doc_id").cast("string"))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
    }),
    "temperature_mixture" -> ((s, d) => {
      // Temperature-flattened mixture (p_s ∝ mass_s^(1/τ), τ=2): budgets
      // derived from the corpus's own per-language token mass, then the
      // same deterministic budget draw as token_budget_sample. τ=2 rides
      // IEEE sqrt so DuckDB replays budget derivation AND draw exactly;
      // low-resource langs get visibly more than their natural share.
      val df = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      val budgets = Sample.temperatureBudgets(
        df, col("lang"), col("n_tokens"), totalTokens = 6000L, temperature = 2.0)
      val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
        case (acc, (lang, b)) => when(col("lang") === lang, lit(b)).otherwise(acc)
      }
      Sample.tokenBudgetSample(df, col("lang"), col("doc_id"), col("n_tokens"),
          budgets, orderKey = Some(md5(col("doc_id").cast("string"))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
        .withColumn("budget", budgetCol)
    }),
    "contamination_check" -> ((s, d) => {
      // Benchmark decontamination: docs 0-4 play the eval set; a 12-token
      // probe sentence is appended to them AND to training docs 10-12
      // in-query (both engines replay the concat), so those three docs
      // must flag with >= 5 shared 8-grams while the rest of the corpus
      // stays clean. The corpus pass is a map-only projection against the
      // broadcast benchmark gram set — nothing explodes or shuffles.
      val probe = lit(" the quick brown contamination probe sentence lurks" +
        " verbatim inside selected training documents")
      val base = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") < 5 || (col("doc_id") >= 10 && col("doc_id") <= 12),
          concat(col("text"), probe)).otherwise(col("text")).as("text"))
      Dedup.contamination(base.filter(col("doc_id") >= 5),
        base.filter(col("doc_id") < 5), "doc_id", "text", n = 8)
    }),
    "corpus_pipeline" -> ((s, d) => {
      // The END-TO-END corpus chain (normalize → exact-dedup → filter →
      // near-dup-drop → span-scrub → chunk → pack) as one conservation
      // gate: stage survivor counts AND the scrub token ledger are
      // replayed by DuckDB, and packed_tokens — summed off the PACKER's
      // output — must equal the chunk-stage token sum the oracle computes
      // analytically over the scrubbed survivors, so a token dropped or
      // double-packed anywhere between stages flips the row red. Docs 0-9
      // are planted as exact copies at id+1000000 (exact-dedup work) and
      // docs 10-19 as JITTERED copies at id+2000000 (four appended
      // tokens — near-dup work: ~0.95 Jaccard, caught and dropped by the
      // keep-first rule); both engines replay the union. The near-dup
      // block key is the first-2-token prefix (replayable; production
      // callers pass a SimHash band — see ngram_jaccard's simband form)
      // and the keep-ruleset drops the terminal-punctuation rule —
      // this corpus is word-soup, the other three rules split it 500→463.
      // docs 20-39 get a planted 10-token boilerplate tail (kept under
      // their own ids): its interior stride-1 8-windows repeat 20× across
      // the corpus, so the scrub stage must cut exactly those 10 tokens
      // from each — the nonzero, exactly-accountable scrub workload (the
      // word-soup corpus has no organic repeated 8-spans left after
      // dedup). Boundary windows straddling doc+tail are unique per doc
      // and must NOT be cut.
      val docs = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id").between(20, 39),
          concat(col("text"), lit(" common license boilerplate notice" +
            " follows terms apply everywhere always more")))
          .otherwise(col("text")).as("text"))
      val planted = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val jitter = docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" nearline jitter marker pad")).as("text"))
      // Model-filter composition (final r10): 20 planted docs at id+3e6
      // that PASS every heuristic rule (letter-only 10-char words, no
      // digits, length and word-length in range) but FAIL the trained
      // classifier (zero stopwords + maxed word-length feature → logit
      // ≈ −3.3) — the filter work only a model can do. Their text is
      // portable arithmetic (translate over lpad'ed ids) so DuckDB
      // regenerates it; every word is corpus-unique so the span stage
      // is untouched. The keep predicate composes the heuristic rules
      // AND the pinned-weight logit — QualityModel.logitCol is plain
      // Column arithmetic, so the composition costs no extra stage.
      val modelBad = s.range(20).select(
        (col("id") + 3000000L).as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("qz"), translate(
            lpad((col("id") * 100 + i).cast("string"), 8, "0"),
            "0123456789", "abcdefghij"))): _*).as("text"))
      val wts = QualityModel.train(Tables.documents(s, d), "doc_id", "text")
      val rules = (t: Column) => TextOps.corpusFilterRules(t)
        .collect { case (name, rule) if name != "no_terminal_punct" => rule }
        .reduce(_ && _) && QualityModel.logitCol(t, wts) > 0
      CorpusPipeline.summary(
        docs.unionByName(planted).unionByName(jitter).unionByName(modelBad),
        "doc_id", "text",
        maxTokens = 32, overlap = 8, budget = 256L, shards = 8, keep = rules,
        nearDup = Some(CorpusPipeline.NearDup(
          t => concat_ws(" ", slice(split(trim(t), "\\s+"), 1, 2)),
          n = 3, threshold = 0.6)),
        scrub = Some(CorpusPipeline.SpanScrub(window = 8, minDf = 2)))
    }),
    "corpus_pipeline_banded" -> ((s, d) => {
      // The SCALE form of the same chain: near-dup candidates from MinHash
      // LSH banding (NearDup.banded — bucket cardinality grows with the
      // corpus, hot buckets guarded) instead of the replayable-but-
      // |block|² prefix-block join. Same planted workload as
      // corpus_pipeline; the whole summary row is deterministic (fixed
      // xxhash64 seeds end to end), so it gates against GOLDEN values —
      // the exact-form twin above is what a second engine replays
      // analytically, and the planted jittered copies sit at Jaccard
      // ~0.95 where the 8x4 banding S-curve is ~1, so both forms must
      // reach the same stage counts on this corpus.
      val docs = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id").between(20, 39),
          concat(col("text"), lit(" common license boilerplate notice" +
            " follows terms apply everywhere always more")))
          .otherwise(col("text")).as("text"))
      val planted = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val jitter = docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" nearline jitter marker pad")).as("text"))
      val modelBad = s.range(20).select(
        (col("id") + 3000000L).as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          concat(lit("qz"), translate(
            lpad((col("id") * 100 + i).cast("string"), 8, "0"),
            "0123456789", "abcdefghij"))): _*).as("text"))
      val wts = QualityModel.train(Tables.documents(s, d), "doc_id", "text")
      val rules = (t: Column) => TextOps.corpusFilterRules(t)
        .collect { case (name, rule) if name != "no_terminal_punct" => rule }
        .reduce(_ && _) && QualityModel.logitCol(t, wts) > 0
      CorpusPipeline.summary(
        docs.unionByName(planted).unionByName(jitter).unionByName(modelBad),
        "doc_id", "text",
        maxTokens = 32, overlap = 8, budget = 256L, shards = 8, keep = rules,
        nearDup = Some(CorpusPipeline.NearDup(
          _ => lit("unused"), n = 3, threshold = 0.6, banded = true)),
        scrub = Some(CorpusPipeline.SpanScrub(window = 8, minDf = 2)))
    }),
    "pii_scrub" -> ((s, d) => {
      // Corpus PII redaction (the standard pre-training scrub): mask
      // emails/cards/phones/IPs with typed tokens, count what was
      // removed. The gate corpus has no organic PII, so a deterministic
      // PII sentence is appended to docs 0-4 in-query — both engines
      // replay the same concat, so masks AND counts verify end to end.
      val pii = lit(" Contact jo.doe+x@mail.example.org or +1 (555) 123-4567;" +
        " host 10.0.42.7; card 4111 1111 1111 1111.")
      val df = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") < 5, concat(col("text"), pii))
          .otherwise(col("text")).as("text"))
      TextOps.scrubPii(df, "doc_id", "text")
        .select(col("doc_id"), md5(col("scrubbed")).as("scrub_hash"),
          col("n_email"), col("n_card"), col("n_phone"), col("n_ipv4"))
    }),
    "repetition_stats" -> ((s, d) =>
      // Gopher-family repetition signals per document: duplicate-line
      // fraction and top-2-gram mass (computed as the longest equal run
      // over the sorted per-row gram array — O(n log n), no shuffle).
      TextOps.repetitionStats(Tables.documents(s, d), "doc_id", "text")),
    "nfc_normalize" -> ((s, _) => {
      // Unicode NFC canonical composition, cross-checked engine-vs-engine:
      // the JDK Normalizer (native UnicodeNorm expression) against DuckDB's
      // nfc_normalize on literals that exercise composition (combining
      // accents, angstrom-sign singleton, decomposed Hangul jamo), an
      // all-ASCII fast path, and an NFC-invariant ligature (only NFKC
      // touches U+FB03 — a negative control). Literals are built from
      // escapes here and chr() in the oracle so both sources stay ASCII.
      import s.implicits._
      Seq(
        (1, "e\u0301"),                 // e + COMBINING ACUTE -> U+00E9
        (2, "n\u0303o"),                // n + COMBINING TILDE -> U+00F1
        (3, "\u212B"),                  // ANGSTROM SIGN -> U+00C5 (singleton)
        (4, "\u1100\u1161\u11AB"),      // Hangul jamo -> syllable U+AC04
        (5, "plain ascii text."),       // fast path: returned untouched
        (6, "\uFB03"))                  // LATIN SMALL LIGATURE FFI: NFC no-op
        .toDF("id", "s")
        .select(col("id"),
          TextOps.nfcNormalize(col("s")).as("nfc"),
          length(col("s")).cast("long").as("len_raw"),
          length(TextOps.nfcNormalize(col("s"))).cast("long").as("len_nfc"))
    }),
    "doc_filter_stats" -> ((s, d) =>
      // C4/Gopher-style corpus filters as a quarantine ruleset over the
      // documents table: per-rule violation counters in one pass.
      Quality.quarantineStats(Tables.documents(s, d),
        TextOps.corpusFilterRules(col("text")))),
    "multimodal_meta" -> ((s, d) => {
      val mm = Multimodal.asMultimodal(Tables.documents(s, d), "doc_id", "text")
      // REAL decode: every payload is a rendered PNG, parsed back by
      // ImageIO — decoded dims/bands come from the pixels, not the
      // metadata claim. Gate output is scalars only (the driver's pandas
      // compare can't hash array cells): the feature vector is summarized
      // by a stable hash.
      Multimodal.extractFeatures(mm, dim = 16).toDF()
        .select(
          col("asset_id"), col("n_bytes"),
          col("decoded_width"), col("decoded_height"), col("channels"),
          xxhash64(col("features").cast("string")).as("feature_hash"))
    }),
    "multimodal_frames" -> ((s, d) => {
      // Frame-sampling plumbing under a FULL oracle (unlike the
      // hash-bearing meta/feature gates, the offsets are pure metadata
      // arithmetic DuckDB replays exactly): n evenly-spaced byte offsets
      // per asset, one row per sampled frame. Runs on the byte-stream
      // (video-shaped) wrapper — octet_length arithmetic is portable to
      // the replay, a PNG container length is not.
      val mm = Multimodal.asByteStream(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleFrames(mm, nFrames = 4)
    }),
    "multimodal_golden" -> ((s, d) => {
      // Oracle-checkable slice of the multimodal plumbing: metadata
      // struct, REAL ImageIO decode (claimed vs decoded dims + band
      // count + pixel-stat feature hash), and resize plan for docs 0-9,
      // all fully deterministic. The hash-derived fields have no DuckDB
      // mirror, so the oracle pins GOLDEN rows (computed once from the
      // seed=42 corpus at the sf0.01 gate SF, like fingerprint's) — any
      // drift in the PNG render, the decode, pixel statistics, batching,
      // or resize arithmetic breaks the hash compare.
      val mm = Multimodal.asMultimodal(
        Tables.documents(s, d).filter(col("doc_id") < 10), "doc_id", "text")
      val feats = Multimodal.extractFeatures(mm, dim = 16).toDF()
        .select(col("asset_id"), col("n_bytes"),
          col("decoded_width"), col("decoded_height"), col("channels"),
          xxhash64(col("features").cast("string")).as("feature_hash"))
      mm.select(col("asset_id"), col("meta.mime").as("mime"),
          col("meta.width").as("width"), col("meta.height").as("height"))
        .join(feats, "asset_id")
        .join(Multimodal.resizePlan(mm, 64, 64)
          .select(col("asset_id"), col("scale"),
            col("dst_width"), col("dst_height")), "asset_id")
    }),
    "multimodal_audio" -> ((s, d) => {
      // REAL audio decode under a FULL oracle: every payload is a rendered
      // RIFF/WAVE PCM-16 asset whose CLAIMED parameters (rate by id%4,
      // channels by id%2, frames from the UTF-8 byte length) are portable
      // integer arithmetic, and javax.sound.sampled decodes the bytes
      // back — the DECODED rate/channels/bits/frames and the duration
      // must land on the very values DuckDB recomputes from (doc_id,
      // text), so a drift anywhere in the WAV writer or the decoder
      // flips the row red. The asset frame is persisted so the render
      // runs once across the claim/decode branches of the join.
      val au = Dedup.persistTracked(
        Multimodal.asAudio(Tables.documents(s, d), "doc_id", "text"),
        Multimodal.persistLevel(s))
      au.select(col("asset_id"), col("meta.mime").as("mime"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.bits").as("bits"), col("meta.n_frames").as("n_frames"))
        .join(Multimodal.extractAudioFeatures(au).toDF()
          .select(col("asset_id"), col("n_bytes"), col("decoded_rate"),
            col("decoded_channels"), col("decoded_bits"),
            col("decoded_frames"), col("duration_ms")), "asset_id")
    }),
    "multimodal_audio_golden" -> ((s, d) => {
      // The PCM content itself (LCG stream) has no DuckDB mirror, so its
      // per-channel statistics — RMS, peak, zero-crossing fraction, mean,
      // computed off the DECODER's output — are pinned as golden rows for
      // docs 0-9, like the image path's pixel-stat hash.
      val au = Dedup.persistTracked(Multimodal.asAudio(
        Tables.documents(s, d).filter(col("doc_id") < 10), "doc_id", "text"),
        Multimodal.persistLevel(s))
      au.select(col("asset_id"), col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"), col("meta.n_frames").as("n_frames"))
        .join(Multimodal.extractAudioFeatures(au).toDF()
          .select(col("asset_id"), col("n_bytes"), col("decoded_frames"),
            col("duration_ms"),
            xxhash64(col("features").cast("string")).as("feature_hash")),
          "asset_id")
    }),
    "multimodal_video" -> ((s, d) => {
      // REAL video-frame decode under a FULL oracle: every payload is a
      // rendered multi-frame animated GIF whose CLAIMED parameters
      // (width/height by id arithmetic, frame count from the UTF-8 byte
      // length, frame interval by id%3) are portable integer arithmetic,
      // and ImageIO's GIF reader decodes the container back — the
      // DECODED frame count, dimensions, and per-frame delay (from the
      // GraphicControlExtension) must land on the very values DuckDB
      // recomputes from (doc_id, text), and the per-frame sample count
      // must equal the claimed frame count (stride=1 decodes every
      // frame). The asset frame is persisted so the render runs once
      // across the claim/decode branches of the join.
      val vd = Dedup.persistTracked(
        Multimodal.asVideo(Tables.documents(s, d), "doc_id", "text"),
        Multimodal.persistLevel(s))
      vd.select(col("asset_id"), col("meta.mime").as("mime"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_frames").as("n_frames"),
          col("meta.frame_ms").as("frame_ms"))
        .join(Multimodal.extractVideoFrames(vd).toDF()
          .groupBy("asset_id")
          .agg(max("decoded_frames").as("decoded_frames"),
            count(lit(1)).cast("int").as("sampled_frames"),
            max("decoded_width").as("decoded_width"),
            max("decoded_height").as("decoded_height"),
            max("decoded_frame_ms").as("decoded_frame_ms")), "asset_id")
    }),
    "multimodal_video_golden" -> ((s, d) => {
      // The pixel content itself (LCG stream continuing across frames)
      // has no DuckDB mirror, so the per-frame decoded statistics —
      // mean/min/max gray through the decoded palette — are pinned as a
      // stat hash per SAMPLED FRAME for docs 0-9, the video analogue of
      // the image pixel-stat and audio PCM-stat goldens. One row per
      // frame proves real frame-granular decode, not container metadata.
      val vd = Dedup.persistTracked(Multimodal.asVideo(
        Tables.documents(s, d).filter(col("doc_id") < 10), "doc_id", "text"),
        Multimodal.persistLevel(s))
      Multimodal.extractVideoFrames(vd).toDF()
        .join(vd.select(col("asset_id"),
          col("meta.n_frames").as("n_frames"),
          col("meta.n_bytes").as("n_bytes")), "asset_id")
        .select(col("asset_id"), col("frame_index"), col("n_frames"),
          col("n_bytes"), col("decoded_width"), col("decoded_height"),
          col("decoded_frame_ms"),
          xxhash64(concat_ws(",", col("mean_gray").cast("string"),
            col("min_gray").cast("string"),
            col("max_gray").cast("string"))).as("stat_hash"))
    }),

    // ---- §C ML pipeline ------------------------------------------------
    "target_encode" -> ((s, d) =>
      FatalityModel.targetEncode(
          Tables.events(s, d).select("event_type", "value"), "event_type", "value")
        .select(col("event_type"), col("event_type_target_encoded"))
        .distinct()),
    "target_encode_cv" -> ((s, d) =>
      // Fold tag is `event_id % 5` (portable to the DuckDB oracle, unlike
      // xxhash64); encoding rounded to 4dp for engine-portable hashing.
      FatalityModel.targetEncodeCV(
          Tables.events(s, d).select("event_id", "event_type", "value"),
          "event_type", "value", pmod(col("event_id"), lit(5L)))
        .select(col("event_type"), col("__fold").as("fold"),
          round(col("event_type_target_encoded_cv"), 4).as("encoded_cv"))
        .distinct()),
    "feature_prep" -> ((s, d) =>
      FatalityModel.prepareFeatures(Tables.events(s, d))),
    "fatality_model" -> ((s, d) => trainedModel(s, d).metrics),
    "risk_categorize" -> ((s, d) =>
      FatalityModel.riskCategorize(Tables.events(s, d), "value")
        .groupBy("risk_level").agg(count(lit(1)).as("cnt"))),
    "prediction_perf" -> ((s, d) =>
      FatalityModel.predictionPerformance(trainedModel(s, d).predictions, "event_type")),
    "risk_crosstab" -> ((s, d) => {
      // Actual-vs-predicted risk-level confusion rollup (ml.py:693-694):
      // categorize both sides of the shared test-fold predictions.
      val pred = trainedModel(s, d).predictions
      FatalityModel.riskCrosstab(pred, "value", "predicted_value")
    }),
    "model_feature_importance" -> ((s, d) =>
      // GBT feature-importance surface (ml.py:446-469; importance_pct
      // normalization ml.py:515): one row per assembled feature slot from
      // the memoized fit — importance desc, feature-name tiebreak. Rounded
      // for the artifact; rows-only (rides the GBT fit, like C3/C5/C6),
      // with model_feature_importance_check as the second-engine gate.
      FatalityModel.featureImportance(trainedModel(s, d))
        .select(col("feature"), round(col("importance"), 6).as("importance"),
          round(col("importance_pct"), 1).as("importance_pct"))),
    "model_feature_importance_check" -> ((s, d) => {
      // The SQL-checkable structural surface of the importance table:
      // DuckDB independently derives the expected slot count (one one-hot
      // slot per distinct event_type — handleInvalid=keep adds a reserved
      // slot, dropLast removes it — plus the 7 numeric features), and the
      // invariants are pinned TRUE: importances non-negative, pct
      // normalization sums to 100 within fp tolerance.
      val fi = FatalityModel.featureImportance(trainedModel(s, d))
      fi.agg(count(lit(1)).as("n_features"),
          min("importance").as("__min"),
          sum("importance_pct").as("__pct"))
        .select(col("n_features"),
          (col("__min") >= 0.0).as("nonneg_ok"),
          (abs(col("__pct") - 100.0) < 0.001).as("pct_total_ok"))
    }),

    // ---- §F sources & sinks --------------------------------------------
    "compact_partitions" -> ((s, d) => {
      // Lake maintenance: a micro-batched ingest is simulated by writing
      // the daily lake WITHOUT the one-task-per-partition discipline
      // (8 hash tasks × ~30 days ≈ 240 small files), then
      // Sink.compactPartitions restores the invariant — every fragmented
      // day rewritten by one task into one file via the tombstone-
      // protected swap. The oracle pins per-day row counts against the
      // source (compaction must move files, never rows) plus both
      // file-count verdicts.
      val path = sinkPath(d, "compact")
      Sink.reset(path)
      Tables.events(s, d).withColumn("day", to_date(col("ts")))
        .repartition(8, col("event_id"))
        .write.mode("overwrite").partitionBy("day").parquet(path)
      Sink.compactPartitions(s, path, "day")
        .select(col("day"), col("n_rows"),
          (col("files_before") > 1).as("was_fragmented"),
          (col("files_after") === 1).as("compacted"))
    }),
    "jsonl_ingest" -> ((s, d) => {
      // JSONL corpus boundary: land the documents table as
      // newline-delimited JSON (the LLM-corpus interchange format), plant
      // two malformed lines the way real third-party dumps contain them,
      // and read back under an explicit contract schema with PERMISSIVE
      // per-row quarantine — corrupt lines are counted, never fatal, and
      // every valid row's chars roundtrip exactly (the oracle pins the
      // per-lang totals against the source parquet).
      val path = sinkPath(d, "jsonl")
      Jsonl.write(Tables.documents(s, d), path)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path, "zz-corrupt.json"),
        java.util.Arrays.asList(
          """{"doc_id": 1, "text": "unterminated""",
          """this is not json"""))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id long, text string, lang string, source string, n_chars long")
      Jsonl.ingestProfile(Jsonl.read(s, path, schema), "lang", "n_chars")
    }),
    "paged_ingest" -> ((s, _) =>
      // Paged-fetch ingestion as a DSv2 source: one input partition per
      // page (the reference's concurrent offset/limit HTTP pages,
      // base_assets.py), aggregated straight off the parallel read.
      s.read.format("graft.sources.paged.PagedSource")
        .option("pages", 16).option("pageSize", 2000).load()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))),
    "paged_cursor" -> ((s, _) =>
      // Incremental-load path (the reference sensor's offset cursor): only
      // pages >= 12 of 16 are re-read. The pushed `page >= 12` filter
      // prunes whole input partitions — the skipped pages are never
      // fetched at all (PagedSourceSpec asserts the partition count), and
      // DuckDB replays the surviving tail rows exactly.
      s.read.format("graft.sources.paged.PagedSource")
        .option("pages", 16).option("pageSize", 2000).load()
        .filter(col("page") >= 12)
        .groupBy("page")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))),
    "shard_export" -> ((s, d) => {
      // Training-shard export: deterministic md5-keyed global shuffle of
      // the documents corpus into 8 shards, one file each, manifest read
      // back from the WRITTEN tree. The oracle recomputes the manifest
      // from the source table with the same key arithmetic — shard
      // assignment, token totals, and the modular content checksum must
      // all survive the write→read roundtrip.
      val path = sinkPath(d, "shards")
      Sink.reset(path)
      Sink.exportShards(s, Tables.documents(s, d).select("doc_id", "text"),
        path, 8, "doc_id", "text")
    }),
    "partitioned_sink" -> ((s, d) => {
      // Daily-partitioned lake write (base_assets.py:150 S3 daily objects):
      // write events partitioned by day, read the table back, and aggregate
      // it — the oracle aggregates the source directly, so the gate verifies
      // write→read fidelity end to end.
      val path = sinkPath(d, "partitioned")
      Sink.writePartitioned(
        Tables.events(s, d).select(col("event_id"), to_date(col("ts")).as("day"), col("value")),
        path, "day")
      s.read.parquet(path)
        .groupBy("day")
        .agg(count(lit(1)).as("n_rows"), sum("value").as("total_value"))
    }),
    "sorted_layout" -> ((s, d) => {
      // Range-sorted lake layout (Sink.writeSorted): events rewritten with
      // each file owning a contiguous event-time range, so a later bounded
      // report is answered by row-group skipping. The gate verifies
      // sort/write/read fidelity end to end — a mid-month window off the
      // sorted copy must aggregate identically to the oracle reading the
      // source directly. SinkSpec measures the skipping effect itself.
      val path = sinkPath(d, "sorted")
      Sink.writeSorted(
        Tables.events(s, d).select(col("event_id"), col("ts"), col("value")),
        path, Seq("ts"), files = 8)
      s.read.parquet(path)
        .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum("value"), 2).as("total_value"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
    }),
    "zorder_layout" -> ((s, d) => {
      // Z-ordered lake layout (Sink.writeZOrdered — Delta/Iceberg's
      // OPTIMIZE ZORDER as plain Spark): events clustered on the Morton
      // interleave of (day index, user_id), so every file/row group
      // covers a small tile of the (time, user) plane and carries tight
      // min/max on BOTH natural columns — a query bounding time, user,
      // or both skips at scan time where the 1-D sorted layout only
      // serves its single sort key. The gate verifies layout/write/read
      // fidelity: a two-dimensional bounded aggregate off the z-ordered
      // copy must match the oracle reading the source directly.
      // SinkSpec measures the two-dimensional skipping itself.
      val path = sinkPath(d, "zorder")
      Sink.writeZOrdered(
        Tables.events(s, d).select(
          col("event_id"), col("ts"), col("user_id"), col("value")),
        path,
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")),
        col("user_id"), files = 16)
      s.read.parquet(path)
        .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp") &&
          col("user_id") >= 100 && col("user_id") < 300)
        .agg(count(lit(1)).as("n_rows"),
          round(sum("value"), 2).as("total_value"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
    }),
    "zorder3_layout" -> ((s, d) => {
      // Three-dimensional Z-order (Sink.writeZOrdered3): time × user ×
      // value — the clustering a production fact table wants when its
      // reports bound all three. The read-back stacks predicates on all
      // three natural columns; the oracle replays them on the source.
      val path = sinkPath(d, "zorder3")
      Sink.writeZOrdered3(
        Tables.events(s, d).select(
          col("event_id"), col("ts"), col("user_id"), col("value")),
        path,
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")),
        col("user_id"), col("value"), files = 16)
      s.read.parquet(path)
        .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp") &&
          col("user_id") >= 100 && col("user_id") < 300 &&
          col("value") >= 10.0 && col("value") < 60.0)
        .agg(count(lit(1)).as("n_rows"),
          round(sum("value"), 2).as("total_value"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
    }),
    "partitioned_sorted" -> ((s, d) => {
      // The composed production layout (Sink.writePartitionedSorted):
      // daily partition dirs (coarse prune) + ts-sorted rows within each
      // day (row-group skip). The read-back stacks both predicates — the
      // `day` bound prunes partitions before any I/O, the finer `ts`
      // bound skips row groups inside the surviving days — and must
      // aggregate identically to the oracle reading the source directly.
      // SinkSpec measures the prune × skip multiplication itself.
      val path = sinkPath(d, "part_sorted")
      Sink.writePartitionedSorted(
        Tables.events(s, d).select(
          col("event_id"), to_date(col("ts")).as("day"), col("ts"), col("value")),
        path, "day", Seq("ts"), files = 16)
      s.read.parquet(path)
        .filter(col("day") >= lit("2024-01-08").cast("date") &&
          col("day") <= lit("2024-01-14").cast("date") &&
          col("ts") >= lit("2024-01-10 06:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-12 18:00:00").cast("timestamp"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum("value"), 2).as("total_value"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
    }),
    "upsert_sink" -> ((s, d) => {
      // Postgres ON CONFLICT DO UPDATE re-expressed as a partition-scoped
      // lake merge (base_assets.py:207): load the base table, apply an
      // update batch (every 100th event re-delivered with value+1000 at
      // version 1), and read the merged table back. Re-running is a no-op —
      // the same idempotence Dagster expects of a partitioned load.
      val path = sinkPath(d, "upsert")
      Sink.reset(path) // self-contained: stale scratch state never leaks in
      val base = Tables.events(s, d).select(
        col("event_id"), to_date(col("ts")).as("day"), col("value"), lit(0).as("version"))
      Sink.upsertPartitioned(s, path, base,
        keys = Seq("event_id"), orderCol = "version", tieBreak = "event_id", partitionCol = "day")
      // update batch bounded to ~¼ of the days: the merge reads and
      // rewrites ONLY those partitions (the actual scale property — a
      // daily load never touches the other 100 TB of table)
      val updates = base
        .filter(pmod(col("event_id"), lit(100L)) === 0 && dayofmonth(col("ts")) <= 7)
        .withColumn("value", col("value") + 1000)
        .withColumn("version", lit(1))
      Sink.upsertPartitioned(s, path, updates,
        keys = Seq("event_id"), orderCol = "version", tieBreak = "event_id", partitionCol = "day")
      s.read.parquet(path).select("event_id", "value")
    }),

    "bucketed_layout" -> ((s, d) => {
      // Pay the shuffle once at write time: both sides bucketed+sorted on
      // the join key, then join + aggregate — the physical plan carries no
      // Exchange on either side (BucketedSpec pins that); the gate verifies
      // the bucketed layout also returns the CORRECT join result.
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
      val c = Tables.customer(s, d).select(
        col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Sink.writeBucketed(o, "orders_bkt", Seq("o_custkey"), 8,
        Some(sinkPath(d, "bkt_orders")))
      Sink.writeBucketed(c, "customer_bkt", Seq("o_custkey"), 8,
        Some(sinkPath(d, "bkt_customer")))
      s.table("orders_bkt").join(s.table("customer_bkt"), Seq("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total_price"))
    }),

    // ---- §E streaming (batch-equivalent plan for the gate) -------------
    "stream_dedup_state" -> ((s, d) => {
      // The streaming dedup-by-key operator (dropDuplicatesWithinWatermark,
      // the stream form of the reference's keyed upsert) in its batch
      // form: every 50th event re-delivered, the SAME transform must
      // collapse each key back to exactly one row. The MemoryStream suite
      // drives the stateful/watermarked behavior; this pins the semantics
      // against DuckDB's DISTINCT.
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      val redelivered = ev.filter(pmod(col("event_id"), lit(50L)) === 0)
      EventStream.dedupStream(ev.unionByName(redelivered))
        .select("event_id")
    }),
    "stream_windowed_counts" -> ((s, d) =>
      EventStream.windowedCounts(Tables.events(s, d))),
    "stream_sliding_counts" -> ((s, d) =>
      // Hopping window (1h window, 30min slide): each event lands in
      // exactly 2 windows. Same plan streams with bounded state
      // (EventStreamSpec); the gate runs it in batch against a DuckDB
      // spine-join oracle.
      EventStream.windowedCounts(Tables.events(s, d), slide = Some("30 minutes"))),
    "stream_sessions" -> ((s, d) =>
      // Declarative sessionization (session_window): per-user sessions
      // that extend while events arrive within 4h of the last and close
      // at last+4h. The gate runs the batch form; DuckDB replays it as
      // gaps-and-islands SQL (LAG + cumulative session counter) — the
      // window-merge semantics (touching windows MERGE; only a gap
      // strictly larger than 4h breaks a session) must agree exactly. EventStreamSpec drives the same plan as a real
      // watermarked stream and pins stream==batch on closed sessions.
      EventStream.sessionWindows(Tables.events(s, d))),
    "stream_correlate" -> ((s, d) => {
      // Click→purchase attribution within 30 minutes per user — the
      // stream-stream interval join (sensors.py's correlation window) in
      // its batch form; both engines run the same interval predicate.
      val ev = Tables.events(s, d)
      EventStream.correlate(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "user_id", "30 minutes")
    }),
    "stream_upsert" -> ((s, d) => {
      // The full sensor loop, actually STREAMING in the gate: two delivery
      // waves into a landing dir, each drained by an AvailableNow run of
      // the file-source → foreachBatch merge (the checkpoint carries the
      // cursor between runs, batchId is the version). Wave 2 re-delivers
      // every 100th event with value+1000 — latest wins in the lake table.
      val base = sinkPath(d, "stream_upsert")
      val (landing, tbl, ckpt) = (s"$base/landing", s"$base/table", s"$base/ckpt")
      Sink.reset(base)
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      ev.write.parquet(landing)
      EventStream.upsertStream(s, landing, tbl, ckpt, availableNow = true)
        .awaitTermination()
      ev.filter(pmod(col("event_id"), lit(100L)) === 0)
        .withColumn("value", col("value") + 1000)
        .write.mode("append").parquet(landing)
      EventStream.upsertStream(s, landing, tbl, ckpt, availableNow = true)
        .awaitTermination()
      s.read.parquet(tbl).select("event_id", "value")
    }),
    "stream_jsonl_ingest" -> ((s, d) => {
      // The corpus boundary as a STREAM: the JSONL landing prefix (with
      // the same two planted corrupt lines as jsonl_ingest) drained by an
      // AvailableNow run of the quarantined parse, maxFilesPerTrigger=2
      // forcing several real micro-batches; foreachBatch appends each
      // batch's ingest profile as telemetry. The gate rolls the telemetry
      // up — counts and char-sums are decomposable, so the rollup must
      // equal the batch profile EXACTLY no matter how the drain was
      // split into batches (batch-split independence), pinned by the same
      // oracle as jsonl_ingest.
      val base = sinkPath(d, "stream_jsonl")
      val (landing, out, ckpt) = (s"$base/landing", s"$base/out", s"$base/ckpt")
      Sink.reset(base)
      Jsonl.write(Tables.documents(s, d), landing)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(landing, "zz-corrupt.json"),
        java.util.Arrays.asList(
          """{"doc_id": 1, "text": "unterminated""",
          """this is not json"""))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id long, text string, lang string, source string, n_chars long")
      Jsonl.readStream(s, landing, schema, maxFilesPerTrigger = 2)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          Jsonl.ingestProfile(batch, "lang", "n_chars")
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(out)
        }
        .start().awaitTermination()
      s.read.parquet(out).groupBy("lang", "is_corrupt")
        .agg(sum("n_docs").as("n_docs"), sum("total_chars").as("total_chars"))
    }),
    "stream_incremental" -> ((s, d) => {
      // The incremental refresh loop ACTUALLY STREAMING — the production
      // shape: the planted two-version delta arrives as two crawler
      // waves (doc_id, op, text) in a landing dir, each drained by an
      // AvailableNow run (maxFilesPerTrigger=1, checkpointed cursor —
      // the E7 delivery discipline), and each micro-batch advances ALL
      // the carried state delta-bound: raw corpus lake (touched shard
      // dirs only), packed lake (Incremental.refreshInPlace), ledger
      // rollforward. Every refresh equals the batch rebuild over its
      // intermediate version by the Incremental contract, so the final
      // lake equals the rebuild over version 2 NO MATTER how the delta
      // splits into waves — the same incrRebuildSql oracle as
      // incremental_pipeline/incremental_sink, now proving the
      // STREAMING write path.
      val (prev, curr) = incrCorpus(s, d)
      val base = sinkPath(d, "stream_incremental")
      val (landing, raw, packed, ledger, ckpt) =
        (s"$base/landing", s"$base/raw", s"$base/packed",
          s"$base/ledger", s"$base/ckpt")
      Sink.reset(base)
      IncrementalStream.bootstrap(prev, raw, packed, ledger,
        "doc_id", "text", incrKeep,
        maxTokens = 32, overlap = 8, budget = 256L, shards = 64, incrShard)
      val waves = Snapshot.diff(prev, curr, "doc_id", "text")
        .select(col("doc_id"),
          when(col("status") === "removed", lit("delete"))
            .otherwise(lit("upsert")).as("op"))
        .join(curr.select(col("doc_id"), col("text")), Seq("doc_id"), "left")
        .select(col("doc_id"), col("op"), col("text"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id long, op string, text string")
      def drain(): Unit =
        IncrementalStream.refreshStream(s, landing, schema, raw, packed,
          ledger, ckpt, "doc_id", "text", incrKeep,
          maxTokens = 32, overlap = 8, budget = 256L, shards = 64,
          incrShard).awaitTermination()
      waves.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 0)
        .coalesce(1).write.mode("append").parquet(landing)
      drain()
      waves.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 1)
        .coalesce(1).write.mode("append").parquet(landing)
      drain()
      s.read.parquet(packed).select(
        col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("shard").cast("int").as("shard"), col("seq_id"))
    }),
    "stream_scrub" -> ((s, d) => {
      // The frequency-delta scrub refresh ACTUALLY STREAMING (ScrubStream)
      // — the four-lake loop: the same planted scrub delta arrives as two
      // crawler waves, and each checkpointed micro-batch rewrites ONLY
      // the touched partitions of the raw corpus lake, the window
      // posting index (doc-keyed shards), the frequency table (whash
      // buckets), and the scrub output lake. Every replacement row-set
      // is staged before any lake overwrite (the refresh plan reads the
      // pre-wave lakes). The waves split the delta by id parity, so
      // BOTH df-crossing ripples land in different micro-batches than
      // some of their holders — and the drained scrub lake must still
      // equal the batch spanScrub over version 2: the same oracle as
      // incremental_scrub, now through the streaming four-lake path.
      val (prev, curr) = scrubCorpus(s, d)
      val base = sinkPath(d, "stream_scrub")
      val (landing, raw, wins, dfl, scrub, ckpt) =
        (s"$base/landing", s"$base/raw", s"$base/wins",
          s"$base/df", s"$base/scrub", s"$base/ckpt")
      Sink.reset(base)
      val shardOf: Column => Column = k =>
        conv(substring(md5(k.cast("string")), 1, 4), 16, 10).cast("long") % 64
      graft.streaming.ScrubStream.bootstrap(prev, raw, wins, dfl, scrub,
        "doc_id", "text", window = 8, minDf = 2, hashBuckets = 32, shardOf)
      val waves = Snapshot.diff(prev, curr, "doc_id", "text")
        .select(col("doc_id"),
          when(col("status") === "removed", lit("delete"))
            .otherwise(lit("upsert")).as("op"))
        .join(curr.select(col("doc_id"), col("text")), Seq("doc_id"), "left")
        .select(col("doc_id"), col("op"), col("text"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id long, op string, text string")
      def drain(): Unit =
        graft.streaming.ScrubStream.refreshStream(s, landing, schema, raw,
          wins, dfl, scrub, ckpt, "doc_id", "text", window = 8, minDf = 2,
          hashBuckets = 32, shardOf).awaitTermination()
      waves.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 0)
        .coalesce(1).write.mode("append").parquet(landing)
      drain()
      waves.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 1)
        .coalesce(1).write.mode("append").parquet(landing)
      drain()
      s.read.parquet(scrub).select(col("id").as("doc_id"),
        md5(col("scrubbed_text")).as("scrub_hash"),
        col("n_tokens"), col("n_removed"))
    }),
    "stream_lm_score" -> ((s, d) => {
      // LM model SERVING on a stream: the bigram model trains and
      // persists ONCE from the corpus, then two parquet delivery waves
      // of fresh crawl docs (jittered corpus derivatives with planted
      // OOV tails + two wholly-novel docs) drain through checkpointed
      // AvailableNow runs, each micro-batch scored via the backoff
      // ladder against the STATIC model frames. Scores are per-doc
      // functions of (doc, model), so the drained lake must equal the
      // batch scoreAgainst over the same docs no matter the wave/batch
      // split — the oracle replays exactly that in SQL.
      import s.implicits._
      val base = sinkPath(d, "stream_lm_score")
      val (landing, out, ckpt) = (s"$base/landing", s"$base/out", s"$base/ckpt")
      Sink.reset(base)
      val docs = Tables.documents(s, d)
      val (model, margins, vocab) =
        NgramLm.servingFrames(docs, "doc_id", "text")
      Seq(model, margins, vocab).foreach(_.persist())
      val probes = docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" qq zz qq zz")).as("text"))
      val novels = Seq(
        (4000000L, "wholly novel planted stream document zyx about" +
          " nothing previously modeled qqj at all"),
        (4000001L, "another genuinely novel planted document kvw" +
          " carrying entirely fresh content pqz never scored before"))
        .toDF("doc_id", "text")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id long, text string")
      probes.filter(col("doc_id") < 3000005L)
        .repartition(2).write.mode("append").parquet(landing)
      EventStream.lmScoreStream(s, landing, schema, model, margins, vocab,
        "doc_id", "text", out, ckpt, maxFilesPerTrigger = 1)
        .awaitTermination()
      probes.filter(col("doc_id") >= 3000005L).unionByName(novels)
        .repartition(2).write.mode("append").parquet(landing)
      EventStream.lmScoreStream(s, landing, schema, model, margins, vocab,
        "doc_id", "text", out, ckpt, maxFilesPerTrigger = 1)
        .awaitTermination()
      Seq(model, margins, vocab).foreach(_.unpersist())
      s.read.parquet(out)
    }),
    "stream_novelty" -> ((s, d) => {
      // The incremental-crawl near-dup gate ACTUALLY STREAMING: the same
      // planted probes as novelty_near_dup arrive as two parquet delivery
      // waves, each drained by an AvailableNow run of the stream-static
      // banded probe (maxFilesPerTrigger=1 forces real micro-batches; the
      // checkpoint carries the cursor between runs). The corpus signature
      // index is built and persisted ONCE before the drain — micro-batches
      // pay only their own banding + the skinny probe join. Verdicts are
      // per-doc functions of (doc, index), so the drained output must
      // equal the batch form no matter the wave/batch split — the same
      // golden planted-probe rows as novelty_near_dup.
      import s.implicits._
      val base = sinkPath(d, "stream_novelty")
      val (landing, out, ckpt) = (s"$base/landing", s"$base/out", s"$base/ckpt")
      Sink.reset(base)
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") < 250).select("doc_id", "text")
      val index = Dedup.buildSignatureIndex(corpus, "doc_id", "text")
      val jittered = corpus.filter(col("doc_id") < 10)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" crawl jitter suffix pad")).as("text"))
      val novel = Seq(
        (4000000L, "wholly novel planted crawl document zyx about nothing" +
          " previously indexed qqj in this corpus at all"),
        (4000001L, "another genuinely novel planted document kvw carrying" +
          " entirely fresh content pqz never crawled before"))
        .toDF("doc_id", "text")
      // wave 1: half the jittered probes; wave 2: the rest + the novels —
      // a cross-wave split of the SAME probe family, so a verdict that
      // depended on wave composition would diverge from the golden rows
      jittered.filter(col("doc_id") < 3000005L)
        .repartition(2).write.mode("append").parquet(landing)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id long, text string")
      EventStream.noveltyStream(s, landing, schema, index, "doc_id", "text",
        out, ckpt, threshold = 0.7, maxFilesPerTrigger = 1).awaitTermination()
      jittered.filter(col("doc_id") >= 3000005L).unionByName(novel)
        .repartition(2).write.mode("append").parquet(landing)
      EventStream.noveltyStream(s, landing, schema, index, "doc_id", "text",
        out, ckpt, threshold = 0.7, maxFilesPerTrigger = 1).awaitTermination()
      s.read.parquet(out).filter(col("doc_id") >= 3000000L)
        .select("doc_id", "is_novel")
    })
  )

  /** Corpus for the ANN recall gates: the embeddings table plus three
    * deterministically-jittered near-copies of each query vector (ids
    * q+1M/q+2M/q+3M, per-component hash noise ±0.005) — planted true
    * neighbors the ANN tiers must recover. Returns (corpus, queries). */
  /** The full batch rebuild over corpus version 2, replayed end-to-end
    * in DuckDB (normalize chain, min-id dedup, three keep rules, chunk
    * boundaries, md5 doc-sharding, the greedy packer as a recursive
    * CTE) — the oracle BOTH incremental gates must equal: the repack
    * frame (`incremental_pipeline`) and the refreshed lake tree
    * (`incremental_sink`). */
  /** The batch spanScrub replayed over scrub corpus version 2 in DuckDB
    * — the oracle BOTH scrub refresh gates must equal: the frame form
    * (`incremental_scrub`) and the streamed four-lake form
    * (`stream_scrub`). */
  private val oracleSqlScrubBatch: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
         curr AS (
           SELECT doc_id,
             CASE WHEN doc_id BETWEEN 20 AND 29 AND doc_id <> 25
                    THEN text || ' alpha boiler plate marker tokens' ||
                      ' repeat across many docs here'
                  WHEN doc_id = 30
                    THEN text || ' beta shared footer appears exactly' ||
                      ' twice in the whole corpus'
                  WHEN doc_id = 40
                    THEN text || ' gamma unique notice present once' ||
                      ' until the refresh adds another'
                  ELSE text END AS text
           FROM base WHERE doc_id <> 31
           UNION ALL
           SELECT 7000001, text || ' gamma unique notice present once' ||
             ' until the refresh adds another'
           FROM base WHERE doc_id = 80
           UNION ALL
           SELECT 7000002, text || ' plain fresh addition suffix'
           FROM base WHERE doc_id = 81),
         t AS (SELECT doc_id,
                 string_split_regex(trim(text), '\s+') AS toks FROM curr),
         winstr AS (
           SELECT doc_id, n, st, array_to_string(toks[st:st+7], ' ') AS wstr
           FROM (SELECT doc_id, toks, len(toks) AS n,
                   CAST(unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                     AS INT) AS st
                 FROM t)),
         rep AS (SELECT wstr FROM winstr GROUP BY wstr HAVING count(*) >= 2),
         repst AS (
           SELECT doc_id, st, least(st + 7, n) AS en
           FROM winstr WHERE wstr IN (SELECT wstr FROM rep)),
         post AS (
           SELECT doc_id, p, toks[p] AS tok
           FROM (SELECT doc_id, toks,
                   CAST(unnest(generate_series(1, len(toks))) AS INT) AS p
                 FROM t)),
         covered AS (
           SELECT DISTINCT x.doc_id, x.p FROM post x JOIN repst r
             ON r.doc_id = x.doc_id AND x.p BETWEEN r.st AND r.en),
         scrub AS (
           SELECT x.doc_id, string_agg(x.tok, ' ' ORDER BY x.p) AS s
           FROM post x LEFT JOIN covered cv
             ON cv.doc_id = x.doc_id AND cv.p = x.p
           WHERE cv.p IS NULL
           GROUP BY x.doc_id),
         nrem AS (SELECT doc_id, count(*) AS nr FROM covered GROUP BY doc_id)
         SELECT t.doc_id, md5(coalesce(s.s, '')) AS scrub_hash,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(nr.nr, 0) AS BIGINT) AS n_removed
         FROM t LEFT JOIN scrub s USING (doc_id)
           LEFT JOIN nrem nr USING (doc_id)"""

  private val incrRebuildSql: String =
    """WITH RECURSIVE
         base AS (SELECT doc_id, text FROM documents),
         curr AS (
           SELECT doc_id,
             CASE WHEN doc_id = 55 THEN 'short 1234'
                  WHEN doc_id = 35 THEN
                    (SELECT text FROM base WHERE doc_id = 66)
                  WHEN doc_id BETWEEN 50 AND 59
                    THEN text || ' updated revision marker'
                  ELSE text END AS text
           FROM base
           WHERE NOT (doc_id BETWEEN 40 AND 49)
             AND NOT (doc_id BETWEEN 60 AND 62)
           UNION ALL
           SELECT doc_id + 1000000, text FROM base
           WHERE doc_id BETWEEN 60 AND 64
           UNION ALL
           SELECT doc_id + 2000000, text || ' fresh addition marker'
           FROM base WHERE doc_id BETWEEN 80 AND 89
           UNION ALL
           SELECT doc_id + 2000000, text FROM base WHERE doc_id = 90),
         norm AS (
           SELECT doc_id,
             lower(trim(regexp_replace(regexp_replace(nfc_normalize(text),
               '\s+', ' ', 'g'), '[\x00-\x1f]', '', 'g'))) AS t
           FROM curr),
         ded AS (
           SELECT doc_id, t,
             row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) AS rn
           FROM norm),
         kept AS (
           SELECT doc_id, t FROM ded
           WHERE rn = 1
             AND length(t) >= 100
             AND length(regexp_replace(t, '[^0-9]', '', 'g')) * 1.0
                 / greatest(length(t), 1) <= 0.2
             AND length(regexp_replace(t, '\s+', '', 'g')) * 1.0
                 / greatest(len(string_split_regex(trim(t), '\s+')), 1)
                 BETWEEN 3 AND 12),
         c AS (
           SELECT doc_id, toks,
             CAST(unnest(generate_series(1, greatest(len(toks) - 8, 1), 24))
               AS INT) AS st
           FROM (SELECT doc_id, string_split_regex(trim(t), '\s+') AS toks
                 FROM kept)),
         ch AS (
           SELECT doc_id * 1000000 + CAST((st - 1) / 24 AS INT) AS chunk_key,
             len(toks[st:st+31])::BIGINT AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 64
               AS shard
           FROM c),
         ordered AS (
           SELECT shard, chunk_key, n_tokens,
             row_number() OVER (PARTITION BY shard ORDER BY chunk_key) AS rnp
           FROM ch),
         pack AS (
           SELECT shard, chunk_key, n_tokens, rnp,
             CAST(0 AS BIGINT) AS seq, LEAST(n_tokens, 256) AS used
           FROM ordered WHERE rnp = 1
           UNION ALL
           SELECT o.shard, o.chunk_key, o.n_tokens, o.rnp,
             CASE WHEN p.used + o.n_tokens > 256 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n_tokens > 256 THEN LEAST(o.n_tokens, 256)
                  ELSE p.used + LEAST(o.n_tokens, 256) END
           FROM pack p JOIN ordered o
             ON o.shard = p.shard AND o.rnp = p.rnp + 1)
         SELECT CAST(chunk_key // 1000000 AS BIGINT) AS doc_id,
           CAST(chunk_key % 1000000 AS INT) AS chunk_id,
           n_tokens, CAST(shard AS INT) AS shard, seq AS seq_id
         FROM pack"""

  /** The planted two-version corpus shared by `incremental_pipeline`
    * (frame form) and `incremental_sink` (lake form) — removals, edits,
    * a filter-failing edit, a content-collision demotion, dup-partner
    * promotions, fresh adds, an added exact dup; both engines replay the
    * construction from the documents table. */
  private def incrCorpus(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val partners = base.filter(col("doc_id").between(60, 64))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val prev = base.unionByName(partners)
    val t66 = base.filter(col("doc_id") === 66)
      .select(col("text").as("__t66"))
    val currBase = base
      .filter(!col("doc_id").between(40, 49) &&
        !col("doc_id").between(60, 62))
      .crossJoin(broadcast(t66))
      .select(col("doc_id"),
        when(col("doc_id") === 55, lit("short 1234"))
          .when(col("doc_id") === 35, col("__t66"))
          .when(col("doc_id").between(50, 59),
            concat(col("text"), lit(" updated revision marker")))
          .otherwise(col("text")).as("text"))
    val added = base.filter(col("doc_id").between(80, 89))
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" fresh addition marker")).as("text"))
    val addedDup = base.filter(col("doc_id") === 90)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    (prev, currBase.unionByName(partners).unionByName(added)
      .unionByName(addedDup))
  }

  /** The planted two-version scrub corpus shared by `incremental_scrub`
    * (frame form) and `stream_scrub` (streamed four-lake form): tailA on
    * 20-29 (df 10, one holder edited away — no crossing), tailB on 30+31
    * (df 2; removing 31 RESTORES untouched 30), tailC on 40 (df 1; an
    * added re-crawl lifts it to 2 and CUTS untouched 40), plus a plain
    * fresh addition. */
  private def scrubCorpus(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val tailA = lit(" alpha boiler plate marker tokens repeat" +
      " across many docs here")
    val tailB = lit(" beta shared footer appears exactly twice" +
      " in the whole corpus")
    val tailC = lit(" gamma unique notice present once until" +
      " the refresh adds another")
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val prev = base.select(col("doc_id"),
      when(col("doc_id").between(20, 29), concat(col("text"), tailA))
        .when(col("doc_id") === 30 || col("doc_id") === 31,
          concat(col("text"), tailB))
        .when(col("doc_id") === 40, concat(col("text"), tailC))
        .otherwise(col("text")).as("text"))
    val curr = base.filter(col("doc_id") =!= 31).select(col("doc_id"),
      when(col("doc_id").between(20, 29) && col("doc_id") =!= 25,
          concat(col("text"), tailA))
        .when(col("doc_id") === 30, concat(col("text"), tailB))
        .when(col("doc_id") === 40, concat(col("text"), tailC))
        .otherwise(col("text")).as("text"))
      .unionByName(base.filter(col("doc_id") === 80)
        .select(lit(7000001L).as("doc_id"),
          concat(col("text"), tailC).as("text")))
      .unionByName(base.filter(col("doc_id") === 81)
        .select(lit(7000002L).as("doc_id"),
          concat(col("text"), lit(" plain fresh addition suffix"))
            .as("text")))
    (prev, curr)
  }

  /** word-soup corpus: same three keep rules as corpus_pipeline */
  private val incrKeep: Column => Column = t => TextOps.corpusFilterRules(t)
    .collect { case (n, r) if n != "no_terminal_punct" => r }
    .reduce(_ && _)

  /** doc-keyed md5 sharding: a doc's chunks colocate (contiguous training
    * reads), the affected-shard count is bounded by the touched-doc
    * count, and md5-prefix arithmetic lets DuckDB replay the routing */
  private val incrShard: Column => Column = k =>
    conv(substring(md5(k.cast("string")), 1, 4), 16, 10).cast("long") % 64

  /** The D29 packed token stream (documents → trained-BPE ids → greedy
    * packing → (shard, seq_id, pos, token_id)), shared by the
    * `packed_token_stream` gate and the `token_stream_export` sink
    * composition. Budget 512, 4 shards, md5-prefix shard routing so a
    * second engine replays the assignment. */
  private def packedStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val merges = trainedMerges(s, d, 16)
    val withIds = docs
      .select(col("doc_id"), Bpe.encodeCol(col("text"), merges).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .filter(col("n_tokens") > 0)
    val shardCol = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long") % 4
    val assigned = Packing.packSequences(
      withIds.select("doc_id", "n_tokens"), "doc_id", "n_tokens",
      budget = 512, shards = 4, shardOn = Some(shardCol))
    val w = Window.partitionBy("shard", "seq_id").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    assigned
      .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .join(withIds.select(col("doc_id").as("id"), col("ids")), Seq("id"))
      .select(col("shard").cast("long").as("shard"),
        col("seq_id"), col("offset"),
        posexplode(col("ids")))
      .select(col("shard"), col("seq_id"),
        (col("offset") + col("pos")).cast("long").as("pos"),
        col("col").as("token_id"))
  }

  /** The D29 stream with document separators — the convention every real
    * trainer uses (`doc₁ EOS doc₂ EOS …`): each doc's tokens are followed
    * by one reserved EOS id (256 byte-level base ids + 16 trained merges
    * ⇒ 272 is the first free id), the packer reserves one budget slot per
    * doc (`perDocOverhead = 1`), and offsets advance by n_tokens + 1.
    * Same scale shape as [[packedStream]]. */
  private def packedStreamEos(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eosId = 272
    val docs = Tables.documents(s, d)
    val merges = trainedMerges(s, d, 16)
    val withIds = docs
      .select(col("doc_id"), Bpe.encodeCol(col("text"), merges).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .filter(col("n_tokens") > 0)
    val shardCol = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long") % 4
    val assigned = Packing.packSequences(
      withIds.select("doc_id", "n_tokens"), "doc_id", "n_tokens",
      budget = 512, shards = 4, shardOn = Some(shardCol),
      perDocOverhead = 1L)
    val w = Window.partitionBy("shard", "seq_id").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    assigned
      .withColumn("offset",
        coalesce(sum(col("n_tokens") + lit(1L)).over(w), lit(0L)))
      .join(withIds.select(col("doc_id").as("id"), col("ids")), Seq("id"))
      .select(col("shard").cast("long").as("shard"),
        col("seq_id"), col("offset"),
        posexplode(concat(col("ids"), array(lit(eosId)))))
      .select(col("shard"), col("seq_id"),
        (col("offset") + col("pos")).cast("long").as("pos"),
        col("col").as("token_id"))
  }

  private def plantedAnnCorpus(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 8)
    val planted = (1 to 3).map { j =>
      q.select(
        (col("vec_id") + lit(j * 1000000L)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + ((pmod(xxhash64(col("vec_id"), i, lit(j)), lit(1000L)).cast("float")
            - lit(500.0f)) / lit(100000.0f)))
          // the jitter arithmetic widens to double; the corpus union must
          // keep the table's array<float> element type
          .cast("array<float>").as("embedding"))
    }.reduce(_ unionByName _)
    (emb.unionByName(planted), q)
  }

  /** Per-query recall of an ANN result against the brute-force ground
    * truth: (query_id, n_hits, recall_ok). The truth side is the spine so
    * a query with zero hits still yields a (visible, failing) row. */
  private def annRecall(truth: DataFrame, ann: DataFrame, minHits: Int): DataFrame = {
    val hits = truth.select("query_id", "vec_id")
      .join(ann.select("query_id", "vec_id"), Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("__h"))
    truth.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("__h"), lit(0L)).as("n_hits"),
        (coalesce(col("__h"), lit(0L)) >= minHits).as("recall_ok"))
  }

  /** Deterministic per-dataset scratch location for sink roundtrips (the
    * sink queries are self-contained: write then read back). */
  private def sinkPath(d: String, tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_sink_${tag}_${math.abs(d.hashCode)}"

  /** One SQL text, two engines (Spark via registerTables, DuckDB oracle). */
  private val SqlApiQuery =
    """WITH g AS (
         SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
         FROM events GROUP BY 1, 2)
       SELECT event_type, day, cnt FROM (
         SELECT event_type, day, cnt,
           rank() OVER (PARTITION BY event_type ORDER BY cnt DESC, day ASC) AS rnk
         FROM g) t
       WHERE rnk <= 3"""

  def oracleSql: Map[String, String] = Map(
    "sketch_profile" ->
      // DuckDB supplies the EXACT distinct/percentiles; the _ok flags pin
      // that Spark's sketches landed inside their error bands.
      """SELECT event_type, count(*) AS n_rows,
         count(DISTINCT user_id) AS exact_distinct, TRUE AS distinct_ok,
         round(quantile_cont(value, 0.5), 4) AS p50, TRUE AS p50_ok,
         round(quantile_cont(value, 0.95), 4) AS p95, TRUE AS p95_ok,
         round(quantile_cont(value, 0.99), 4) AS p99, TRUE AS p99_ok
         FROM events GROUP BY event_type""",
    "stream_dedup_state" ->
      // re-delivered copies must collapse back to one row per key
      """SELECT event_id FROM events""",
    "ivf_topk_broadcast" ->
      // golden parity: broadcast-centroid IVF returns exactly the
      // literal-matrix IVF's (query, neighbor, rank) set — 8 queries × 5
      // neighbors, zero disagreements in either direction
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(40 AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch""",
    "multimodal_frames" ->
      // full replay: UTF-8 byte length and the evenly-spaced offset
      // arithmetic are engine-portable (encode → BLOB octet_length)
      """SELECT doc_id AS asset_id,
           CAST(i AS INTEGER) AS frame_index,
           CAST(floor(i * octet_length(encode(text)) / 4.0) AS BIGINT)
             AS byte_offset
         FROM documents CROSS JOIN (SELECT range AS i FROM range(0, 4)) t""",
    "multimodal_golden" ->
      // golden rows: REAL PNG render + ImageIO decode — claimed dims,
      // decoded dims, band count, pixel-stat feature hash, and resize
      // plan are pure deterministic functions of the corpus; the
      // hash/decoder pieces have no DuckDB mirror to recompute against
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(asset_id AS BIGINT) AS asset_id, mime,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(decoded_width AS INTEGER) AS decoded_width,
           CAST(decoded_height AS INTEGER) AS decoded_height,
           CAST(channels AS INTEGER) AS channels,
           CAST(feature_hash AS BIGINT) AS feature_hash,
           CAST(scale AS DOUBLE) AS scale,
           CAST(dst_width AS INTEGER) AS dst_width,
           CAST(dst_height AS INTEGER) AS dst_height
         FROM (VALUES
           (0, 'image/png', 89, 80, 21513, 89, 80, 3,  8111064614580237344, 0.719101, 64, 57),
           (1, 'image/png', 34, 93,  9647, 34, 93, 3, -4711019057112965275, 0.688172, 23, 64),
           (2, 'image/png', 57, 35,  6088, 57, 35, 3, -1581139355009805544, 1.0,      57, 35),
           (3, 'image/png', 94, 57, 16199, 94, 57, 3,  2281525233769789840, 0.680851, 64, 38),
           (4, 'image/png', 62, 23,  4369, 62, 23, 3,  4443404239234293832, 1.0,      62, 23),
           (5, 'image/png', 48, 47,  6883, 48, 47, 3, -8241910020716912126, 1.0,      48, 47),
           (6, 'image/png', 72, 81, 17650, 72, 81, 3,  8414626735775590888, 0.790123, 56, 64),
           (7, 'image/png', 60, 57, 10385, 60, 57, 3,  8998926091928995417, 1.0,      60, 57),
           (8, 'image/png', 94, 40, 11388, 94, 40, 3,  7250246917149063029, 0.680851, 64, 27),
           (9, 'image/png', 73, 90, 19873, 73, 90, 3, -2293091748645264245, 0.711111, 51, 64))
           t(asset_id, mime, width, height, n_bytes, decoded_width,
             decoded_height, channels, feature_hash, scale, dst_width,
             dst_height)""",
    "multimodal_audio" ->
      // full replay: the WAV claim is portable integer arithmetic (rate
      // by id%4, channels by id%2, frames from the UTF-8 byte length,
      // container size 44 + 2*ch*frames) and the Spark side emits the
      // DECODED values — so the decoder must land on exactly what this
      // SQL recomputes from (doc_id, text)
      """SELECT CAST(doc_id AS BIGINT) AS asset_id,
           'audio/wav' AS mime,
           CAST(CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 8000 WHEN 1 THEN 16000
             WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
           CAST(1 + doc_id % 2 AS INTEGER) AS channels,
           CAST(16 AS INTEGER) AS bits,
           CAST(200 + octet_length(encode(text)) % 800 AS INTEGER) AS n_frames,
           CAST(44 + 2 * (1 + doc_id % 2)
             * (200 + octet_length(encode(text)) % 800) AS INTEGER) AS n_bytes,
           CAST(CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 8000 WHEN 1 THEN 16000
             WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS decoded_rate,
           CAST(1 + doc_id % 2 AS INTEGER) AS decoded_channels,
           CAST(16 AS INTEGER) AS decoded_bits,
           CAST(200 + octet_length(encode(text)) % 800 AS INTEGER) AS decoded_frames,
           CAST(floor((200 + octet_length(encode(text)) % 800) * 1000.0
             / (CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 22050 ELSE 44100 END)) AS BIGINT) AS duration_ms
         FROM documents""",
    "multimodal_audio_golden" ->
      // golden rows: the PCM content (LCG stream from the content hash)
      // has no DuckDB mirror, so its per-channel decoded statistics —
      // RMS, peak, zero-crossing fraction, mean — are pinned as a stat
      // hash for docs 0-9, like the image path's pixel-stat hash
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(asset_id AS BIGINT) AS asset_id,
           CAST(sample_rate AS INTEGER) AS sample_rate,
           CAST(channels AS INTEGER) AS channels,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(decoded_frames AS INTEGER) AS decoded_frames,
           CAST(duration_ms AS BIGINT) AS duration_ms,
           CAST(feature_hash AS BIGINT) AS feature_hash
         FROM (VALUES
           (0,  8000, 1, 357,  758, 357, 44,   815121319884340546),
           (1, 16000, 2, 606, 2468, 606, 37, -3148908133331053719),
           (2, 22050, 1, 446,  936, 446, 20, -5293170672678635246),
           (3, 44100, 2, 347, 1432, 347,  7,  8559689264207827434),
           (4,  8000, 1, 450,  944, 450, 56,  -400488883237690492),
           (5, 16000, 2, 514, 2100, 514, 32, -5795136047979769872),
           (6, 22050, 1, 278,  600, 278, 12,  3927127478119751467),
           (7, 44100, 2, 602, 2452, 602, 13,  6416014312636385517),
           (8,  8000, 1, 670, 1384, 670, 83,  3341146344092371091),
           (9, 16000, 2, 591, 2408, 591, 36,  1440306457218818036))
           t(asset_id, sample_rate, channels, n_frames, n_bytes,
             decoded_frames, duration_ms, feature_hash)""",
    "multimodal_video" ->
      // full replay: the GIF claim is portable integer arithmetic
      // (width/height from the id, frame count from the UTF-8 byte
      // length, frame interval by id%3) and the Spark side emits the
      // DECODED values plus the stride-1 sample count — so the GIF
      // writer, the reader, and the GraphicControlExtension delay
      // round-trip must all land on exactly what this SQL recomputes
      // from (doc_id, text)
      """SELECT CAST(doc_id AS BIGINT) AS asset_id,
           'image/gif' AS mime,
           CAST(8 + doc_id % 24 AS INTEGER) AS width,
           CAST(8 + (doc_id // 5) % 24 AS INTEGER) AS height,
           CAST(2 + octet_length(encode(text)) % 6 AS INTEGER) AS n_frames,
           CAST(40 * (1 + doc_id % 3) AS INTEGER) AS frame_ms,
           CAST(2 + octet_length(encode(text)) % 6 AS INTEGER) AS decoded_frames,
           CAST(2 + octet_length(encode(text)) % 6 AS INTEGER) AS sampled_frames,
           CAST(8 + doc_id % 24 AS INTEGER) AS decoded_width,
           CAST(8 + (doc_id // 5) % 24 AS INTEGER) AS decoded_height,
           CAST(40 * (1 + doc_id % 3) AS INTEGER) AS decoded_frame_ms
         FROM documents""",
    "multimodal_video_golden" ->
      // golden rows: the frame pixel content (LCG stream) has no DuckDB
      // mirror, so the per-frame decoded gray statistics are pinned as a
      // stat hash per sampled frame for docs 0-9
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(asset_id AS BIGINT) AS asset_id,
           CAST(frame_index AS INTEGER) AS frame_index,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(decoded_width AS INTEGER) AS decoded_width,
           CAST(decoded_height AS INTEGER) AS decoded_height,
           CAST(decoded_frame_ms AS INTEGER) AS decoded_frame_ms,
           CAST(stat_hash AS BIGINT) AS stat_hash
         FROM (VALUES
           (0, 0, 3, 1070, 8, 8, 40, -1159167218004833632),
           (0, 1, 3, 1070, 8, 8, 40, -1546492509488213353),
           (0, 2, 3, 1070, 8, 8, 40, -2010878157879447441),
           (1, 0, 6, 1410, 9, 8, 80, -795829864584883893),
           (1, 1, 6, 1410, 9, 8, 80, -866852766321976470),
           (1, 2, 6, 1410, 9, 8, 80, 8413007321690067687),
           (1, 3, 6, 1410, 9, 8, 80, -6344610664508507367),
           (1, 4, 6, 1410, 9, 8, 80, -1240898395721868525),
           (1, 5, 6, 1410, 9, 8, 80, -6213456460328992647),
           (2, 0, 2, 1010, 10, 8, 120, -6633046815221518015),
           (2, 1, 2, 1010, 10, 8, 120, 438822179085019751),
           (3, 0, 5, 1397, 11, 8, 40, 5336018104013120779),
           (3, 1, 5, 1397, 11, 8, 40, 5078118319221794239),
           (3, 2, 5, 1397, 11, 8, 40, -6272666110155757850),
           (3, 3, 5, 1397, 11, 8, 40, -2241848540913760882),
           (3, 4, 5, 1397, 11, 8, 40, -835631986725216175),
           (4, 0, 6, 1574, 12, 8, 80, 3476966573548996982),
           (4, 1, 6, 1574, 12, 8, 80, -4703820412808631804),
           (4, 2, 6, 1574, 12, 8, 80, -7469215199507856537),
           (4, 3, 6, 1574, 12, 8, 80, -6277602869820142155),
           (4, 4, 6, 1574, 12, 8, 80, 6081024030547605380),
           (4, 5, 6, 1574, 12, 8, 80, -466405748612098353),
           (5, 0, 4, 1402, 13, 9, 120, 3110912669842711912),
           (5, 1, 4, 1402, 13, 9, 120, -9121203659895500952),
           (5, 2, 4, 1402, 13, 9, 120, -6187311024440860274),
           (5, 3, 4, 1402, 13, 9, 120, -1483987272763522223),
           (6, 0, 2, 1112, 14, 9, 40, 8094966525662891366),
           (6, 1, 2, 1112, 14, 9, 40, 8507218394217963570),
           (7, 0, 2, 1134, 15, 9, 80, -4095237251491965018),
           (7, 1, 2, 1134, 15, 9, 80, 4607388956285829518),
           (8, 0, 4, 1525, 16, 9, 120, 7425530904890031179),
           (8, 1, 4, 1525, 16, 9, 120, -4066688147968010318),
           (8, 2, 4, 1525, 16, 9, 120, -7510166789537521340),
           (8, 3, 4, 1525, 16, 9, 120, -1592461599722943787),
           (9, 0, 3, 1370, 17, 9, 40, -604011673506681429),
           (9, 1, 3, 1370, 17, 9, 40, -2152566729713050997),
           (9, 2, 3, 1370, 17, 9, 40, -8073999650034763562))
           t(asset_id, frame_index, n_frames, n_bytes, decoded_width,
             decoded_height, decoded_frame_ms, stat_hash)""",
    "fingerprint" ->
      // golden rows: the fingerprints are pure deterministic functions of
      // the (fixed, seed=42) corpus — pinned once, any drift in
      // tokenization, xxhash64 seeding, or the rolling-hash fold breaks
      // the compare (xxhash64 has no DuckDB mirror to recompute against)
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(rolling_hash AS BIGINT) AS rolling_hash,
           CAST(content_minhash AS BIGINT) AS content_minhash,
           CAST(n_tokens AS INTEGER) AS n_tokens
         FROM (VALUES
           (0, 1248500283, 128989048, 32),
           (1,  442491546,  60886368, 72),
           (2,  842094431,  60886368, 45),
           (3, 1906784676, 102299716, 27),
           (4, 1849330719,  60886368, 45),
           (5, 1743147755,  60886368, 56),
           (6,  972709475, 128989048, 15),
           (7,   32345893,  60886368, 72),
           (8, 1426928247,  60886368, 84),
           (9,  110925171,  60886368, 74))
           t(doc_id, rolling_hash, content_minhash, n_tokens)""",
    "ivf_opq_rerank" ->
      // golden hit counts for the OPQ-rotated two-stage tier. Identical
      // to ivf_pq_rerank's counts at this corpus — expected, and itself
      // evidence the two-stage design works: the generous shortlist (50
      // of ~33 probed-list candidates per query) saturates candidate
      // coverage, and the exact re-rank recovers brute-force order among
      // candidates regardless of which rotation coded them. The rotation
      // earns its keep when m starves subspaces at production dims.
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change;
      //  counts also depend on rotation seed + hash-ordered training caps]
      """SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(n_hits AS BIGINT) AS n_hits, recall_ok
         FROM (VALUES (0, 3, TRUE), (1, 5, TRUE), (2, 4, TRUE), (3, 4, TRUE),
                      (4, 4, TRUE), (5, 4, TRUE), (6, 5, TRUE), (7, 4, TRUE))
           t(query_id, n_hits, recall_ok)""",
    "ivf_pq_rerank" ->
      // golden hit counts for the two-stage (ADC shortlist + exact
      // re-rank) tier: strictly dominates plain ivf_pq_ann's counts
      // (33/40 planted neighbors vs 27/40 at the gate corpus)
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change;
      //  counts also depend on the hash-ordered coarse+PQ training caps]
      """SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(n_hits AS BIGINT) AS n_hits, recall_ok
         FROM (VALUES (0, 3, TRUE), (1, 5, TRUE), (2, 4, TRUE), (3, 4, TRUE),
                      (4, 4, TRUE), (5, 4, TRUE), (6, 5, TRUE), (7, 4, TRUE))
           t(query_id, n_hits, recall_ok)""",
    "ivf_pq_ann" ->
      // golden per-query hit counts of the PQ-coded tier against
      // brute-force truth over the planted corpus; recall_ok pins
      // recall@5 >= 0.6
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change;
      //  counts also depend on the hash-ordered coarse+PQ training caps]
      """SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(n_hits AS BIGINT) AS n_hits, recall_ok
         FROM (VALUES (0, 3, TRUE), (1, 3, TRUE), (2, 4, TRUE), (3, 4, TRUE),
                      (4, 3, TRUE), (5, 4, TRUE), (6, 3, TRUE), (7, 3, TRUE))
           t(query_id, n_hits, recall_ok)""",
    "lsh_ann" ->
      // golden per-query hit counts of multi-probe LSH against brute-force
      // truth over the planted corpus; recall_ok pins recall@5 >= 0.6
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(n_hits AS BIGINT) AS n_hits, recall_ok
         FROM (VALUES (0, 3, TRUE), (1, 4, TRUE), (2, 3, TRUE), (3, 4, TRUE),
                      (4, 3, TRUE), (5, 4, TRUE), (6, 3, TRUE), (7, 5, TRUE))
           t(query_id, n_hits, recall_ok)""",
    "ivf_ann" ->
      // golden per-query hit counts of IVF (nprobe=4/16) against
      // brute-force truth over the planted corpus; recall@5 >= 0.6
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(n_hits AS BIGINT) AS n_hits, recall_ok
         FROM (VALUES (0, 5, TRUE), (1, 3, TRUE), (2, 5, TRUE), (3, 3, TRUE),
                      (4, 3, TRUE), (5, 3, TRUE), (6, 4, TRUE), (7, 4, TRUE))
           t(query_id, n_hits, recall_ok)""",
    "ivf_ann_trained" ->
      // golden per-query hit counts of KMeans-trained IVF (nprobe=4/16,
      // seed=42 fit) against brute-force truth over the planted corpus;
      // recall@5 >= 0.6
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(n_hits AS BIGINT) AS n_hits, recall_ok
         FROM (VALUES (0, 5, TRUE), (1, 5, TRUE), (2, 4, TRUE), (3, 5, TRUE),
                      (4, 5, TRUE), (5, 5, TRUE), (6, 4, TRUE), (7, 5, TRUE))
           t(query_id, n_hits, recall_ok)""",
    "stratified_sample" ->
      // golden per-stratum kept-counts of the deterministic xxhash64
      // sample (fractions click 0.1 / view 0.5 / purchase 1.0 /
      // signup 1.0); frac_ok pins each stratum inside its ±3σ binomial
      // band around the target fraction
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT event_type, CAST(n_sampled AS BIGINT) AS n_sampled, frac_ok
         FROM (VALUES ('click', 207, TRUE), ('view', 958, TRUE),
                      ('purchase', 1981, TRUE), ('signup', 2017, TRUE))
           t(event_type, n_sampled, frac_ok)""",
    "seq_packing_check" ->
      // token conservation is recomputed EXACTLY by the second engine
      // (same whitespace tokenization as token_count); the structural
      // invariants (no multi-doc bin over budget, bin count inside the
      // greedy first-fit bounds) are pinned TRUE
      """SELECT CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS total_tokens,
           TRUE AS budget_ok, TRUE AS bins_ok
         FROM documents""",
    "ngram_jaccard_exact" ->
      // Full second-engine replay of the n-gram Jaccard operator: same
      // tokenization (whitespace split of trimmed text), same distinct
      // word-3-shingles (one truncated shingle when a doc has <3 tokens),
      // same block join — Jaccard over shingle STRINGS equals graft's
      // Jaccard over hashed shingles up to negligible collision odds.
      """WITH t AS (
           SELECT doc_id, lang,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents WHERE doc_id < 100),
         s AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 3, 0) + 2),
               i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM t)
         SELECT a.lang AS block, a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh)) * 1.0
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id""",
    "dedup_clusters_exact" ->
      // CC replayed by a second engine over the UNIONED edge families:
      // md5-of-normalized-text star edges + prefix-blocked 3-shingle
      // Jaccard near-dup edges + the synthetic chain/star topology +
      // cross-tier bridges, deduped by (src,dst), clustered via a
      // recursive-CTE reachability closure (every (node, seed-label) pair
      // in a component is eventually derived; min per node = the
      // component's min id, exactly connectedComponents' label policy).
      """WITH RECURSIVE
           hashes AS (
             SELECT doc_id,
               md5(lower(trim(regexp_replace(regexp_replace(
                 nfc_normalize(text), '\s+', ' ', 'g'),
                 '[\x00-\x1f]', '', 'g')))) AS h
             FROM documents),
           minper AS (SELECT h, min(doc_id) AS id_a FROM hashes GROUP BY h),
           organic AS (
             SELECT m.id_a, d.doc_id AS id_b
             FROM hashes d JOIN minper m USING (h)
             WHERE d.doc_id <> m.id_a),
           ksh AS (
             SELECT doc_id, array_to_string(toks[1:2], ' ') AS blk,
               list_distinct(list_transform(
                 range(1, greatest(len(toks) - 3, 0) + 2),
                 i -> array_to_string(toks[i:i+2], ' '))) AS sh
             FROM (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
                   FROM documents)),
           ngram AS (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM ksh a JOIN ksh b
               ON a.blk = b.blk AND a.doc_id < b.doc_id
             WHERE len(list_intersect(a.sh, b.sh)) * 1.0
                   / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6),
           synth AS (
             SELECT CAST(10000 + i AS BIGINT) AS id_a,
                    CAST(10001 + i AS BIGINT) AS id_b FROM range(0, 11) r(i)
             UNION ALL
             SELECT CAST(20000 AS BIGINT), CAST(20000 + i AS BIGINT)
             FROM range(1, 7) r(i)),
           bridges AS (
             SELECT CAST(0 AS BIGINT) AS id_a, CAST(10000 AS BIGINT) AS id_b
             UNION ALL
             SELECT CAST(20000 AS BIGINT), CAST(10011 AS BIGINT)),
           pairs AS (SELECT id_a, id_b FROM organic
                     UNION SELECT id_a, id_b FROM ngram
                     UNION SELECT id_a, id_b FROM synth
                     UNION SELECT id_a, id_b FROM bridges),
           edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                     UNION SELECT id_b, id_a FROM pairs),
           reach(id, label) AS (
             SELECT a, a FROM edges
             UNION
             SELECT e.b, r.label FROM reach r JOIN edges e ON r.id = e.a),
           labels AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
         SELECT component, count(*) AS cluster_size
         FROM labels GROUP BY component""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         sum(l_extendedprice) AS sum_base_price,
         sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
         sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
         avg(l_quantity) AS avg_qty,
         avg(l_extendedprice) AS avg_price,
         avg(l_discount) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q2_top_events" ->
      """SELECT event_type, count(*) AS cnt FROM events
         GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3""",
    "q3_join_agg" ->
      """SELECT c_mktsegment,
         count(DISTINCT o_orderkey) AS n_orders,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q4_multi_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
         sum(o_totalprice) AS total_price
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q5_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t
         WHERE rn = 1""",
    "q7_part_supplier" ->
      """SELECT p_brand, count(*) AS n_items,
         count(DISTINCT s_suppkey) AS n_suppliers,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY p_brand""",
    "q6_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "daily_counts" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS event_count,
         sum(value) AS total_value
         FROM events GROUP BY 1""",
    "event_type_dist" ->
      """SELECT event_type, count(*) AS cnt,
         round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS pct
         FROM events WHERE event_type IS NOT NULL AND event_type != ''
         GROUP BY event_type""",
    "regional_agg" ->
      """SELECT user_id % 10 AS cohort, count(*) AS event_count,
         sum(value) AS total_value, avg(value) AS avg_value
         FROM events GROUP BY 1""",
    "weekly_agg" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         count(*) AS event_count, sum(value) AS total_value,
         avg(value) AS avg_value, count(DISTINCT user_id) AS unique_ids
         FROM events GROUP BY 1""",
    "monthly_trends" ->
      """SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
         count(*) AS event_count, sum(value) AS total_value,
         avg(value) AS avg_value, count(DISTINCT user_id) AS unique_ids
         FROM events GROUP BY 1""",
    "rolling_7d" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS event_count
           FROM events GROUP BY 1)
         SELECT day, event_count,
           avg(event_count) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_avg
         FROM daily""",
    "report_window_7d" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS event_count,
         sum(value) AS total_value
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-17'
         GROUP BY 1""",
    "report_window_30d" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         count(*) AS event_count, sum(value) AS total_value,
         avg(value) AS avg_value, count(DISTINCT user_id) AS unique_ids
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'
         GROUP BY 1""",
    "regional_multi_agg" ->
      """SELECT user_id % 10 AS cohort, count(*) AS event_count,
         sum(value) AS total_value, avg(value) AS avg_value,
         avg(CAST(props->>'$.k' AS DOUBLE)) AS avg_prop,
         avg(CAST(user_id AS DOUBLE)) AS avg_user
         FROM events GROUP BY 1""",
    "top_high_value" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE value >= 30 ORDER BY value DESC, event_id ASC LIMIT 20""",
    "value_buckets" ->
      """SELECT CASE WHEN value <= 0 THEN '0'
                     WHEN value <= 10 THEN '1-10'
                     WHEN value <= 25 THEN '11-25'
                     WHEN value <= 50 THEN '26-50'
                     ELSE '50+' END AS bucket,
         count(*) AS cnt
         FROM events GROUP BY 1""",
    "completeness_profile" ->
      """SELECT col AS column_name, null_count, empty_count,
           null_count + empty_count AS total_missing,
           round((null_count + empty_count) * 100.0 / total, 1) AS missing_pct
         FROM (
           SELECT 'text' AS col,
             count(CASE WHEN text IS NULL THEN 1 END) AS null_count,
             count(CASE WHEN text = '' THEN 1 END) AS empty_count,
             count(*) AS total FROM documents
           UNION ALL
           SELECT 'lang',
             count(CASE WHEN lang IS NULL THEN 1 END),
             count(CASE WHEN lang = '' THEN 1 END),
             count(*) FROM documents
           UNION ALL
           SELECT 'source',
             count(CASE WHEN source IS NULL THEN 1 END),
             count(CASE WHEN source = '' THEN 1 END),
             count(*) FROM documents) t""",
    "range_validation" ->
      """SELECT count(*) AS total_records,
         count(CASE WHEN value < 0 THEN 1 END) AS below_range,
         count(CASE WHEN value > 50 THEN 1 END) AS above_range,
         count(value) AS non_null_records,
         min(value) AS min_value, max(value) AS max_value
         FROM events""",
    "domain_validation" ->
      """SELECT event_type, count(*) AS cnt,
         CASE WHEN event_type IN ('click','view','purchase','signup')
              THEN 1 ELSE 0 END AS is_expected,
         round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS pct,
         CASE WHEN round(count(*) * 100.0 / sum(count(*)) OVER (), 2) > 80.0
              THEN 1 ELSE 0 END AS is_dominant
         FROM events WHERE event_type IS NOT NULL AND event_type != ''
         GROUP BY event_type""",
    "dup_check" ->
      """SELECT user_id, event_type, CAST(ts AS DATE) AS day,
         count(*) AS dup_count
         FROM events GROUP BY 1, 2, 3 HAVING count(*) > 1""",
    "upsert_latest" ->
      """SELECT user_id, event_type, event_id, value FROM (
           SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t
         WHERE rn = 1""",
    "typed_ingest" ->
      """SELECT event_id, CAST(ts AS DATE) AS event_date,
         CAST(year(ts) AS INTEGER) AS year,
         CAST(month(ts) AS INTEGER) AS month,
         CAST(floor(value) AS INTEGER) AS value_int,
         CAST(props->>'$.k' AS INTEGER) AS prop_k,
         event_type
         FROM events""",
    "actor_presence" ->
      """SELECT
         count(CASE WHEN event_type IS NOT NULL AND event_type != '' THEN 1 END) AS event_type_present,
         count(CASE WHEN props IS NOT NULL AND props != '' THEN 1 END) AS props_present,
         count(*) AS total_records
         FROM events""",
    "value_validation" ->
      """SELECT count(*) AS total_records,
         count(value) AS records_with_value,
         count(CASE WHEN value < 0 THEN 1 END) AS negative_count,
         count(CASE WHEN value > 1000 THEN 1 END) AS extreme_count,
         count(CASE WHEN value = 0 THEN 1 END) AS zero_count,
         count(CASE WHEN value >= 1 AND value <= 10 THEN 1 END) AS low_count,
         count(CASE WHEN value > 10 AND value <= 50 THEN 1 END) AS moderate_count,
         count(CASE WHEN value > 50 THEN 1 END) AS high_count,
         min(value) AS min_value, max(value) AS max_value,
         avg(value) AS avg_value, sum(value) AS total_value
         FROM events""",
    "sql_api" -> SqlApiQuery,
    "schema_validation" ->
      """SELECT * FROM (VALUES
           ('event_id',   'bigint',    'bigint',    'ok'),
           ('ts',         'timestamp', 'timestamp', 'ok'),
           ('user_id',    'bigint',    'bigint',    'ok'),
           ('event_type', 'string',    'string',    'ok'),
           ('value',      'double',    'double',    'ok'),
           ('props',      'string',    'string',    'ok'),
           ('not_a_column', 'string',  '',          'missing'))
         t(column_name, expected_type, actual_type, status)""",
    "quarantine_stats" ->
      """SELECT count(*) AS total_records,
         count(CASE WHEN coalesce(value >= 0, FALSE)
                     AND coalesce(value <= 50, FALSE)
                     AND coalesce(event_type IN ('click','view','purchase','signup'), FALSE)
                    THEN 1 END) AS valid_records,
         count(CASE WHEN NOT coalesce(value >= 0, FALSE) THEN 1 END) AS neg_value_cnt,
         count(CASE WHEN NOT coalesce(value <= 50, FALSE) THEN 1 END) AS extreme_value_cnt,
         count(CASE WHEN NOT coalesce(event_type IN ('click','view','purchase','signup'), FALSE)
                    THEN 1 END) AS bad_type_cnt
         FROM events""",
    "partition_date_check" ->
      // replays the lagging-backfill partition assignment (a pure
      // function of ts), then the per-partition integrity counters
      """SELECT CAST(ts - INTERVAL 1 HOUR AS DATE) AS expected_date,
         count(*) AS n_rows,
         count(CASE WHEN CAST(ts AS DATE) IS DISTINCT FROM
                         CAST(ts - INTERVAL 1 HOUR AS DATE) THEN 1 END)
           AS invalid_dates,
         count(DISTINCT CAST(ts AS DATE)) AS unique_dates_count,
         count(CASE WHEN CAST(ts AS DATE) IS DISTINCT FROM
                         CAST(ts - INTERVAL 1 HOUR AS DATE) THEN 1 END) = 0
           AS ok
         FROM events GROUP BY 1""",
    "report_heatmap" ->
      // recompute the windowed region counts AND the integer shade math;
      // decoded_shade uses the same expression, so the published artifact
      // must decode back to exactly the values the SQL predicts
      """WITH g AS (
           SELECT CAST(user_id % 10 AS INT) AS region,
                  count(*) AS event_count
           FROM events
           WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
           GROUP BY 1),
         m AS (SELECT max(event_count) AS mx FROM g)
         SELECT region, event_count,
           CAST(255 - (event_count * 255) // mx AS INT) AS shade,
           CAST(255 - (event_count * 255) // mx AS INT) AS decoded_shade
         FROM g, m""",
    "report_bundle" ->
      // same GROUPING SETS pass, same per-column GROUPING() section tags,
      // same presence counters, same top-20 row section (value >= 10,
      // desc, id-asc tie-break) — the bundle's composition is replayed,
      // not just its rows
      """WITH e AS (
           SELECT event_id, CAST(ts AS DATE) AS day,
                  CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
                  user_id % 10 AS region, value, props,
                  CAST(props->>'$.k' AS DOUBLE) AS prop_k,
                  CAST(user_id AS DOUBLE) AS user_d
           FROM events
           WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31')
         SELECT
           CASE WHEN GROUPING(day) = 0 THEN 'daily'
                WHEN GROUPING(week) = 0 THEN 'weekly'
                WHEN GROUPING(event_type) = 0 THEN 'event_type'
                WHEN GROUPING(region) = 0 THEN 'region'
                ELSE 'quality' END AS section,
           CASE WHEN GROUPING(day) = 0 THEN CAST(day AS VARCHAR)
                WHEN GROUPING(week) = 0 THEN CAST(week AS VARCHAR)
                WHEN GROUPING(event_type) = 0 THEN coalesce(event_type, '(null)')
                WHEN GROUPING(region) = 0 THEN CAST(region AS VARCHAR)
                ELSE 'ALL' END AS key,
           count(*) AS event_count,
           sum(value) AS total_value,
           avg(value) AS avg_value,
           count(CASE WHEN event_type IS NULL OR event_type = '' THEN 1 END)
             AS missing_event_type,
           count(CASE WHEN props IS NULL OR props = '' THEN 1 END)
             AS missing_props,
           count(CASE WHEN event_type IS NOT NULL AND event_type != '' THEN 1 END)
             AS event_type_present,
           count(CASE WHEN props IS NOT NULL AND props != '' THEN 1 END)
             AS props_present,
           avg(prop_k) AS avg_prop,
           avg(user_d) AS avg_user
         FROM e
         GROUP BY GROUPING SETS ((), (day), (week), (event_type), (region))
         UNION ALL
         SELECT 'top_events' AS section, CAST(event_id AS VARCHAR) AS key,
           CAST(1 AS BIGINT) AS event_count,
           value AS total_value, value AS avg_value,
           CAST(CASE WHEN event_type IS NULL OR event_type = '' THEN 1 ELSE 0 END
             AS BIGINT) AS missing_event_type,
           CAST(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END
             AS BIGINT) AS missing_props,
           CAST(CASE WHEN event_type IS NOT NULL AND event_type != '' THEN 1 ELSE 0 END
             AS BIGINT) AS event_type_present,
           CAST(CASE WHEN props IS NOT NULL AND props != '' THEN 1 ELSE 0 END
             AS BIGINT) AS props_present,
           prop_k AS avg_prop, user_d AS avg_user
         FROM (SELECT * FROM e WHERE value >= 10
               ORDER BY value DESC, event_id ASC LIMIT 20)""",
    "range_join" ->
      """SELECT band_id, count(*) AS n_events, round(sum(value), 2) AS band_value
         FROM events
         JOIN (SELECT i AS band_id, i * 2.5 AS lo, i * 2.5 + 5.0 AS hi
               FROM range(0, 20) t(i)) bands
           ON value BETWEEN lo AND hi
         GROUP BY band_id""",
    "asof_join" ->
      // the CASTs drop the parquet nanos to Spark's microsecond timestamp
      // domain so both engines compare the same instants
      """WITH clicks AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click'),
         purch AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS pv
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT c.event_id, r.pv AS asof_purchase_value
         FROM clicks c ASOF LEFT JOIN purch r
           ON c.user_id = r.user_id AND c.ts >= r.ts""",
    "region_fanout" ->
      """SELECT user_id % 10 AS region, event_type, count(*) AS cnt,
         round(count(*) * 100.0 / sum(count(*)) OVER (PARTITION BY user_id % 10), 2) AS pct
         FROM events GROUP BY 1, 2""",
    "salted_agg" ->
      """SELECT event_type, count(*) AS event_count, sum(value) AS total_value,
         avg(value) AS avg_value, min(value) AS min_value, max(value) AS max_value
         FROM events GROUP BY event_type""",
    "exact_dedup" ->
      """SELECT doc_id, lang, source, n_chars FROM (
           SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents) t
         WHERE rn = 1""",
    "span_dedup" ->
      // full replay: stride-1 windows, frequency by passage STRING, span
      // starts via lag (a repeated start opens a span iff the previous
      // repeated start is >= 8 back), covered tokens as the distinct
      // position union of all repeated windows (a different algorithm
      // than the engine's interval fold — same answer, which is the point)
      """WITH t AS (
           SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         w AS (
           SELECT doc_id, len(toks) AS n,
             CAST(unnest(generate_series(1, greatest(len(toks) - 7, 1), 1))
               AS INT) - 1 AS s0,
             toks
           FROM t),
         p AS (
           SELECT doc_id, n, s0,
             array_to_string(toks[s0+1:s0+8], ' ') AS passage
           FROM w),
         f AS (SELECT passage, count(*) AS df FROM p GROUP BY passage),
         r AS (SELECT p.doc_id, p.n, p.s0
               FROM p JOIN f USING (passage) WHERE f.df >= 2),
         spans AS (
           SELECT doc_id, count(*) AS n_spans FROM (
             SELECT doc_id, s0,
               lag(s0) OVER (PARTITION BY doc_id ORDER BY s0) AS prev
             FROM r) q
           WHERE prev IS NULL OR s0 - prev >= 8 GROUP BY doc_id),
         cov AS (
           SELECT doc_id, count(DISTINCT pos) AS covered FROM (
             SELECT doc_id,
               unnest(generate_series(s0, least(s0 + 7, n - 1))) AS pos
             FROM r) u
           GROUP BY doc_id),
         base AS (
           SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
                  count(*)::BIGINT AS n_windows,
                  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_rep_windows
           FROM p JOIN f USING (passage) GROUP BY doc_id)
         SELECT b.doc_id, b.n_tokens, b.n_windows, b.n_rep_windows,
           CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,
           round(CASE WHEN b.n_tokens > 0
             THEN coalesce(c.covered, 0) * 1.0 / b.n_tokens
             ELSE 0.0 END, 4) AS covered_fraction
         FROM base b
         LEFT JOIN spans s USING (doc_id)
         LEFT JOIN cov c USING (doc_id)""",
    "para_dedup" ->
      // full replay: same lower+trim+\s+ tokenization, same 1, 9, 17, …
      // non-overlapping 8-token windows (short tail kept), frequency
      // grouped by the passage STRING (the semantic spec the 64-bit hash
      // grouping must agree with), same >= 2 threshold, same char-mass
      // ratio, clean text re-joined with single spaces in window order
      """WITH t AS (
           SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         w AS (
           SELECT doc_id, toks,
             CAST(unnest(generate_series(1, greatest(len(toks), 1), 8))
               AS INT) AS st
           FROM t),
         p AS (
           SELECT doc_id, CAST((st - 1) / 8 AS INT) AS pos,
             array_to_string(toks[st:st+7], ' ') AS passage
           FROM w),
         f AS (SELECT passage, count(*) AS df FROM p GROUP BY passage),
         m AS (
           SELECT p.doc_id, p.pos, p.passage,
             len(p.passage) AS chars, (f.df >= 2) AS rep
           FROM p JOIN f USING (passage))
         SELECT doc_id,
           count(*)::BIGINT AS n_passages,
           CAST(sum(CASE WHEN rep THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
           round(CASE WHEN sum(chars) > 0
             THEN sum(CASE WHEN rep THEN chars ELSE 0 END) * 1.0 / sum(chars)
             ELSE 0.0 END, 4) AS repeated_ratio,
           coalesce(string_agg(CASE WHEN NOT rep THEN passage END, ' '
             ORDER BY pos), '') AS clean_text
         FROM m GROUP BY doc_id""",
    "quality_score" ->
      """SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
           len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and' OR t = 'to' OR t = 'in')) AS n_stopwords,
           round(n_stopwords * 1.0 / n_words, 4) AS stopword_ratio,
           round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / n_words, 4) AS avg_word_len,
           round(least(n_words / 100.0, 1.0) * (1.0 - round(n_stopwords * 1.0 / n_words, 4)), 4) AS quality_score
         FROM documents""",
    "quality_classifier_weights" ->
      // golden trained weights (the bpe_merges pattern): deterministic
      // gradient descent on the gate corpus vs its synthetic negatives
      // must reproduce these exact 6dp values every run
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(bias AS DOUBLE) AS bias,
           CAST(w_len AS DOUBLE) AS w_len,
           CAST(w_stop AS DOUBLE) AS w_stop,
           CAST(w_wordlen AS DOUBLE) AS w_wordlen,
           CAST(w_punct AS DOUBLE) AS w_punct
         FROM (VALUES (6.423447, 2.151676, 1.776349, -10.556339, 0.0))
           t(bias, w_len, w_stop, w_wordlen, w_punct)""",
    "quality_classifier" ->
      // FULL replay of the scoring pass: the 4dp features are the same
      // engine-portable forms the quality_score oracle proved, the
      // weights are the pinned 6dp golden values above, and the logit is
      // the same left-associated multiply-add both engines evaluate in
      // IEEE doubles — training OR scoring drift flips rows red
      // [weights GOLDEN @ gate corpus: sf0.01, seed=42]
      """SELECT doc_id,
           round(least(len(regexp_split_to_array(trim(text), '\s+')) / 100.0,
             1.0), 4) AS f_len,
           round(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and'
                 OR t = 'to' OR t = 'in')) * 1.0
             / len(regexp_split_to_array(trim(text), '\s+')), 4) AS f_stop,
           round(least(length(regexp_replace(text, '\s+', '', 'g')) * 1.0
             / len(regexp_split_to_array(trim(text), '\s+')) / 10.0,
             1.0), 4) AS f_wordlen,
           round(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
             / greatest(length(text), 1), 4) AS f_punct,
           round(6.423447 + 2.151676 * f_len + 1.776349 * f_stop
             + (-10.556339) * f_wordlen + 0.0 * f_punct, 4) AS logit,
           logit > 0 AS keep
         FROM documents""",
    "token_count" ->
      """SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS word_tokens,
           length(text) AS n_chars_calc
         FROM documents""",
    "tfidf_top_terms" ->
      // rank on the ROUNDED score in both engines: ln differs in the last
      // ulp between libms, so ordering raw doubles could flip near-ties
      """WITH terms AS (
           SELECT doc_id, t AS term FROM (
             SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
             FROM documents) u
           WHERE t <> ''),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
         SELECT doc_id, term, tf, doc_freq, tfidf, rank FROM (
           SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
             round(tf.tf * ln(n_docs * 1.0 / dfreq.doc_freq), 6) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
               ORDER BY round(tf.tf * ln(n_docs * 1.0 / dfreq.doc_freq), 6) DESC,
                        tf.term) AS rank
           FROM tf JOIN dfreq USING (term) CROSS JOIN n) s
         WHERE rank <= 3""",
    "ngram_lm_perplexity" ->
      // full model replay: same tokenization, same add-1 smoothing, same
      // round-the-SUM-then-derive discipline (avg_nll/ppl divide the
      // already-rounded sum, so both engines operate on identical doubles)
      """WITH ws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         bi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         v AS (SELECT count(DISTINCT tk) AS v
               FROM (SELECT unnest(w) AS tk FROM ws) u),
         model AS (
           SELECT w1, w2, ln((c12 + 1.0) / (c1 + 1.0 * v)) AS logp
           FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
         sc AS (
           SELECT bi.doc_id, count(*) AS n_bigrams,
             round(sum(logp), 4) AS logprob_sum
           FROM bi JOIN model USING (w1, w2) GROUP BY 1)
         SELECT d.doc_id,
           coalesce(sc.n_bigrams, 0) AS n_bigrams,
           sc.logprob_sum,
           round(-sc.logprob_sum / sc.n_bigrams, 4) AS avg_nll,
           round(exp(round(-sc.logprob_sum / sc.n_bigrams, 4)), 4) AS ppl,
           coalesce(round(-sc.logprob_sum / sc.n_bigrams, 4) <= 6.0, false) AS keep
         FROM (SELECT DISTINCT doc_id FROM documents) d
         LEFT JOIN sc USING (doc_id)""",
    "ngram_lm_cross_score" ->
      // backoff replay: seen bigram → model logp; unseen under seen w1 →
      // ln(1/(c1+V)); w1 unseen → ln(1/V). n_oov counts model misses.
      """WITH tws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents WHERE length(source) = 4),
         ws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         tbi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM tws) p),
         bi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         c12 AS (SELECT w1, w2, count(*) AS c12 FROM tbi GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM tbi GROUP BY 1),
         v AS (SELECT count(DISTINCT tk) AS v
               FROM (SELECT unnest(w) AS tk FROM tws) u),
         model AS (
           SELECT w1, w2, ln((c12 + 1.0) / (c1 + 1.0 * v)) AS logp
           FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
         sc AS (
           SELECT bi.doc_id, count(*) AS n_bigrams,
             cast(sum(CASE WHEN m.logp IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_oov,
             round(sum(coalesce(m.logp,
               ln(1.0 / (coalesce(c1.c1, 0) + v.v)))), 4) AS logprob_sum
           FROM bi
           LEFT JOIN model m ON bi.w1 = m.w1 AND bi.w2 = m.w2
           LEFT JOIN c1 ON bi.w1 = c1.w1
           CROSS JOIN v
           GROUP BY 1)
         SELECT d.doc_id,
           coalesce(sc.n_bigrams, 0) AS n_bigrams,
           coalesce(sc.n_oov, 0) AS n_oov,
           sc.logprob_sum,
           round(-sc.logprob_sum / sc.n_bigrams, 4) AS avg_nll,
           round(exp(round(-sc.logprob_sum / sc.n_bigrams, 4)), 4) AS ppl,
           coalesce(round(-sc.logprob_sum / sc.n_bigrams, 4) <= 6.0, false) AS keep
         FROM (SELECT DISTINCT doc_id FROM documents) d
         LEFT JOIN sc USING (doc_id)""",
    "perplexity_bucket_assign" ->
      // the cross-score replay above + the threshold arithmetic: tertile
      // cutoffs picked off the cumulative 4dp-nll histogram with
      // cross-multiplied integer comparisons (3·cum ≥ n), value-based
      // bucket membership (ties share a bucket in both engines)
      """WITH tws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents WHERE length(source) = 4),
         ws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         tbi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM tws) p),
         bi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         c12 AS (SELECT w1, w2, count(*) AS c12 FROM tbi GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM tbi GROUP BY 1),
         v AS (SELECT count(DISTINCT tk) AS v
               FROM (SELECT unnest(w) AS tk FROM tws) u),
         model AS (
           SELECT w1, w2, ln((c12 + 1.0) / (c1 + 1.0 * v)) AS logp
           FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
         sc AS (
           SELECT bi.doc_id, count(*) AS n_bigrams,
             cast(sum(CASE WHEN m.logp IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_oov,
             round(sum(coalesce(m.logp,
               ln(1.0 / (coalesce(c1.c1, 0) + v.v)))), 4) AS logprob_sum
           FROM bi
           LEFT JOIN model m ON bi.w1 = m.w1 AND bi.w2 = m.w2
           LEFT JOIN c1 ON bi.w1 = c1.w1
           CROSS JOIN v
           GROUP BY 1),
         doc_sc AS (
           SELECT d.doc_id,
             coalesce(sc.n_bigrams, 0) AS n_bigrams,
             coalesce(sc.n_oov, 0) AS n_oov,
             round(-sc.logprob_sum / sc.n_bigrams, 4) AS avg_nll
           FROM (SELECT DISTINCT doc_id FROM documents) d
           LEFT JOIN sc USING (doc_id)),
         hist AS (SELECT avg_nll, count(*) AS cnt FROM doc_sc
                  WHERE avg_nll IS NOT NULL GROUP BY 1),
         cum AS (SELECT avg_nll, sum(cnt) OVER (ORDER BY avg_nll
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM hist),
         tot AS (SELECT count(*) AS n_total FROM doc_sc
                 WHERE avg_nll IS NOT NULL),
         cuts AS (SELECT
             min(CASE WHEN cum * 3 >= n_total THEN avg_nll END) AS cut_head,
             min(CASE WHEN cum * 3 >= n_total * 2 THEN avg_nll END) AS cut_middle
           FROM cum CROSS JOIN tot)
         SELECT doc_id, n_bigrams, n_oov, avg_nll,
           CASE WHEN avg_nll IS NULL THEN 'unscored'
                WHEN avg_nll <= cut_head THEN 'head'
                WHEN avg_nll <= cut_middle THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM doc_sc CROSS JOIN cuts""",
    "perplexity_buckets" ->
      // same replay rolled up per bucket, with the two global cutoffs
      """WITH tws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents WHERE length(source) = 4),
         ws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         tbi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM tws) p),
         bi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         c12 AS (SELECT w1, w2, count(*) AS c12 FROM tbi GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM tbi GROUP BY 1),
         v AS (SELECT count(DISTINCT tk) AS v
               FROM (SELECT unnest(w) AS tk FROM tws) u),
         model AS (
           SELECT w1, w2, ln((c12 + 1.0) / (c1 + 1.0 * v)) AS logp
           FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
         sc AS (
           SELECT bi.doc_id, count(*) AS n_bigrams,
             cast(sum(CASE WHEN m.logp IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_oov,
             round(sum(coalesce(m.logp,
               ln(1.0 / (coalesce(c1.c1, 0) + v.v)))), 4) AS logprob_sum
           FROM bi
           LEFT JOIN model m ON bi.w1 = m.w1 AND bi.w2 = m.w2
           LEFT JOIN c1 ON bi.w1 = c1.w1
           CROSS JOIN v
           GROUP BY 1),
         doc_sc AS (
           SELECT d.doc_id,
             coalesce(sc.n_bigrams, 0) AS n_bigrams,
             coalesce(sc.n_oov, 0) AS n_oov,
             round(-sc.logprob_sum / sc.n_bigrams, 4) AS avg_nll
           FROM (SELECT DISTINCT doc_id FROM documents) d
           LEFT JOIN sc USING (doc_id)),
         hist AS (SELECT avg_nll, count(*) AS cnt FROM doc_sc
                  WHERE avg_nll IS NOT NULL GROUP BY 1),
         cum AS (SELECT avg_nll, sum(cnt) OVER (ORDER BY avg_nll
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM hist),
         tot AS (SELECT count(*) AS n_total FROM doc_sc
                 WHERE avg_nll IS NOT NULL),
         cuts AS (SELECT
             min(CASE WHEN cum * 3 >= n_total THEN avg_nll END) AS cut_head,
             min(CASE WHEN cum * 3 >= n_total * 2 THEN avg_nll END) AS cut_middle
           FROM cum CROSS JOIN tot),
         asg AS (
           SELECT doc_id, n_bigrams, n_oov, avg_nll,
             CASE WHEN avg_nll IS NULL THEN 'unscored'
                  WHEN avg_nll <= cut_head THEN 'head'
                  WHEN avg_nll <= cut_middle THEN 'middle'
                  ELSE 'tail' END AS bucket,
             cut_head, cut_middle
           FROM doc_sc CROSS JOIN cuts)
         SELECT bucket, count(*) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
           CAST(sum(n_oov) AS BIGINT) AS n_oov,
           min(avg_nll) AS min_nll, max(avg_nll) AS max_nll,
           max(cut_head) AS cut_head, max(cut_middle) AS cut_middle
         FROM asg GROUP BY bucket""",
    "ngram_lm_top_bigrams" ->
      """WITH ws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         bi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         v AS (SELECT count(DISTINCT tk) AS v
               FROM (SELECT unnest(w) AS tk FROM ws) u)
         SELECT rank, w1, w2, c12, logp FROM (
           SELECT row_number() OVER (ORDER BY c12 DESC, w1, w2) AS rank,
             w1, w2, c12,
             round(ln((c12 + 1.0) / (c1 + 1.0 * v)), 6) AS logp
           FROM c12 JOIN c1 USING (w1) CROSS JOIN v) h
         WHERE rank <= 20""",
    "domain_cap" ->
      // the exact single-window form of the two-phase salted ranking —
      // equal because both phases order by the same (md5 priority, id)
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(source || ':' || cast(doc_id AS varchar)),
                        doc_id) AS rk
           FROM documents) c
         WHERE rk <= 10""",
    "domain_cap_stats" ->
      """WITH kept AS (
           SELECT source, count(*) AS n_kept FROM (
             SELECT source,
               row_number() OVER (PARTITION BY source
                 ORDER BY md5(source || ':' || cast(doc_id AS varchar)),
                          doc_id) AS rk
             FROM documents) c
           WHERE rk <= 10 GROUP BY 1)
         SELECT d.source, count(*) AS n_docs,
           coalesce(any_value(kept.n_kept), 0) AS n_kept,
           count(*) > 10 AS capped
         FROM documents d LEFT JOIN kept ON d.source = kept.source
         GROUP BY 1""",
    "gopher_quality_rules" ->
      // every ratio in cross-multiplied integer form — no float anywhere
      """WITH t AS (
           SELECT doc_id, coalesce(text, '') AS text,
             list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
                         x -> x <> '') AS ws,
             string_split(coalesce(text, ''), chr(10)) AS lines
           FROM documents),
         m AS (
           SELECT doc_id,
             len(ws) AS n_words,
             length(regexp_replace(text, '\s+', '', 'g')) AS n_chars,
             length(text) - length(replace(text, '#', '')) AS hashes,
             (length(text) - length(replace(text, '...', ''))) // 3 AS ellipses,
             len(lines) AS n_lines,
             len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS bullets,
             len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\s*$'))) AS ell_lines,
             len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS alpha_w,
             len(list_intersect(list_distinct(ws),
               ['the','be','to','of','and','that','have','with'])) AS stop_hits
           FROM t)
         SELECT doc_id,
           n_words >= 50 AND n_words <= 100000 AS word_count,
           n_chars >= n_words * 3 AND n_chars <= n_words * 10 AS mean_word_len,
           (hashes + ellipses) * 10 <= n_words AS symbol_ratio,
           bullets * 10 <= n_lines * 9 AS bullet_lines,
           ell_lines * 10 <= n_lines * 3 AS ellipsis_lines,
           alpha_w * 5 >= n_words * 4 AS alpha_words,
           stop_hits >= 2 AS stop_words,
           (n_words >= 50 AND n_words <= 100000)
             AND (n_chars >= n_words * 3 AND n_chars <= n_words * 10)
             AND ((hashes + ellipses) * 10 <= n_words)
             AND (bullets * 10 <= n_lines * 9)
             AND (ell_lines * 10 <= n_lines * 3)
             AND (alpha_w * 5 >= n_words * 4)
             AND (stop_hits >= 2) AS pass_all
         FROM m""",
    "gopher_rule_stats" ->
      """WITH t AS (
           SELECT doc_id, coalesce(text, '') AS text,
             list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
                         x -> x <> '') AS ws,
             string_split(coalesce(text, ''), chr(10)) AS lines
           FROM documents),
         m AS (
           SELECT doc_id,
             len(ws) AS n_words,
             length(regexp_replace(text, '\s+', '', 'g')) AS n_chars,
             length(text) - length(replace(text, '#', '')) AS hashes,
             (length(text) - length(replace(text, '...', ''))) // 3 AS ellipses,
             len(lines) AS n_lines,
             len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS bullets,
             len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\s*$'))) AS ell_lines,
             len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS alpha_w,
             len(list_intersect(list_distinct(ws),
               ['the','be','to','of','and','that','have','with'])) AS stop_hits
           FROM t),
         flags AS (
           SELECT
             n_words >= 50 AND n_words <= 100000 AS word_count,
             n_chars >= n_words * 3 AND n_chars <= n_words * 10 AS mean_word_len,
             (hashes + ellipses) * 10 <= n_words AS symbol_ratio,
             bullets * 10 <= n_lines * 9 AS bullet_lines,
             ell_lines * 10 <= n_lines * 3 AS ellipsis_lines,
             alpha_w * 5 >= n_words * 4 AS alpha_words,
             stop_hits >= 2 AS stop_words
           FROM m),
         agg AS (
           SELECT count(*) AS n_docs,
             cast(sum(CASE WHEN word_count THEN 1 ELSE 0 END) AS bigint) AS word_count,
             cast(sum(CASE WHEN mean_word_len THEN 1 ELSE 0 END) AS bigint) AS mean_word_len,
             cast(sum(CASE WHEN symbol_ratio THEN 1 ELSE 0 END) AS bigint) AS symbol_ratio,
             cast(sum(CASE WHEN bullet_lines THEN 1 ELSE 0 END) AS bigint) AS bullet_lines,
             cast(sum(CASE WHEN ellipsis_lines THEN 1 ELSE 0 END) AS bigint) AS ellipsis_lines,
             cast(sum(CASE WHEN alpha_words THEN 1 ELSE 0 END) AS bigint) AS alpha_words,
             cast(sum(CASE WHEN stop_words THEN 1 ELSE 0 END) AS bigint) AS stop_words,
             cast(sum(CASE WHEN word_count AND mean_word_len AND symbol_ratio
                   AND bullet_lines AND ellipsis_lines AND alpha_words
                   AND stop_words THEN 1 ELSE 0 END) AS bigint) AS pass_all
           FROM flags)
         SELECT rule, n_pass, n_docs - n_pass AS n_fail FROM (
           SELECT n_docs, 'word_count' AS rule, word_count AS n_pass FROM agg
           UNION ALL SELECT n_docs, 'mean_word_len', mean_word_len FROM agg
           UNION ALL SELECT n_docs, 'symbol_ratio', symbol_ratio FROM agg
           UNION ALL SELECT n_docs, 'bullet_lines', bullet_lines FROM agg
           UNION ALL SELECT n_docs, 'ellipsis_lines', ellipsis_lines FROM agg
           UNION ALL SELECT n_docs, 'alpha_words', alpha_words FROM agg
           UNION ALL SELECT n_docs, 'stop_words', stop_words FROM agg
           UNION ALL SELECT n_docs, 'pass_all', pass_all FROM agg) u""",
    "char_entropy" ->
      // same per-position substr chars, same H = ln(n) − Σ c·ln(c)/n
      """WITH t AS (
           SELECT doc_id, coalesce(text, '') AS text FROM documents),
         p AS (
           SELECT doc_id, text,
             unnest(generate_series(1, length(text))) AS i
           FROM t WHERE length(text) > 0),
         c AS (
           SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch FROM p),
         cc AS (SELECT doc_id, ch, count(*) AS c FROM c GROUP BY 1, 2),
         sc AS (
           SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_chars,
             CAST(count(*) AS BIGINT) AS n_distinct,
             round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
           FROM cc GROUP BY 1)
         SELECT d.doc_id,
           coalesce(sc.n_chars, 0) AS n_chars,
           coalesce(sc.n_distinct, 0) AS n_distinct,
           sc.entropy,
           coalesce(sc.entropy >= 2.0, false) AS keep
         FROM (SELECT DISTINCT doc_id FROM documents) d
         LEFT JOIN sc USING (doc_id)""",
    "dsir_weights" ->
      // full DSIR replay: same tokenize, same md5-prefix buckets, same
      // add-1-over-the-bucket-space smoothing, round-the-SUM discipline
      """WITH ws AS (
           SELECT doc_id, length(source) = 4 AS tgt,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         uni AS (SELECT doc_id, tgt, unnest(w) AS f FROM ws),
         bi AS (
           SELECT doc_id, tgt, w[i] || ' ' || w[i + 1] AS f FROM (
             SELECT doc_id, tgt, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         feats AS (
           SELECT doc_id, tgt,
             ('0x' || substr(md5(f), 1, 4))::BIGINT % 1024 AS b
           FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) u),
         hist AS (
           SELECT doc_id, tgt, b, count(*) AS n FROM feats GROUP BY 1, 2, 3),
         bucket AS (
           SELECT b, sum(n) AS cr,
             sum(CASE WHEN tgt THEN n ELSE 0 END) AS ct
           FROM hist GROUP BY 1),
         tot AS (SELECT sum(cr) AS r, sum(ct) AS t FROM bucket),
         ratio AS (
           SELECT b,
             ln((ct + 1.0) / (t + 1024.0)) - ln((cr + 1.0) / (r + 1024.0))
               AS logratio
           FROM bucket CROSS JOIN tot),
         sc AS (
           SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feats,
             round(sum(n * logratio), 4) AS weight
           FROM hist JOIN ratio USING (b) GROUP BY 1)
         SELECT d.doc_id, coalesce(sc.n_feats, 0) AS n_feats, sc.weight,
           coalesce(sc.weight >= 0.0, false) AS keep
         FROM (SELECT DISTINCT doc_id FROM documents) d
         LEFT JOIN sc USING (doc_id)""",
    "dsir_mix_shift" ->
      // per-source census over the dsir_weights body
      """WITH ws AS (
           SELECT doc_id, length(source) = 4 AS tgt,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         uni AS (SELECT doc_id, tgt, unnest(w) AS f FROM ws),
         bi AS (
           SELECT doc_id, tgt, w[i] || ' ' || w[i + 1] AS f FROM (
             SELECT doc_id, tgt, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         feats AS (
           SELECT doc_id, tgt,
             ('0x' || substr(md5(f), 1, 4))::BIGINT % 1024 AS b
           FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) u),
         hist AS (
           SELECT doc_id, tgt, b, count(*) AS n FROM feats GROUP BY 1, 2, 3),
         bucket AS (
           SELECT b, sum(n) AS cr,
             sum(CASE WHEN tgt THEN n ELSE 0 END) AS ct
           FROM hist GROUP BY 1),
         tot AS (SELECT sum(cr) AS r, sum(ct) AS t FROM bucket),
         ratio AS (
           SELECT b,
             ln((ct + 1.0) / (t + 1024.0)) - ln((cr + 1.0) / (r + 1024.0))
               AS logratio
           FROM bucket CROSS JOIN tot),
         sc AS (
           SELECT doc_id, round(sum(n * logratio), 4) AS weight
           FROM hist JOIN ratio USING (b) GROUP BY 1),
         w AS (
           SELECT d.doc_id, sc.weight,
             coalesce(sc.weight >= 0.0, false) AS keep
           FROM (SELECT DISTINCT doc_id FROM documents) d
           LEFT JOIN sc USING (doc_id))
         SELECT doc.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN w.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(sum(w.weight), 4) AS weight_sum
         FROM documents doc JOIN w ON doc.doc_id = w.doc_id
         GROUP BY 1""",
    "dsir_resample" ->
      // the dsir_weights body + the exact Gumbel-key replay: u from the
      // same md5-prefix arithmetic ((v + 0.5)/2^32 is exact binary, so u
      // is the identical double), key rounded at 4dp, doc_id tiebreak
      """WITH ws AS (
           SELECT doc_id, length(source) = 4 AS tgt,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         uni AS (SELECT doc_id, tgt, unnest(w) AS f FROM ws),
         bi AS (
           SELECT doc_id, tgt, w[i] || ' ' || w[i + 1] AS f FROM (
             SELECT doc_id, tgt, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         feats AS (
           SELECT doc_id, tgt,
             ('0x' || substr(md5(f), 1, 4))::BIGINT % 1024 AS b
           FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) u),
         hist AS (
           SELECT doc_id, tgt, b, count(*) AS n FROM feats GROUP BY 1, 2, 3),
         bucket AS (
           SELECT b, sum(n) AS cr,
             sum(CASE WHEN tgt THEN n ELSE 0 END) AS ct
           FROM hist GROUP BY 1),
         tot AS (SELECT sum(cr) AS r, sum(ct) AS t FROM bucket),
         ratio AS (
           SELECT b,
             ln((ct + 1.0) / (t + 1024.0)) - ln((cr + 1.0) / (r + 1024.0))
               AS logratio
           FROM bucket CROSS JOIN tot),
         sc AS (
           SELECT doc_id, round(sum(n * logratio), 4) AS weight
           FROM hist JOIN ratio USING (b) GROUP BY 1),
         keyed AS (
           SELECT doc_id, weight,
             round(weight - ln(-ln(
               (('0x' || substr(md5('gum:' || doc_id), 1, 8))::BIGINT + 0.5)
                 / 4294967296.0)), 4) AS key
           FROM sc WHERE weight IS NOT NULL),
         top AS (
           SELECT doc_id, weight, key FROM keyed
           ORDER BY key DESC, doc_id LIMIT 200)
         SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INT)
             AS rank,
           doc_id, weight, key
         FROM top""",
    "epoch_mix_plan" ->
      // same tokenize + weight rule; floor/round on doubles both sides
      """WITH t AS (
           SELECT source,
             len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
             CASE WHEN length(source) = 4 THEN CAST(2.0 AS DOUBLE)
                  ELSE CAST(1.0 AS DOUBLE) END AS w
           FROM documents),
         p AS (
           SELECT source, CAST(sum(n_tokens) AS BIGINT) AS available_tokens,
             max(w) AS weight
           FROM t GROUP BY 1),
         z AS (SELECT sum(weight) AS z FROM p)
         SELECT source, available_tokens, weight,
           CAST(floor(100000000.0 * weight / z) AS BIGINT) AS target_tokens,
           round(CAST(floor(100000000.0 * weight / z) AS BIGINT)
             / available_tokens, 4) AS epochs
         FROM p CROSS JOIN z""",
    "epoch_shuffle" ->
      // same md5("ep:<epoch>:<id>") key: shard = 4-hex-prefix mod 8
      // (the hashSplit arithmetic), pos = rank within shard by (full
      // lowercase-hex key, id) — hex string order is byte order in both
      // engines
      """WITH t AS (
           SELECT doc_id, md5('ep:1:' || CAST(doc_id AS VARCHAR)) AS k
           FROM documents)
         SELECT
           CAST(('0x' || substr(k, 1, 4))::BIGINT % 8 AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY ('0x' || substr(k, 1, 4))::BIGINT % 8
             ORDER BY k, doc_id) AS INT) AS pos,
           doc_id
         FROM t""",
    "diversity_sample" ->
      // full replay of the selection: centroids = the 8 rows with the
      // smallest md5-prefix draw, assignment = argmax cosine (ties to the
      // smaller centroid id), in-cluster rank by cos desc, round-robin
      // pick order; cosines ride the same double-fold dot chain the
      // cosine_topk oracle pins, so every comparison sees identical bits
      """WITH e AS (
           SELECT CAST(vec_id AS BIGINT) AS vec_id,
             CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings
           WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])) > 0),
         cand AS (
           SELECT v, row_number() OVER (
             ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
               vec_id) AS rn
           FROM e),
         cent AS (SELECT v, CAST(rn - 1 AS INT) AS cid FROM cand WHERE rn <= 8),
         a AS (
           SELECT e.vec_id, c.cid,
             list_dot_product(e.v, c.v) /
               (sqrt(list_dot_product(e.v, e.v)) *
                sqrt(list_dot_product(c.v, c.v))) AS cos,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.v, c.v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.v, c.v))) DESC, c.cid ASC) AS rn
           FROM e CROSS JOIN cent c),
         r AS (
           SELECT vec_id, cid AS cluster_id, cos,
             CAST(row_number() OVER (PARTITION BY cid
               ORDER BY cos DESC, vec_id ASC) AS INT) AS cluster_rank
           FROM a WHERE rn = 1),
         p AS (
           SELECT CAST(row_number() OVER (
               ORDER BY cluster_rank, cluster_id) AS INT) AS pick_order,
             vec_id, cluster_id, cluster_rank, cos
           FROM r WHERE cluster_rank <= 8)
         SELECT pick_order, vec_id, cluster_id, cluster_rank, cos
         FROM p WHERE pick_order <= 60""",
    "diversity_sample_trained" ->
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change
      // via DiversitySampleSpec's printGolden helper]
      // the 60 picked rows of the full trained chain (plant jittered
      // copies → SemDeDup survivor filter → Lloyd centroids → balanced
      // selection); Lloyd's KMeans fit can't replay in DuckDB, so the
      // deterministic end-to-end output pins as a VALUES table (the
      // bpe_merges convention). Determinism itself is spec-gated
      // (repartition-invariance + twice-in-one-session stability).
      """SELECT CAST(pick_order AS INT) AS pick_order,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(cluster_id AS INT) AS cluster_id,
           CAST(cluster_rank AS INT) AS cluster_rank
         FROM (VALUES
           (1,310,0,1),(2,23,1,1),(3,477,2,1),(4,199,3,1),(5,195,4,1),
           (6,181,5,1),(7,417,6,1),(8,179,7,1),(9,364,0,2),(10,436,1,2),
           (11,83,2,2),(12,101,3,2),(13,317,4,2),(14,438,5,2),(15,50,6,2),
           (16,370,7,2),(17,325,0,3),(18,58,1,3),(19,72,2,3),(20,123,3,3),
           (21,382,4,3),(22,337,5,3),(23,355,6,3),(24,338,7,3),
           (25,277,0,4),(26,48,1,4),(27,308,2,4),(28,108,3,4),(29,80,4,4),
           (30,266,5,4),(31,247,6,4),(32,406,7,4),(33,380,0,5),
           (34,193,1,5),(35,460,2,5),(36,324,3,5),(37,495,4,5),
           (38,442,5,5),(39,79,6,5),(40,482,7,5),(41,331,0,6),(42,200,1,6),
           (43,196,2,6),(44,443,3,6),(45,19,4,6),(46,18,5,6),(47,70,6,6),
           (48,62,7,6),(49,290,0,7),(50,409,1,7),(51,469,2,7),
           (52,147,3,7),(53,316,4,7),(54,398,5,7),(55,335,6,7),(56,53,7,7),
           (57,131,0,8),(58,34,1,8),(59,201,2,8),(60,361,3,8)
         ) AS t(pick_order, vec_id, cluster_id, cluster_rank)""",
    "split_leakage" ->
      // same md5-prefix bucket arithmetic as dataset_split; duplicate
      // content groups + the distinct splits they span
      """WITH u AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 5000000, text FROM documents WHERE doc_id < 5),
         s AS (
           SELECT doc_id, text,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                    % 100 < 80 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                    % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
           FROM u),
         h AS (SELECT md5(text) AS content_hash, doc_id, split FROM s),
         agg AS (
           SELECT content_hash, CAST(count(*) AS BIGINT) AS n_docs
           FROM h GROUP BY 1),
         d AS (SELECT DISTINCT content_hash, split FROM h),
         spl AS (
           SELECT content_hash, CAST(count(*) AS BIGINT) AS n_splits,
             string_agg(split, ',' ORDER BY split) AS splits
           FROM d GROUP BY 1)
         SELECT agg.content_hash, agg.n_docs, spl.n_splits, spl.splits,
           spl.n_splits >= 2 AS leaked
         FROM agg JOIN spl USING (content_hash)
         WHERE agg.n_docs >= 2""",
    "curation_funnel" ->
      // the D31/D33/D1/D32 oracle bodies chained stage to stage; lag
      // window over the 5-row census for n_dropped
      """WITH gm AS (
           SELECT doc_id,
             len(ws) AS n_words,
             length(regexp_replace(text, '\s+', '', 'g')) AS n_chars,
             length(text) - length(replace(text, '#', '')) AS hashes,
             (length(text) - length(replace(text, '...', ''))) // 3 AS ellipses,
             len(lines) AS n_lines,
             len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS bullets,
             len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\s*$'))) AS ell_lines,
             len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS alpha_w,
             len(list_intersect(list_distinct(ws),
               ['the','be','to','of','and','that','have','with'])) AS stop_hits
           FROM (
             SELECT doc_id, coalesce(text, '') AS text,
               list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
                           x -> x <> '') AS ws,
               string_split(coalesce(text, ''), chr(10)) AS lines
             FROM documents) t),
         g AS (
           SELECT doc_id FROM gm
           WHERE (n_words >= 50 AND n_words <= 100000)
             AND (n_chars >= n_words * 3 AND n_chars <= n_words * 10)
             AND ((hashes + ellipses) * 10 <= n_words)
             AND (bullets * 10 <= n_lines * 9)
             AND (ell_lines * 10 <= n_lines * 3)
             AND (alpha_w * 5 >= n_words * 4)
             AND (stop_hits >= 2)),
         ws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         bi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         v AS (SELECT count(DISTINCT tk) AS v
               FROM (SELECT unnest(w) AS tk FROM ws) u),
         model AS (
           SELECT w1, w2, ln((c12 + 1.0) / (c1 + 1.0 * v)) AS logp
           FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
         lmk AS (
           SELECT bi.doc_id FROM bi JOIN model USING (w1, w2)
           GROUP BY 1
           HAVING round(-round(sum(logp), 4) / count(*), 4) <= 6.0),
         s1 AS (SELECT d.* FROM documents d JOIN g USING (doc_id)),
         s2 AS (SELECT s1.* FROM s1 JOIN lmk USING (doc_id)),
         s3 AS (
           SELECT doc_id, text, source FROM (
             SELECT doc_id, text, source,
               row_number() OVER (PARTITION BY md5(text)
                 ORDER BY doc_id) AS rn
             FROM s2) r WHERE rn = 1),
         s4 AS (
           SELECT doc_id FROM (
             SELECT doc_id,
               row_number() OVER (PARTITION BY source
                 ORDER BY md5(source || ':' || cast(doc_id AS varchar)),
                          doc_id) AS rk
             FROM s3) c WHERE rk <= 10),
         census AS (
           SELECT 0 AS stage, 'raw' AS stage_name,
             count(*) AS n_docs FROM documents
           UNION ALL SELECT 1, 'gopher_rules', count(*) FROM s1
           UNION ALL SELECT 2, 'lm_keep', count(*) FROM s2
           UNION ALL SELECT 3, 'exact_dedup', count(*) FROM s3
           UNION ALL SELECT 4, 'domain_cap', count(*) FROM s4)
         SELECT stage, stage_name, n_docs,
           coalesce(lag(n_docs) OVER (ORDER BY stage) - n_docs, 0) AS n_dropped
         FROM census""",
    "lang_id" ->
      // same stopword-profile scores + lexicographic (score, lang) argmax
      // as TextOps.langId: struct comparison via list_max mirrors Spark's
      // greatest() over (score, lang) structs
      """WITH t AS (
           SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, [
             struct_pack(score := len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','zu'))) * 1.0 / greatest(len(toks), 1), lang := 'de'),
             struct_pack(score := len(list_filter(toks, x -> x IN ('the','a','of','and','to','is','in','that'))) * 1.0 / greatest(len(toks), 1), lang := 'en'),
             struct_pack(score := len(list_filter(toks, x -> x IN ('el','la','los','y','es','una','que','en'))) * 1.0 / greatest(len(toks), 1), lang := 'es'),
             struct_pack(score := len(list_filter(toks, x -> x IN ('le','la','les','et','est','une','que','dans'))) * 1.0 / greatest(len(toks), 1), lang := 'fr'),
             struct_pack(score := len(list_filter(toks, x -> x IN ('的','是','了','在','我','有','他','这'))) * 1.0 / greatest(len(toks), 1)
               + least(length(regexp_replace(text, '[\x00-\x7F]', '', 'g')) * 1.0 / greatest(length(text), 1), 1.0), lang := 'zh')
           ] AS cand
           FROM t)
         SELECT doc_id, list_max(cand).lang AS detected_lang,
           round(list_max(cand).score, 4) AS lang_score
         FROM s""",
    "lang_id_trained" ->
      // FULL replay of the trained scorer: same normalization, same
      // code-point 1/2/3-gram enumeration, same md5-prefix 1024-bucket
      // hash, and the same 1e6-scaled INTEGER weights (interpolated from
      // the live model — training drift is pinned separately by the
      // hardcoded lang_id_model_check golden). Class scores are exact
      // Long sums, so no float-summation-order caveat anywhere; the
      // margin divides identical integers and rounds to 6dp. The
      // whitespace collapse spells Java's \s class out ([ \t\n\x0b\f\r])
      // because RE2's \s EXCLUDES vertical tab — with bare \s a \x0b doc
      // would word-split in Spark but control-strip-merge in DuckDB.
      raw"""WITH norm AS (
           SELECT doc_id,
             lower(trim(regexp_replace(regexp_replace(text,
               '[ \t\n\x0b\f\r]+', ' ', 'g'),
               '[\x00-\x1f]', '', 'g'))) AS nt
           FROM documents),
         g AS (
           SELECT doc_id, substr(nt, i, 1) AS t FROM
             (SELECT doc_id, nt, unnest(generate_series(1, length(nt))) AS i
              FROM norm WHERE length(nt) >= 1) u1
           UNION ALL
           SELECT doc_id, substr(nt, i, 2) FROM
             (SELECT doc_id, nt, unnest(generate_series(1, length(nt) - 1)) AS i
              FROM norm WHERE length(nt) >= 2) u2
           UNION ALL
           SELECT doc_id, substr(nt, i, 3) FROM
             (SELECT doc_id, nt, unnest(generate_series(1, length(nt) - 2)) AS i
              FROM norm WHERE length(nt) >= 3) u3),
         bkt AS (
           SELECT doc_id,
             CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) % 1024 AS b
           FROM g),
         wts AS (SELECT ${graft.operators.LangIdModel.duckdbWeightLists}),
         sc AS (
           SELECT n.doc_id, count(b.b) AS n_grams,
             CAST(coalesce(sum(w_de[b.b + 1]), 0) AS BIGINT) AS s_de,
             CAST(coalesce(sum(w_en[b.b + 1]), 0) AS BIGINT) AS s_en,
             CAST(coalesce(sum(w_es[b.b + 1]), 0) AS BIGINT) AS s_es,
             CAST(coalesce(sum(w_fr[b.b + 1]), 0) AS BIGINT) AS s_fr,
             CAST(coalesce(sum(w_und[b.b + 1]), 0) AS BIGINT) AS s_und,
             CAST(coalesce(sum(w_zh[b.b + 1]), 0) AS BIGINT) AS s_zh
           FROM norm n LEFT JOIN bkt b USING (doc_id) CROSS JOIN wts
           GROUP BY n.doc_id),
         rk AS (
           SELECT doc_id, lang, s,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY s DESC, lang ASC) AS r
           FROM (
             SELECT doc_id,
               unnest(['de','en','es','fr','und','zh']) AS lang,
               unnest([s_de, s_en, s_es, s_fr, s_und, s_zh]) AS s
             FROM sc) u),
         top2 AS (
           SELECT doc_id,
             max(CASE WHEN r = 1 THEN lang END) AS lang,
             max(CASE WHEN r = 1 THEN s END) AS s1,
             max(CASE WHEN r = 2 THEN s END) AS s2
           FROM rk GROUP BY doc_id)
         SELECT sc.doc_id, sc.n_grams, sc.s_de, sc.s_en, sc.s_es, sc.s_fr,
           sc.s_und, sc.s_zh, t.lang,
           round((t.s1 - t.s2) * 1.0
             / (nullif(sc.n_grams, 0) * 1000000.0), 6) AS margin,
           CASE WHEN sc.n_grams < 12
                  OR round((t.s1 - t.s2) * 1.0
                       / (nullif(sc.n_grams, 0) * 1000000.0), 6) < 0.05
                THEN 'und' ELSE t.lang END AS route
         FROM sc JOIN top2 t USING (doc_id)""",
    "lang_id_model_check" ->
      // golden model head (the quality_classifier_weights pattern):
      // per-class nonzero count, weight sum, position-weighted checksum
      // [GOLDEN @ seed corpus, buckets=1024, iters=2000, step=8.0,
      //  l2=0.0002 — re-derive on trainer change by dumping the Spark
      //  side of this query (LangIdModel.modelCheck) and repinning]
      """SELECT lang, CAST(n_nonzero AS BIGINT) AS n_nonzero,
           CAST(w_sum AS BIGINT) AS w_sum,
           CAST(checksum AS BIGINT) AS checksum
         FROM (VALUES
           ('de', 985, -71984456, 97700088),
           ('en', 985, -67767770, 309585736),
           ('es', 985, -65416106, 785791121),
           ('fr', 985, -83363086, 6253541),
           ('und', 985, 38953447, 811447497),
           ('zh', 985, 249577914, 989187456))
           t(lang, n_nonzero, w_sum, checksum)""",
    "novelty_near_dup" ->
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      // planted-probe verdicts: every jittered cross-batch duplicate
      // (ids 3000000-3000009) caught as non-novel, both genuinely novel
      // plants (4000000-4000001) passed
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, is_novel FROM (VALUES
           (3000000, FALSE), (3000001, FALSE), (3000002, FALSE),
           (3000003, FALSE), (3000004, FALSE), (3000005, FALSE),
           (3000006, FALSE), (3000007, FALSE), (3000008, FALSE),
           (3000009, FALSE), (4000000, TRUE), (4000001, TRUE))
           t(doc_id, is_novel)""",
    "stream_lm_score" ->
      // the streamed lake must equal batch cross-scoring of the SAME
      // derived probes + novel literals against the corpus-trained model
      // — full backoff-ladder replay, batch-split independence included
      """WITH tws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM documents),
         tgt AS (
           SELECT doc_id + 3000000 AS doc_id,
             text || ' qq zz qq zz' AS text
           FROM documents WHERE doc_id < 10
           UNION ALL
           SELECT cast(id AS bigint), t FROM (VALUES
             (4000000, 'wholly novel planted stream document zyx about nothing previously modeled qqj at all'),
             (4000001, 'another genuinely novel planted document kvw carrying entirely fresh content pqz never scored before'))
             v(id, t)),
         ws AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
           FROM tgt),
         tbi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM tws) p),
         bi AS (
           SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM (
             SELECT doc_id, w,
               unnest(generate_series(1, len(w) - 1)) AS i
             FROM ws) p),
         c12 AS (SELECT w1, w2, count(*) AS c12 FROM tbi GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM tbi GROUP BY 1),
         v AS (SELECT count(DISTINCT tk) AS v
               FROM (SELECT unnest(w) AS tk FROM tws) u),
         model AS (
           SELECT w1, w2, ln((c12 + 1.0) / (c1 + 1.0 * v)) AS logp
           FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
         sc AS (
           SELECT bi.doc_id, count(*) AS n_bigrams,
             cast(sum(CASE WHEN m.logp IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_oov,
             round(sum(coalesce(m.logp,
               ln(1.0 / (coalesce(c1.c1, 0) + v.v)))), 4) AS logprob_sum
           FROM bi
           LEFT JOIN model m ON bi.w1 = m.w1 AND bi.w2 = m.w2
           LEFT JOIN c1 ON bi.w1 = c1.w1
           CROSS JOIN v
           GROUP BY 1)
         SELECT t.doc_id,
           coalesce(sc.n_bigrams, 0) AS n_bigrams,
           coalesce(sc.n_oov, 0) AS n_oov,
           sc.logprob_sum,
           round(-sc.logprob_sum / sc.n_bigrams, 4) AS avg_nll,
           round(exp(round(-sc.logprob_sum / sc.n_bigrams, 4)), 4) AS ppl,
           coalesce(round(-sc.logprob_sum / sc.n_bigrams, 4) <= 6.0, false) AS keep
         FROM (SELECT DISTINCT doc_id FROM tgt) t
         LEFT JOIN sc USING (doc_id)""",
    "stream_novelty" ->
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      // the STREAMING drain of the same probe family must land on the
      // exact batch verdicts (batch-split independence): same golden rows
      // as novelty_near_dup
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, is_novel FROM (VALUES
           (3000000, FALSE), (3000001, FALSE), (3000002, FALSE),
           (3000003, FALSE), (3000004, FALSE), (3000005, FALSE),
           (3000006, FALSE), (3000007, FALSE), (3000008, FALSE),
           (3000009, FALSE), (4000000, TRUE), (4000001, TRUE))
           t(doc_id, is_novel)""",
    "novelty_bloom" ->
      // identical to novelty_check's oracle BY DESIGN: the Bloom tier's
      // contract is verdict equality with the exact gate (no false
      // negatives; positives exact-verified), so the second engine replays
      // the exact semantics and the bloom path must land on them
      """WITH dedup AS (
           SELECT doc_id, lang, source, md5(text) AS h,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents WHERE doc_id >= 250),
         corpus AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250)
         SELECT doc_id, lang, source FROM dedup d
         WHERE rn = 1 AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = d.h)""",
    "novelty_check" ->
      // NOT EXISTS (not NOT IN): a NULL content hash must stay novel in
      // both engines — NOT IN drops it, the anti-join keeps it
      """WITH dedup AS (
           SELECT doc_id, lang, source, md5(text) AS h,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents WHERE doc_id >= 250),
         corpus AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250)
         SELECT doc_id, lang, source FROM dedup d
         WHERE rn = 1 AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = d.h)""",
    "corpus_snapshot_diff" ->
      """WITH prev AS (
           SELECT doc_id, md5(text) AS prev_hash
           FROM documents WHERE doc_id < 400),
         curr AS (
           SELECT doc_id,
             md5(CASE WHEN doc_id % 50 = 0 THEN text || ' v2' ELSE text END)
               AS curr_hash
           FROM documents WHERE doc_id >= 100)
         SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
           CASE WHEN prev_hash IS NULL THEN 'added'
                WHEN curr_hash IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           prev_hash, curr_hash
         FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id
         WHERE prev_hash IS NULL OR curr_hash IS NULL
            OR prev_hash <> curr_hash""",
    "corpus_snapshot_summary" ->
      """WITH prev AS (
           SELECT doc_id, md5(text) AS prev_hash
           FROM documents WHERE doc_id < 400),
         curr AS (
           SELECT doc_id,
             md5(CASE WHEN doc_id % 50 = 0 THEN text || ' v2' ELSE text END)
               AS curr_hash
           FROM documents WHERE doc_id >= 100)
         SELECT
           CAST(sum(CASE WHEN prev_hash IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(sum(CASE WHEN curr_hash IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN prev_hash IS NOT NULL AND curr_hash IS NOT NULL
                          AND prev_hash <> curr_hash THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(sum(CASE WHEN prev_hash = curr_hash THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unchanged
         FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id""",
    "incremental_pipeline" ->
      // the FULL REBUILD over corpus version 2 (shared with
      // incremental_sink — frame form and lake form must both equal it)
      incrRebuildSql,
    "incremental_sink" ->
      // same rebuild: the gate read the refreshed TREE back, so this
      // equality is write->read fidelity for the partial-rewrite path
      incrRebuildSql,
    "stream_incremental" ->
      // same rebuild again, now through the STREAMING write path: two
      // checkpointed micro-batch waves of the same delta must land the
      // same final lake (wave-split independence of the refresh loop)
      incrRebuildSql,
    "stream_scrub" ->
      // the batch spanScrub replay over scrub version 2 — the SAME SQL
      // as incremental_scrub, now gating the streamed four-lake path
      // (wave-split independence of the frequency-delta refresh)
      oracleSqlScrubBatch,
    "incremental_scrub" ->
      // the BATCH spanScrub replayed over corpus version 2 (same planted
      // tails/removal/edit/additions), string-grouped window frequencies
      // standing in for the engine's xxhash64 grouping (the span_dedup
      // equivalence), interval cover, per-doc token rebuild — equality
      // proves the frequency-delta refresh IS the batch rebuild
      oracleSqlScrubBatch,
    "text_normalize" ->
      """SELECT doc_id,
           md5(lower(trim(regexp_replace(regexp_replace(text, '\s+', ' ', 'g'),
                                         '[\x00-\x1f]', '', 'g')))) AS norm_hash,
           length(lower(trim(regexp_replace(regexp_replace(text, '\s+', ' ', 'g'),
                                            '[\x00-\x1f]', '', 'g')))) AS norm_chars
         FROM documents""",
    "chunk_docs" ->
      // same tokenization, same start sequence 1, 1+24, … capped at
      // n-overlap, same 32-token slices
      """WITH t AS (
           SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, toks,
             CAST(unnest(generate_series(1, greatest(len(toks) - 8, 1), 24))
               AS INT) AS st
           FROM t)
         SELECT doc_id, CAST((st - 1) / 24 AS INT) AS chunk_id,
           len(toks[st:st+31])::BIGINT AS n_tokens,
           md5(array_to_string(toks[st:st+31], ' ')) AS chunk_hash
         FROM c""",
    "dataset_split" ->
      // same md5-prefix bucket arithmetic as Sample.hashSplit: bucket in
      // [0,100), boundaries at 80/90
      """SELECT
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                  % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                  % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 1000000007) AS BIGINT) AS checksum
         FROM documents GROUP BY 1, 2""",
    "token_budget_sample" ->
      // same md5 draw order, same exclusive running sum, same budgets
      """WITH t AS (
           SELECT doc_id, lang,
             len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ok
           FROM documents),
         w AS (
           SELECT *, coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY ok, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef,
             CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 800
                       WHEN 'fr' THEN 500 ELSE -1 END AS b
           FROM t)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         FROM w WHERE b >= 0 AND bef < b GROUP BY lang""",
    "temperature_mixture" ->
      // budget derivation (per-lang token mass → sqrt flatten → floor
      // allocation) AND the md5-ordered exclusive-running-sum draw, both
      // replayed; sqrt is IEEE-correctly-rounded in both engines so the
      // budgets agree bit-for-bit
      """WITH t AS (
           SELECT doc_id, lang,
             len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ok
           FROM documents),
         m AS (SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS mass
               FROM t GROUP BY lang),
         wt AS (SELECT lang, sqrt(mass) AS w FROM m),
         -- z accumulated over a lang-ordered list, NOT a bare sum(w):
         -- the engine sums weights in sorted-stratum order, and a
         -- hash-aggregate-order fp sum could differ by an ulp — enough
         -- to flip a floor() budget at an exact boundary
         z AS (SELECT list_sum(list(w ORDER BY lang)) AS z FROM wt),
         b AS (SELECT lang, CAST(floor(6000 * w / z) AS BIGINT) AS budget
               FROM wt, z),
         w2 AS (
           SELECT t.*, b.budget,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY t.lang ORDER BY ok, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
           FROM t JOIN b ON t.lang = b.lang)
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens, budget
         FROM w2 WHERE bef < budget GROUP BY lang, budget""",
    "corpus_pipeline" ->
      // full-chain replay: same planted unions (exact copies +1e6,
      // jittered copies +2e6, model-bad translate-generated docs +3e6),
      // same NFC+regex normalize chain, same min-id dedup rule, same
      // three keep-rules AND the composed pinned-weight model filter,
      // same prefix-blocked
      // 3-shingle Jaccard near-dup drop (keep-first), same stride-1
      // 8-token span scrub (>=2 occurrences corpus-wide, covered
      // positions cut, emptied docs dropped), same chunk boundaries as
      // the chunk_docs oracle. packed_tokens is the one column the
      // oracle CANNOT take from graft's packer — it recomputes the
      // chunk-stage token sum analytically over the scrubbed survivors,
      // so the equality IS the conservation proof, and the scrub ledger
      // (tokens_before − tokens_removed entering chunking) pins the two
      // new stage edges.
      """WITH base AS (
           SELECT doc_id,
             CASE WHEN doc_id BETWEEN 20 AND 39
               THEN text || ' common license boilerplate notice follows' ||
                    ' terms apply everywhere always more'
               ELSE text END AS text
           FROM documents),
         mb AS (
           SELECT CAST(3000000 + k AS BIGINT) AS doc_id,
             string_agg('qz' || translate(lpad(CAST(k * 100 + i AS VARCHAR),
               8, '0'), '0123456789', 'abcdefghij'), ' ' ORDER BY i) AS text
           FROM range(0, 20) a(k) CROSS JOIN range(0, 40) b(i)
           GROUP BY k),
         src AS (
           SELECT doc_id, text FROM base
           UNION ALL
           SELECT doc_id + 1000000, text FROM base WHERE doc_id < 10
           UNION ALL
           SELECT doc_id + 2000000, text || ' nearline jitter marker pad'
           FROM base WHERE doc_id >= 10 AND doc_id < 20
           UNION ALL
           SELECT doc_id, text FROM mb),
         norm AS (
           SELECT doc_id,
             lower(trim(regexp_replace(regexp_replace(nfc_normalize(text),
               '\s+', ' ', 'g'), '[\x00-\x1f]', '', 'g'))) AS t
           FROM src),
         ded AS (
           SELECT doc_id, t,
             row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) AS rn
           FROM norm),
         kept AS (
           SELECT doc_id, t FROM ded
           WHERE rn = 1
             AND length(t) >= 100
             AND length(regexp_replace(t, '[^0-9]', '', 'g')) * 1.0
                 / greatest(length(t), 1) <= 0.2
             AND length(regexp_replace(t, '\s+', '', 'g')) * 1.0
                 / greatest(len(string_split_regex(trim(t), '\s+')), 1)
                 BETWEEN 3 AND 12
             -- composed model filter: the pinned quality_classifier
             -- weights applied to the normalized text (same 4dp feature
             -- forms, same left-associated multiply-add)
             AND round(6.423447
               + 2.151676 * round(least(len(string_split_regex(trim(t),
                   '\s+')) / 100.0, 1.0), 4)
               + 1.776349 * round(len(list_filter(string_split_regex(trim(t),
                     '\s+'), x -> x = 'the' OR x = 'a' OR x = 'of'
                     OR x = 'and' OR x = 'to' OR x = 'in')) * 1.0
                 / len(string_split_regex(trim(t), '\s+')), 4)
               + (-10.556339) * round(least(length(regexp_replace(t, '\s+',
                   '', 'g')) * 1.0
                 / len(string_split_regex(trim(t), '\s+')) / 10.0, 1.0), 4)
               + 0.0 * round(length(regexp_replace(t, '[A-Za-z0-9\s]', '',
                   'g')) * 1.0 / greatest(length(t), 1), 4), 4) > 0),
         ksh AS (
           SELECT doc_id, t, toks,
             array_to_string(toks[1:2], ' ') AS blk,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 3, 0) + 2),
               i -> array_to_string(toks[i:i+2], ' '))) AS sh
           FROM (SELECT doc_id, t,
                   string_split_regex(trim(t), '\s+') AS toks FROM kept)),
         nd_losers AS (
           SELECT DISTINCT b.doc_id FROM ksh a JOIN ksh b
             ON a.blk = b.blk AND a.doc_id < b.doc_id
           WHERE len(list_intersect(a.sh, b.sh)) * 1.0
                 / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6),
         nd AS (
           SELECT doc_id, t, toks FROM ksh
           WHERE doc_id NOT IN (SELECT doc_id FROM nd_losers)),
         winstr AS (
           SELECT doc_id, n, st, array_to_string(toks[st:st+7], ' ') AS wstr
           FROM (SELECT doc_id, toks, len(toks) AS n,
                   CAST(unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                     AS INT) AS st
                 FROM nd)),
         rep AS (SELECT wstr FROM winstr GROUP BY wstr HAVING count(*) >= 2),
         repst AS (
           SELECT doc_id, st, least(st + 7, n) AS en
           FROM winstr WHERE wstr IN (SELECT wstr FROM rep)),
         post AS (
           SELECT doc_id, p, toks[p] AS tok
           FROM (SELECT doc_id, toks,
                   CAST(unnest(generate_series(1, len(toks))) AS INT) AS p
                 FROM nd)),
         covered AS (
           SELECT DISTINCT x.doc_id, x.p FROM post x JOIN repst r
             ON r.doc_id = x.doc_id AND x.p BETWEEN r.st AND r.en),
         scrub AS (
           SELECT x.doc_id, string_agg(x.tok, ' ' ORDER BY x.p) AS t
           FROM post x LEFT JOIN covered cv
             ON cv.doc_id = x.doc_id AND cv.p = x.p
           WHERE cv.p IS NULL
           GROUP BY x.doc_id),
         c AS (
           SELECT doc_id, toks,
             CAST(unnest(generate_series(1, greatest(len(toks) - 8, 1), 24))
               AS INT) AS st
           FROM (SELECT doc_id, string_split_regex(trim(t), '\s+') AS toks
                 FROM scrub)),
         ch AS (SELECT len(toks[st:st+31])::BIGINT AS n FROM c)
         SELECT
           (SELECT count(*) FROM src) AS docs_in,
           (SELECT count(*) FROM ded WHERE rn = 1) AS docs_unique,
           (SELECT count(*) FROM kept) AS docs_kept,
           (SELECT count(*) FROM nd) AS docs_after_neardup,
           (SELECT CAST(sum(len(toks)) AS BIGINT) FROM nd)
             AS tokens_before_scrub,
           (SELECT CAST(count(*) AS BIGINT) FROM covered)
             AS tokens_removed_scrub,
           (SELECT count(*) FROM scrub) AS docs_after_scrub,
           count(*) AS n_chunks,
           CAST(sum(n) AS BIGINT) AS packed_tokens,
           TRUE AS budget_ok
         FROM ch""",
    "corpus_pipeline_banded" ->
      // GOLDEN row: the banded (MinHash LSH) near-dup strategy has no
      // DuckDB mirror (hash-derived band buckets), but every stage is
      // deterministic (fixed xxhash64 seeds), so the whole summary row
      // pins to literals — derived once via RunOne at sf0.01 and equal,
      // column for column, to the exact-form corpus_pipeline row above:
      // on this corpus the planted jittered copies are the only >=0.6
      // pairs and they sit at Jaccard ~0.95, where 8x4 banding recall
      // is ~1, so BOTH strategies must drop exactly the same 31 docs.
      // (final r10: +20 docs_in/docs_unique for the planted model-bad
      // docs the composed classifier filter must drop before near-dup —
      // kept and every downstream count unchanged.)
      """SELECT 540::BIGINT AS docs_in, 530::BIGINT AS docs_unique,
           473::BIGINT AS docs_kept, 442::BIGINT AS docs_after_neardup,
           25625::BIGINT AS tokens_before_scrub,
           208::BIGINT AS tokens_removed_scrub,
           442::BIGINT AS docs_after_scrub, 1123::BIGINT AS n_chunks,
           30865::BIGINT AS packed_tokens, TRUE AS budget_ok""",
    "contamination_check" ->
      // full replay over shingle STRINGS (the hash is injective up to
      // negligible collisions, so intersection counts agree) — same
      // 8-gram derivation as graft's, same probe-sentence concat
      """WITH base AS (
           SELECT doc_id,
             CASE WHEN doc_id < 5 OR (doc_id BETWEEN 10 AND 12)
               THEN text || ' the quick brown contamination probe sentence' ||
                 ' lurks verbatim inside selected training documents'
             ELSE text END AS text
           FROM documents),
         t AS (SELECT doc_id,
                 string_split_regex(trim(text), '\s+') AS toks FROM base),
         sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(toks) - 8, 0) + 2),
             i -> array_to_string(toks[i:i+7], ' '))) AS gr
           FROM t),
         bench AS (
           SELECT list_distinct(flatten(list(gr))) AS bg FROM sh WHERE doc_id < 5)
         SELECT doc_id, len(gr)::BIGINT AS n_grams,
           len(list_intersect(gr, bg))::BIGINT AS n_contaminated,
           len(list_intersect(gr, bg)) > 0 AS contaminated
         FROM sh CROSS JOIN bench WHERE doc_id >= 5""",
    "pii_scrub" ->
      // same synthesized-PII concat, same 4-pattern mask chain (RE2 vs
      // Java regex — patterns chosen to agree), counts on the pre-scrub
      // text
      """WITH t AS (
           SELECT doc_id,
             CASE WHEN doc_id < 5 THEN text ||
               ' Contact jo.doe+x@mail.example.org or +1 (555) 123-4567;' ||
               ' host 10.0.42.7; card 4111 1111 1111 1111.'
             ELSE text END AS text
           FROM documents)
         SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b', '<CARD>', 'g'),
             '\+\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{2,4}', '<PHONE>', 'g'),
             '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g')) AS scrub_hash,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
           len(regexp_extract_all(text,
             '\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b'))::BIGINT AS n_card,
           len(regexp_extract_all(text,
             '\+\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{2,4}'))::BIGINT AS n_phone,
           len(regexp_extract_all(text,
             '\b(?:\d{1,3}\.){3}\d{1,3}\b'))::BIGINT AS n_ipv4
         FROM t""",
    "repetition_stats" ->
      // same line/token/2-gram derivations; top-gram mass via unnest +
      // group-by max instead of the sorted-run fold — same number
      """WITH t AS (
           SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)),
               l -> trim(l)), l -> l <> '') AS lines,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, lines,
             list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i + 1]) AS grams
           FROM t),
         top AS (
           SELECT doc_id, max(c) AS topc FROM (
             SELECT doc_id, gm, count(*) AS c
             FROM (SELECT doc_id, unnest(grams) AS gm FROM g)
             GROUP BY 1, 2)
           GROUP BY 1)
         SELECT g.doc_id,
           len(lines)::BIGINT AS n_lines,
           round(CASE WHEN len(lines) > 0
             THEN (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines)
             ELSE 0 END, 4) AS dup_line_ratio,
           len(grams)::BIGINT AS n_2grams,
           round(CASE WHEN len(grams) > 0
             THEN coalesce(top.topc, 0) * 1.0 / len(grams)
             ELSE 0 END, 4) AS top_2gram_ratio
         FROM g LEFT JOIN top USING (doc_id)""",
    "nfc_normalize" ->
      // ICU (DuckDB) vs JDK (UnicodeNorm) NFC on the same code points —
      // composition cases, the ASCII fast path, and the NFC-invariant
      // U+FB03 ligature negative control
      """WITH t(id, s) AS (VALUES
           (1, 'e' || chr(769)),
           (2, 'n' || chr(771) || 'o'),
           (3, chr(8491)),
           (4, chr(4352) || chr(4449) || chr(4523)),
           (5, 'plain ascii text.'),
           (6, chr(64259)))
         SELECT id, nfc_normalize(s) AS nfc, length(s) AS len_raw,
           length(nfc_normalize(s)) AS len_nfc
         FROM t""",
    "doc_filter_stats" ->
      """WITH t AS (
           SELECT text,
             length(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
             length(regexp_replace(text, '\s+', '', 'g')) * 1.0
               / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) AS mean_wl
           FROM documents)
         SELECT count(*) AS total_records,
           count(CASE WHEN coalesce(n_chars >= 100, FALSE)
                       AND coalesce(n_digits * 1.0 / greatest(n_chars, 1) <= 0.2, FALSE)
                       AND coalesce(regexp_matches(text, '[.!?]\s*$'), FALSE)
                       AND coalesce(mean_wl >= 3 AND mean_wl <= 12, FALSE)
                      THEN 1 END) AS valid_records,
           count(CASE WHEN NOT coalesce(n_chars >= 100, FALSE) THEN 1 END) AS too_short_cnt,
           count(CASE WHEN NOT coalesce(n_digits * 1.0 / greatest(n_chars, 1) <= 0.2, FALSE)
                      THEN 1 END) AS digit_heavy_cnt,
           count(CASE WHEN NOT coalesce(regexp_matches(text, '[.!?]\s*$'), FALSE)
                      THEN 1 END) AS no_terminal_punct_cnt,
           count(CASE WHEN NOT coalesce(mean_wl >= 3 AND mean_wl <= 12, FALSE)
                      THEN 1 END) AS word_len_outlier_cnt
         FROM t""",
    "feature_prep" ->
      // Full second-engine replay of the ML feature table: modular cohort,
      // calendar features (DuckDB dayofweek is Sunday=0 → +1 for Spark's
      // Sunday=1), JSON prop extraction, median-centered distance, and
      // smoothed target encoding. percentile_approx(0.5, acc=10000)
      // matches quantile_disc exactly on these low-cardinality features
      // (cohort 0-9, hour 0-23) at the gate corpus — verified
      // column-for-column with zero diff.
      """WITH base AS (
           SELECT event_id, event_type,
             CAST(user_id % 10 AS DOUBLE) AS cohort,
             CAST(hour(ts) AS DOUBLE) AS hour_of_day,
             CAST(dayofweek(ts) + 1 AS DOUBLE) AS day_of_week,
             CAST(month(ts) AS DOUBLE) AS month,
             CAST(json_extract_string(props, '$.k') AS DOUBLE) AS prop_k,
             value
           FROM events),
         center AS (
           SELECT quantile_disc(cohort, 0.5) AS cx,
                  quantile_disc(hour_of_day, 0.5) AS cy FROM base),
         withdist AS (
           SELECT b.*, sqrt(pow(b.cohort - c.cx, 2)
             + pow(b.hour_of_day - c.cy, 2)) AS dist_from_center
           FROM base b CROSS JOIN center c),
         gm AS (SELECT avg(value) AS g FROM base),
         stats AS (
           SELECT event_type,
             (count(*) * avg(value) + 10 * (SELECT g FROM gm))
               / (count(*) + 10) AS event_type_target_encoded
           FROM base GROUP BY event_type)
         SELECT w.event_id, w.event_type, w.cohort, w.hour_of_day,
           w.day_of_week, w.month, w.prop_k, w.value, w.dist_from_center,
           s.event_type_target_encoded
         FROM withdist w
         LEFT JOIN stats s ON w.event_type IS NOT DISTINCT FROM s.event_type""",
    "target_encode" ->
      """WITH g AS (SELECT avg(value) AS gm FROM events),
            s AS (SELECT event_type, count(*) AS n, avg(value) AS m
                  FROM events GROUP BY event_type)
         SELECT s.event_type,
           (s.n * s.m + 10 * g.gm) / (s.n + 10) AS event_type_target_encoded
         FROM s CROSS JOIN g""",
    "target_encode_cv" ->
      """WITH fc AS (
           SELECT event_type, event_id % 5 AS fold,
             count(*) AS n_fc, sum(value) AS s_fc
           FROM events GROUP BY 1, 2)
         SELECT DISTINCT event_type, fold,
           round((sum(s_fc) OVER (PARTITION BY event_type) - s_fc
                  + 10 * ((sum(s_fc) OVER () - sum(s_fc) OVER (PARTITION BY fold))
                          / (sum(n_fc) OVER () - sum(n_fc) OVER (PARTITION BY fold))))
                 / (sum(n_fc) OVER (PARTITION BY event_type) - n_fc + 10), 4) AS encoded_cv
         FROM fc""",
    "risk_categorize" ->
      """SELECT CASE WHEN value >= 20 THEN 'Critical'
                     WHEN value >= 10 THEN 'High'
                     WHEN value >= 5 THEN 'Medium'
                     ELSE 'Low' END AS risk_level,
           count(*) AS cnt
         FROM events GROUP BY 1""",
    "model_feature_importance_check" ->
      // DuckDB's half: the assembled slot count is derivable from the data
      // alone — one one-hot slot per distinct non-null event_type (the
      // indexer's keep-slot is dropped by dropLast) + the 7 numeric
      // features (target_encoded, cohort, hour_of_day, day_of_week, month,
      // prop_k, dist_from_center). The two invariant booleans are pinned
      // TRUE: a fitted GBT's importances are a non-negative simplex, so
      // the percent normalization must close to 100.
      """SELECT CAST(count(DISTINCT event_type) + 7 AS BIGINT) AS n_features,
           true AS nonneg_ok, true AS pct_total_ok
         FROM events""",
    "stream_windowed_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS event_count, sum(value) AS total_value
         FROM events GROUP BY 1, 2""",
    "stream_sliding_counts" ->
      // hopping window via a 2-row spine: an event at t belongs to the
      // windows starting at trunc30(t) and trunc30(t) - 30min (exactly 2
      // for len=1h, slide=30min); both engines' 30-min grids align (epoch
      // and 2000-01-01 are both on the half-hour boundary)
      """SELECT time_bucket(INTERVAL '30 minutes', ts)
                - i * INTERVAL '30 minutes' AS window_start,
           event_type, count(*) AS event_count, sum(value) AS total_value
         FROM events CROSS JOIN range(0, 2) t(i)
         GROUP BY 1, 2""",
    "stream_sessions" ->
      // gaps-and-islands replay of session_window: a session breaks only
      // when the inter-event gap EXCEEDS 4h — windows that touch merge
      // (an event at exactly last+4h still extends the session; verified
      // against the engine); session_end = last event + 4h
      """WITH gaps AS (
           SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts > LAG(ts) OVER w + INTERVAL '4 hours'
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         islands AS (
           SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
           FROM gaps)
         SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '4 hours' AS session_end,
           user_id, count(*) AS n_events, sum(value) AS total_value
         FROM islands GROUP BY user_id, session_id""",
    "stream_correlate" ->
      """SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
           l.ts AS l_ts, r.ts AS r_ts
         FROM events l JOIN events r
           ON l.user_id = r.user_id
          AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL '30 minutes'
         WHERE l.event_type = 'click' AND r.event_type = 'purchase'""",
    "stream_upsert" ->
      // wave 2 re-delivered every 100th event with value+1000 at a later
      // stream batch — the merged lake table must show the update winning
      """SELECT event_id,
           CASE WHEN event_id % 100 = 0 THEN value + 1000 ELSE value END AS value
         FROM events""",
    "compact_partitions" ->
      // row-conservation replay: per-day counts must equal the source's
      // (compaction moves files, never rows); fragmentation before and
      // single-file-after are pinned TRUE for every day (8 hash tasks all
      // intersect every ~330-row day at the gate corpus)
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           count(*) AS n_rows,
           TRUE AS was_fragmented, TRUE AS compacted
         FROM events GROUP BY 1""",
    "stream_jsonl_ingest" ->
      // identical to jsonl_ingest's oracle: the streamed drain's telemetry
      // rollup must be indistinguishable from the batch profile
      """SELECT lang, FALSE AS is_corrupt, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY lang
         UNION ALL
         SELECT CAST(NULL AS VARCHAR), TRUE, CAST(2 AS BIGINT), CAST(NULL AS BIGINT)""",
    "jsonl_ingest" ->
      // valid rows roundtrip the parquet table exactly (per-lang doc and
      // char totals); the two planted malformed lines land in the corrupt
      // bucket (explicit is_corrupt flag, null group) with no chars counted
      """SELECT lang, FALSE AS is_corrupt, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY lang
         UNION ALL
         SELECT CAST(NULL AS VARCHAR), TRUE, CAST(2 AS BIGINT), CAST(NULL AS BIGINT)""",
    "paged_ingest" ->
      // Full second-engine replay of the DSv2 paged source: PageFetcher's
      // rows are a pure function of (page, i, seed=42), so DuckDB
      // regenerates all 16×2000 of them — the LCG mix done in HUGEINT with
      // an explicit mod-2^64 wrap to mirror Scala's 64-bit overflow, then
      // `// 65536` for the unsigned >>> 16 (the wrapped value is
      // non-negative, so floor division IS the logical shift).
      """WITH ids AS (SELECT range AS id FROM range(0, 16 * 2000)),
         h AS (
           SELECT ((id::HUGEINT * 6364136223846793005 + 42)
                   % 18446744073709551616) // 65536 AS h
           FROM ids),
         rows_ AS (
           SELECT
             list_extract(['click','view','purchase','signup'],
               CAST(h % 4 AS INT) + 1) AS event_type,
             CAST(h % 10000 AS DOUBLE) / 100.0 AS value
           FROM h)
         SELECT event_type, count(*) AS n_events,
           round(sum(value), 2) AS total_value
         FROM rows_ GROUP BY event_type""",
    "paged_cursor" ->
      // tail pages only: same LCG replay, ids in [12*2000, 16*2000)
      """WITH ids AS (SELECT range AS id FROM range(12 * 2000, 16 * 2000)),
         h AS (
           SELECT id, ((id::HUGEINT * 6364136223846793005 + 42)
                   % 18446744073709551616) // 65536 AS h
           FROM ids),
         rows_ AS (
           SELECT id, CAST(id // 2000 AS INTEGER) AS page,
             CAST(h % 10000 AS DOUBLE) / 100.0 AS value
           FROM h)
         SELECT page, count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           min(id) AS min_id, max(id) AS max_id
         FROM rows_ GROUP BY page""",
    "shard_export" ->
      // same key arithmetic as Sink.shardAssign/exportShards: first 4 md5
      // hex digits route the shard, first 8 (mod 1e9+7) feed the
      // order-insensitive checksum; token totals recount the source text
      """SELECT
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
             % 8 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
             w -> w <> ''))) AS BIGINT) AS n_tokens,
           CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 1000000007) AS BIGINT) AS checksum
         FROM documents GROUP BY 1""",
    "partitioned_sink" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n_rows,
         sum(value) AS total_value
         FROM events GROUP BY 1""",
    "sorted_layout" ->
      """SELECT count(*) AS n_rows, round(sum(value), 2) AS total_value,
           min(event_id) AS min_id, max(event_id) AS max_id
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND ts < TIMESTAMP '2024-01-15 00:00:00'""",
    "zorder_layout" ->
      """SELECT count(*) AS n_rows, round(sum(value), 2) AS total_value,
           min(event_id) AS min_id, max(event_id) AS max_id
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND ts < TIMESTAMP '2024-01-15 00:00:00'
           AND user_id >= 100 AND user_id < 300""",
    "zorder3_layout" ->
      """SELECT count(*) AS n_rows, round(sum(value), 2) AS total_value,
           min(event_id) AS min_id, max(event_id) AS max_id
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
           AND ts < TIMESTAMP '2024-01-15 00:00:00'
           AND user_id >= 100 AND user_id < 300
           AND value >= 10.0 AND value < 60.0""",
    "partitioned_sorted" ->
      """SELECT count(*) AS n_rows, round(sum(value), 2) AS total_value,
           min(event_id) AS min_id, max(event_id) AS max_id
         FROM events
         WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
           AND CAST(ts AS DATE) <= DATE '2024-01-14'
           AND ts >= TIMESTAMP '2024-01-10 06:00:00'
           AND ts < TIMESTAMP '2024-01-12 18:00:00'""",
    "bucketed_layout" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "cosine_topk" ->
      // same double-accumulation chain as Similarity.dot (float elements
      // cast to double, sequential fold): bit-identical across engines
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
           q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
                 FROM embeddings WHERE vec_id < 8)
         SELECT query_id, vec_id, cos, rank FROM (
           SELECT q.vec_id AS query_id, c.vec_id,
             list_dot_product(c.e, q.e)
               / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(q.e, q.e))) AS cos,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_dot_product(c.e, q.e)
                 / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(q.e, q.e))) DESC,
               c.vec_id) AS rank
           FROM c JOIN q ON c.vec_id <> q.vec_id) t
         WHERE rank <= 5""",
    "embedding_quantize" ->
      // mirrors Similarity.quantized/dequantize cast-for-cast: qvec from
      // the DOUBLE scale, dequantize through the stored FLOAT scale
      """WITH t AS (
           SELECT CAST(embedding AS DOUBLE[]) AS e,
             greatest(list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0 AS dscale
           FROM embeddings),
         q AS (
           SELECT e, CAST(dscale AS FLOAT) AS fscale,
             list_transform(e, x -> CAST(round(x / dscale) AS TINYINT)) AS qvec
           FROM t),
         d AS (
           SELECT e, CAST(list_transform(qvec,
             v -> CAST(CAST(v AS DOUBLE) * fscale AS FLOAT)) AS DOUBLE[]) AS dq
           FROM q),
         c AS (
           SELECT list_dot_product(e, dq)
             / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(dq, dq))) AS cos
           FROM d)
         SELECT count(*) AS n_vectors, round(min(cos), 4) AS worst_cosine,
           round(avg(cos), 4) AS avg_cosine
         FROM c""",
    "embedding_dedup" ->
      // golden oracle: the query plants jittered copies of vectors 0..19 at
      // id+1000000; the operator must recover exactly those pairs
      """SELECT i AS id_a, i + 1000000 AS id_b FROM range(0, 20) t(i)""",
    "semantic_dedup" ->
      // same golden planted pairs, recovered through TRAINED-cluster
      // blocking instead of random hyperplanes (a jittered copy assigns to
      // its original's cluster by the same centroid argmax)
      """SELECT i AS id_a, i + 1000000 AS id_b FROM range(0, 20) t(i)""",
    "minhash_planted_pairs" ->
      """SELECT i AS id_a, i + 1000000 AS id_b, 1.0 AS jaccard
         FROM range(0, 10) t(i)""",
    "bpe_merges" ->
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      // the 16 trained byte-level merges in rank order (deterministic
      // training: global word-freq dict, lexicographic tie-break);
      // symbols are 2-hex-digit UTF-8 bytes — on this pure-ASCII corpus
      // they are the hex rendering of the former char merges (e.g.
      // '65 72' = 'e r')
      """SELECT CAST(rank AS BIGINT) AS rank, pair FROM (VALUES
           (0,'65 72'),(1,'69 6e'),(2,'6f 77'),(3,'6f 72'),(4,'73 74'),
           (5,'6d 6572'),(6,'61 74'),(7,'6c 75'),(8,'61 72'),(9,'70 6172'),
           (10,'6a 6f'),(11,'6a6f 696e'),(12,'61 73'),(13,'6173 68'),
           (14,'68 617368'),(15,'72 6f77')) AS t(rank, pair)""",
    "bpe_fertility" ->
      // the bpe_token_count recursion (same pinned merge table) over the
      // plain corpus, rolled up per lang; ratios divide the exact integer
      // sums (identical doubles in any IEEE engine), zero-guard via nullif
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         words AS (
           SELECT doc_id, w, count(*) AS n_occ FROM (
             SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
             FROM documents) u WHERE w <> '' GROUP BY doc_id, w),
         dw AS (SELECT DISTINCT w FROM words),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         counts AS (
           SELECT w, len(string_split(s, ',')) - 2 AS n_tok
           FROM rec WHERE r = 16),
         perdoc AS (
           SELECT doc_id, sum(n_occ * n_tok) AS n_bpe, sum(n_occ) AS n_w
           FROM words JOIN counts USING (w) GROUP BY doc_id),
         perlang AS (
           SELECT d.lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(coalesce(p.n_w, 0)) AS BIGINT) AS n_words,
             CAST(sum(coalesce(p.n_bpe, 0)) AS BIGINT) AS n_tokens,
             CAST(sum(octet_length(encode(d.text))) AS BIGINT) AS n_bytes
           FROM documents d LEFT JOIN perdoc p USING (doc_id)
           GROUP BY 1)
         SELECT lang, n_docs, n_words, n_tokens, n_bytes,
           round(n_tokens / (1.0 * nullif(n_words, 0)), 4) AS tokens_per_word,
           round(n_bytes / (1.0 * nullif(n_tokens, 0)), 4) AS bytes_per_token
         FROM perlang""",
    "bpe_token_count" ->
      // full second-engine replay of byte-level BPE APPLICATION: the same
      // pinned merge table (gated by bpe_merges), applied as a recursive
      // first-occurrence replace over comma-delimited hex-byte-symbol
      // strings (regexp_extract_all over lower(hex(w)) = the word's UTF-8
      // bytes) — one recursion step merges one occurrence of the current
      // rank's pair, advancing rank when none remain; rank-monotone
      // application equals the min-rank loop because merging never
      // re-creates a consumed symbol. The corpus is documents plus the
      // PLANTED non-ASCII docs (chr() codepoints — byte-for-byte the
      // engine's \u literals) proving non-[a-z] text is counted, not
      // stripped. The final LEFT JOIN keeps a (doc_id, 0, 0) row for a
      // doc with zero words — matching the engine, which projects over
      // every doc
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9000001, 'caf' || chr(233) || ' d' || chr(233) || 'j' ||
                       chr(224) || ' na' || chr(239) || 've entr' ||
                       chr(233) || 'e'),
             (9000002, chr(252) || 'ber stra' || chr(223) || 'e gr' ||
                       chr(246) || chr(223) || 'er'),
             (9000003, chr(27169) || chr(22411) || ' ' || chr(35757) ||
                       chr(32451) || ' ' || chr(25968) || chr(25454))
           ) AS t(doc_id, text)),
         words AS (
           SELECT doc_id, w, count(*) AS n_occ FROM (
             SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
             FROM corpus) u WHERE w <> '' GROUP BY doc_id, w),
         dw AS (SELECT DISTINCT w FROM words),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         counts AS (
           SELECT w, len(string_split(s, ',')) - 2 AS n_tok
           FROM rec WHERE r = 16),
         perdoc AS (
           SELECT doc_id, sum(n_occ * n_tok) AS n_bpe, sum(n_occ) AS n_w
           FROM words JOIN counts USING (w) GROUP BY doc_id)
         SELECT c.doc_id,
           CAST(coalesce(p.n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
           CAST(coalesce(p.n_w, 0) AS BIGINT) AS n_words
         FROM corpus c LEFT JOIN perdoc p USING (doc_id)""",
    "bpe_encode" ->
      // full second-engine replay of byte-level BPE ENCODING: the
      // bpe_token_count recursion produces each distinct word's final
      // symbol string; symbols then map to ids — a 2-hex-digit symbol is
      // its byte value (char-position arithmetic, no hex-cast dependence),
      // a merged symbol is 256 + the smallest rank whose concatenation
      // matches (the engine's idMap rule). generate_subscripts+unnest
      // expand in lockstep, and per-doc positions rebuild from
      // (word index, symbol index) — so the COMPLETE id sequence of every
      // doc, planted non-ASCII included, is checked token for token
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9000001, 'caf' || chr(233) || ' d' || chr(233) || 'j' ||
                       chr(224) || ' na' || chr(239) || 've entr' ||
                       chr(233) || 'e'),
             (9000002, chr(252) || 'ber stra' || chr(223) || 'e gr' ||
                       chr(246) || chr(223) || 'er'),
             (9000003, chr(27169) || chr(22411) || ' ' || chr(35757) ||
                       chr(32451) || ' ' || chr(25968) || chr(25454))
           ) AS t(doc_id, text)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM corpus),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows)
         SELECT doc_id,
           row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
             AS pos,
           CAST(token_id AS BIGINT) AS token_id
         FROM wordpos JOIN ids USING (w)""",
    "bpe_vocab" ->
      // rebuilt from the same pinned merge table bpe_merges gates: 256
      // base-byte rows plus one row per FIRST-occurrence concatenation
      // (min-rank rule — a duplicate concatenation never mints an id)
      """WITH m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b))
         SELECT CAST(i AS BIGINT) AS token_id, printf('%02x', i) AS symbol_hex
         FROM range(0, 256) t(i)
         UNION ALL
         SELECT CAST(256 + rank AS BIGINT) AS token_id, a || b AS symbol_hex
         FROM m
         WHERE rank = (SELECT min(m2.rank) FROM m m2
                       WHERE m2.a || m2.b = m.a || m.b)""",
    "bpe_decode" ->
      // the roundtrip oracle computes the EXPECTED decode output with no
      // BPE machinery at all: decode(encode(text)) must equal text with
      // every \s+ run deleted (encode splits on \s+ and keeps no
      // end-of-word marker), byte for byte. The explicit class
      // [ \t\n\x0B\f\r] is exactly Java's \s (the kernel's split), spelled
      // out so RE2-vs-Java class differences can't leak in; planted
      // non-ASCII docs (chr() codepoints) prove multi-byte UTF-8 survives
      // the id roundtrip as STRINGS, not just ids
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9000001, 'caf' || chr(233) || ' d' || chr(233) || 'j' ||
                       chr(224) || ' na' || chr(239) || 've entr' ||
                       chr(233) || 'e'),
             (9000002, chr(252) || 'ber stra' || chr(223) || 'e gr' ||
                       chr(246) || chr(223) || 'er'),
             (9000003, chr(27169) || chr(22411) || ' ' || chr(35757) ||
                       chr(32451) || ' ' || chr(25968) || chr(25454))
           ) AS t(doc_id, text))
         SELECT doc_id,
           regexp_replace(text, '[ \t\n\x0B\f\r]+', '', 'g') AS decoded
         FROM corpus""",
    "packed_token_stream" ->
      // end-to-end replay of the training last mile: the bpe_encode
      // recursion yields each doc's token stream and count; md5-prefix
      // arithmetic reroutes the engine's shardOn override; the greedy
      // first-fit packer re-runs as a row-by-row recursive CTE whose
      // state transition is copied from Packing.packSequences (raw-n
      // overflow test, LEAST(n, budget) increment); window offsets plus
      // per-doc token order rebuild every stream position. 92k tokens,
      // checked token for token
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n > 512 THEN LEAST(o.n, 512)
                  ELSE p.used + LEAST(o.n, 512) END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, seq,
             coalesce(sum(n) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM pack)
         SELECT CAST(o.shard AS BIGINT) AS shard,
           CAST(o.seq AS BIGINT) AS seq_id,
           CAST(o.off + t.dpos AS BIGINT) AS pos,
           CAST(t.token_id AS BIGINT) AS token_id
         FROM offs o JOIN doctok t USING (doc_id)""",
    "packed_token_stream_eos" ->
      // the D29 replay with document separators: the recursive-CTE packer
      // charges one extra budget slot per doc (used + n + 1 > 512),
      // offsets advance by n + 1, and each doc contributes one EOS row
      // (reserved id 272 = 256 base + 16 merges) at off + n
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) + 1 AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n + 1 > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n + 1 > 512 THEN LEAST(o.n, 512) + 1
                  ELSE p.used + LEAST(o.n, 512) + 1 END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, n, seq,
             coalesce(sum(n + 1) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM pack)
         SELECT CAST(o.shard AS BIGINT) AS shard,
           CAST(o.seq AS BIGINT) AS seq_id,
           CAST(o.off + t.dpos AS BIGINT) AS pos,
           CAST(t.token_id AS BIGINT) AS token_id
         FROM offs o JOIN doctok t USING (doc_id)
         UNION ALL
         SELECT CAST(shard AS BIGINT), CAST(seq AS BIGINT),
           CAST(off + n AS BIGINT), CAST(272 AS BIGINT)
         FROM offs""",
    "packed_stream_roundtrip" ->
      // the consumer-side roundtrip: segment coordinates come from the
      // packer replay (merge recursion for per-doc token counts, md5
      // shard routing, the greedy first-fit CTE, rank-in-sequence by
      // doc id = the stream's segment order), but the EXPECTED text is
      // computed with no BPE machinery at all — the bpe_decode contract:
      // decode(segment) must equal the raw doc with every \s+ run
      // deleted, byte for byte
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         words AS (
           SELECT doc_id, w, count(*) AS n_occ FROM (
             SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
             FROM documents) u WHERE w <> '' GROUP BY doc_id, w),
         dw AS (SELECT DISTINCT w FROM words),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         counts AS (
           SELECT w, len(string_split(s, ',')) - 2 AS n_tok
           FROM rec WHERE r = 16),
         dcount AS (
           SELECT doc_id, CAST(sum(n_occ * n_tok) AS BIGINT) AS n
           FROM words JOIN counts USING (w) GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) + 1 AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n + 1 > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n + 1 > 512 THEN LEAST(o.n, 512) + 1
                  ELSE p.used + LEAST(o.n, 512) + 1 END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         seg AS (
           SELECT shard, doc_id, n, seq,
             row_number() OVER (PARTITION BY shard, seq ORDER BY doc_id)
               AS seg_idx
           FROM pack)
         SELECT CAST(s.shard AS BIGINT) AS shard,
           CAST(s.seq AS BIGINT) AS seq_id,
           CAST(s.seg_idx AS BIGINT) AS seg_idx,
           s.n AS n_tokens,
           regexp_replace(d.text, '[ \t\n\x0B\f\r]+', '', 'g') AS decoded
         FROM seg s JOIN documents d USING (doc_id)""",
    "token_stream_export_eos" ->
      // the separator stream's export manifest: same chain, rolled up per
      // shard — the position-weighted checksum now pins every EOS slot
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) + 1 AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n + 1 > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n + 1 > 512 THEN LEAST(o.n, 512) + 1
                  ELSE p.used + LEAST(o.n, 512) + 1 END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, n, seq,
             coalesce(sum(n + 1) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM pack),
         stream AS (
           SELECT o.shard, o.seq, o.off + t.dpos AS pos, t.token_id
           FROM offs o JOIN doctok t USING (doc_id)
           UNION ALL
           SELECT shard, seq, off + n AS pos, 272 AS token_id FROM offs)
         SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(DISTINCT seq) AS BIGINT) AS n_seqs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(((pos + 1) * token_id) % 1000000007) AS BIGINT)
             AS checksum
         FROM stream GROUP BY shard""",
    "token_stream_export" ->
      // the D29 replay chain (same CTEs as packed_token_stream) with the
      // export manifest aggregated per shard: sequence count, token
      // count, and the position-weighted checksum Σ (pos+1)·token_id
      // mod 1e9+7 — the gate proves the parquet write→read roundtrip
      // preserved every token AT its position
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n > 512 THEN LEAST(o.n, 512)
                  ELSE p.used + LEAST(o.n, 512) END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, seq,
             coalesce(sum(n) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM pack),
         stream AS (
           SELECT o.shard, o.seq, o.off + t.dpos AS pos, t.token_id
           FROM offs o JOIN doctok t USING (doc_id))
         SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(DISTINCT seq) AS BIGINT) AS n_seqs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(((pos + 1) * token_id) % 1000000007) AS BIGINT)
             AS checksum
         FROM stream GROUP BY shard""",
    "minhash_guard_stats" ->
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      // bucket census of the seeded banding chain at cap 1: 3828 band
      // buckets over 500 docs × 8 bands; 164 multi-member buckets (the
      // corpus's organic near-dup collisions) would drop 336 rows = 8.4%
      """SELECT CAST(3828 AS BIGINT) AS n_buckets,
           CAST(4000 AS BIGINT) AS banded_rows,
           CAST(164 AS BIGINT) AS buckets_capped,
           CAST(336 AS BIGINT) AS rows_dropped,
           0.084 AS drop_fraction""",
    "simhash_planted_pairs" ->
      """SELECT i AS id_a, i + 1000000 AS id_b, CAST(0 AS BIGINT) AS hamming
         FROM range(0, 10) t(i)""",
    "upsert_sink" ->
      """SELECT event_id, value FROM (
           SELECT event_id, value,
             row_number() OVER (PARTITION BY event_id ORDER BY version DESC) AS rn
           FROM (
             SELECT event_id, value, 0 AS version FROM events
             UNION ALL
             SELECT event_id, value + 1000, 1 FROM events
             WHERE event_id % 100 = 0 AND day(ts) <= 7) u) t
         WHERE rn = 1"""
  )

  /** Queries with NO `oracleSql` entry, by design — each is rows-only at
    * the driver but carries an oracle'd companion gate or a ScalaTest spec
    * pinning its semantics (EntrySurfaceSpec enforces this list stays
    * deliberate: any query missing an oracle AND absent here fails CI).
    *
    *  - minhash_dedup / simhash_dedup / ngram_jaccard / dedup_clusters /
    *    seq_packing / multimodal_meta: probabilistic or binary-payload
    *    outputs not SQL-expressible; each gated through a deterministic
    *    companion (`*_planted_pairs`, `*_exact`, `*_check`, `*_golden`).
    *  - fatality_model / prediction_perf / risk_crosstab: GBT fit outputs;
    *    pinned by FatalityModelSpec on deterministic seeds.
    */
  val rowsOnly: Set[String] = Set(
    "minhash_dedup", "simhash_dedup", "ngram_jaccard", "dedup_clusters",
    "seq_packing", "multimodal_meta",
    "fatality_model", "prediction_perf", "risk_crosstab",
    // per-slot GBT importances ride the same fit as C3/C5/C6 (float
    // goldens would flake); model_feature_importance_check is the
    // SQL-checkable companion gate
    "model_feature_importance")
}
