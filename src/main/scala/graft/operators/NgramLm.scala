package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — the CCNet/KenLM-style
  * quality gate every web-scale curation pipeline runs: train a cheap
  * n-gram LM on the corpus (or a trusted slice of it), score each
  * document's per-token negative log-likelihood, and drop the
  * high-perplexity tail (boilerplate, lorem-ipsum, OCR noise, wrong
  * language). The reference's quality tier stops at rule counts
  * (checks:730-860); an LM score is the standard next rung and is a pure
  * corpus-statistics computation, so it belongs in the engine.
  *
  * Model: word bigrams with add-k smoothing,
  * p(w2 | w1) = (c(w1,w2) + k) / (c(w1,·) + k·V), k = 1, V = corpus
  * vocabulary size. Scored on the training corpus itself — the standard
  * self-scoring setup for outlier detection (a doc unlike the corpus
  * scores high-NLL even though it contributed its own counts).
  *
  * Scale shape (the reason this is Spark-shaped and not a driver loop):
  * bigram construction is MAP-ONLY — `zip_with` over the per-doc token
  * array, no window, no per-doc shuffle. The model is two hash
  * aggregations over the exploded bigram stream — (w1,w2) counts and
  * w1-margin counts — both map-side-combinable, both bounded by the
  * OBSERVED bigram vocabulary (zipfian: sublinear in corpus bytes, e.g.
  * ~billions of rows at 100 TB while the stream is trillions). Scoring
  * re-joins the stream to the model on the bigram key: a plain shuffle
  * join — the model side is NOT broadcast by design (at corpus scale it
  * exceeds driver memory; at gate scale AQE turns it into a broadcast on
  * its own stats) — with hot bigrams ("the the") handled by AQE skew
  * splitting since the model side carries one row per key (MEASURED,
  * not trusted: the LmSkewScale probe plants a single-key head at sf10
  * and the split fires — one skew=true SMJ node in the final adaptive
  * plan, 1.18× wall saved; LmSkewSpec pins the plan shape). The per-doc
  * reduce is an ordinary partial-aggregating groupBy. Nothing touches
  * the driver; every stage is O(token stream) with sublinear state.
  *
  * Determinism across engines: per-doc log-prob SUMS are rounded to 4dp
  * (the q3 revenue pattern — accumulation order differs, the rounded sum
  * doesn't), and avg-NLL / perplexity derive from the ALREADY-ROUNDED
  * sum so both engines divide identical doubles.
  */
object NgramLm {

  /** Lowercased whitespace tokens as an array, empties filtered — the
    * shared [[TextOps.lowerToks]] regime, oracle-replayable verbatim. */
  private def toks(text: org.apache.spark.sql.Column) =
    TextOps.lowerToks(text)

  /** (doc_id, w1, w2) bigram stream — map-only. */
  private def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = greatest(size(col("__ws")) - 1, lit(0))
    df.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__ws"))
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("__ws"), lit(1), n), slice(col("__ws"), lit(2), n),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
  }

  /** The trained model: one row per observed bigram with its smoothed
    * log-probability. `v` (vocab size) attaches as a broadcast 1-row
    * scalar; the margin join is model-to-model (tiny vs the stream). */
  def model(df: DataFrame, idCol: String, textCol: String,
            k: Double = 1.0): DataFrame = {
    val bi = bigrams(df, idCol, textCol)
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // margins from the AGGREGATED model table, not a second corpus pass:
    // c(w1,·) = Σ_w2 c(w1,w2) — same values, and the c12 shuffle is
    // shared between both branches via ReusedExchange, so the token
    // explode runs once here instead of twice
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = df.select(explode(toks(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    c12.join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((col("c12") + lit(k)) / (col("c1") + lit(k) * col("v"))))
  }

  /** Per-document LM score: bigram count, rounded log-prob sum, average
    * NLL, perplexity, and the keep verdict (avg NLL ≤ `nllKeep` nats).
    * Docs with < 2 tokens are unscoreable: n_bigrams 0, null scores,
    * keep = false (a one-token doc is not trainable text). */
  def score(df: DataFrame, idCol: String, textCol: String,
            k: Double = 1.0, nllKeep: Double = 6.0): DataFrame = {
    val m = model(df, idCol, textCol, k).select("w1", "w2", "logp")
    val scored = bigrams(df, idCol, textCol)
      .join(m, Seq("w1", "w2")) // inner: every stream bigram is in the model
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("logp")), 4).as("logprob_sum"))
      .withColumn("avg_nll", round(-col("logprob_sum") / col("n_bigrams"), 4))
      .withColumn("ppl", round(exp(col("avg_nll")), 4))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("logprob_sum"), col("avg_nll"), col("ppl"),
        coalesce(col("avg_nll") <= lit(nllKeep), lit(false)).as("keep"))
  }

  /** Cross-scoring — the actual CCNet setup: train the LM on a TRUSTED
    * slice (Wikipedia-grade sources), score a different corpus with it.
    * Unlike [[score]]'s self-scoring (where every stream bigram exists in
    * the model and an inner join suffices), a foreign doc carries unseen
    * bigrams, so scoring backs off through the smoothing mass: seen
    * (w1,w2) → model logp; unseen w2 under a seen w1 → ln(k/(c(w1,·)+k·V));
    * w1 never seen → ln(k/(0+k·V)) = ln(1/V). `n_oov` counts the misses —
    * the out-of-domain signal a curation dashboard watches alongside ppl.
    *
    * Scale shape: same as [[score]] plus one margins join (w1-keyed,
    * vocab-bounded) — both model-side frames stay shuffle-joined by
    * default and AQE-broadcast at gate scale. */
  def scoreAgainst(train: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Double = 1.0,
                   nllKeep: Double = 6.0): DataFrame = {
    val (m, margins, vocab) = servingFrames(train, idCol, textCol, k)
    scoreWithModel(target, m, margins, vocab, idCol, textCol, k, nllKeep)
  }

  /** The three serving frames a long-lived scorer persists once:
    * (model (w1,w2,logp), margins (w1,c1), vocab 1-row (v)). The model
    * frame is persisted HERE (tracked, so the per-query cache release
    * retires it) and margins/vocab derive from it: without the cut, the
    * three consumers each re-ran the full training subtrees — the plan
    * audit read 18 corpus scans with zero ReusedExchange in one
    * cross-score query. Vocab is its own corpus aggregate, NOT
    * m.select("v").limit(1): a train corpus of only sub-2-token docs has
    * an EMPTY model but a real vocabulary, and the unseen-w1 backoff
    * ln(1/V) must still see it. */
  def servingFrames(train: DataFrame, idCol: String, textCol: String,
                    k: Double = 1.0): (DataFrame, DataFrame, DataFrame) = {
    val m = Dedup.persistTracked(model(train, idCol, textCol, k))
    (m.select("w1", "w2", "logp"), m.select("w1", "c1").distinct(),
      Dedup.persistTracked(
        train.select(explode(toks(col(textCol))).as("w"))
          .agg(countDistinct(col("w")).as("v"))))
  }

  /** Backoff scoring against PREBUILT model frames — the serving form:
    * a long-lived (persisted) model scores many batches without
    * retraining (the streaming tier drains micro-batches through this).
    * `model` = (w1, w2, logp), `margins` = (w1, c1), `vocab` = the 1-row
    * (v) frame. Semantics identical to [[scoreAgainst]]'s scoring half. */
  def scoreWithModel(target: DataFrame, model: DataFrame, margins: DataFrame,
                     vocab: DataFrame, idCol: String, textCol: String,
                     k: Double = 1.0, nllKeep: Double = 6.0): DataFrame = {
    val scored = bigrams(target, idCol, textCol)
      .join(model, Seq("w1", "w2"), "left")
      .join(margins, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", coalesce(col("logp"),
        log(lit(k) / (coalesce(col("c1"), lit(0L)) + lit(k) * col("v")))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("logp").isNull, 1L).otherwise(0L)).as("n_oov"),
        round(sum(col("__lp")), 4).as("logprob_sum"))
      .withColumn("avg_nll", round(-col("logprob_sum") / col("n_bigrams"), 4))
      .withColumn("ppl", round(exp(col("avg_nll")), 4))
    target.select(col(idCol).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        col("logprob_sum"), col("avg_nll"), col("ppl"),
        coalesce(col("avg_nll") <= lit(nllKeep), lit(false)).as("keep"))
  }

  /** CCNet perplexity-tertile assignment (Wenzek et al. 2020 §4 — public
    * knowledge): the standard corpus-quality stratification splits the
    * corpus into head/middle/tail thirds by LM score against the trusted
    * slice, and downstream mixes sample the head hardest. Docs the LM
    * cannot score (< 2 tokens) land in an explicit `unscored` bucket.
    *
    * DELIBERATELY threshold-based, not ntile: a global ntile window is a
    * single-partition sort of one-row-per-doc — the one shape that dies
    * at corpus scale (and CCNet itself assigns by percentile THRESHOLD).
    * The tertile cutoffs here come from a histogram of the 4dp-rounded
    * avg_nll values: `groupBy(avg_nll).count()` map-side combines to a
    * frame bounded by the VALUE SPACE (a few 10⁵ distinct 4dp values at
    * any corpus size), the cumulative window runs over that bounded
    * frame, and the two cutoffs broadcast back as a 1-row frame — the
    * corpus itself never sorts. Cut selection uses cross-multiplied
    * integer comparisons (3·cum ≥ n, 3·cum ≥ 2n), so both engines pick
    * identical cutoffs; bucket membership is value-based (every doc with
    * the same rounded avg_nll lands in the same bucket), which is also
    * the semantically right tie behavior — ntile would split a tie
    * group across buckets by arbitrary row order. */
  def bucketAssign(train: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Double = 1.0): DataFrame =
    bucketize(scoreAgainst(train, target, idCol, textCol, k))

  private[graft] def bucketize(rawScores: DataFrame): DataFrame = {
    // the skinny per-doc score frame feeds BOTH the histogram/cutoff path
    // and the final assignment join — persist it (tracked, released by
    // the shared unpersist discipline) or the whole scoring join re-runs
    // once per consumer (the curation_funnel zero-ReusedExchange lesson)
    val scores = Dedup.persistTracked(rawScores)
    assignBuckets(scores, cutoffs(scores))
  }

  /** Tertile cutoffs as a 1-row (cut_head, cut_middle) frame — the
    * value-bounded histogram + cross-multiplied cut selection described
    * on [[bucketAssign]]. Factored out so a serving deployment (the E12
    * stream) can compute cutoffs ONCE from the reference corpus and
    * assign arriving batches against the static frame. */
  private[graft] def cutoffs(scores: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scoreable = scores.filter(col("avg_nll").isNotNull)
    val hist = scoreable.groupBy("avg_nll").agg(count(lit(1)).as("cnt"))
    // bounded-frame window: |hist| ≤ |distinct 4dp nll values|
    val cumW = Window.orderBy(col("avg_nll"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = scoreable.agg(count(lit(1)).as("n_total"))
    hist.withColumn("cum", sum(col("cnt")).over(cumW))
      .crossJoin(broadcast(total))
      .agg(
        min(when(col("cum") * 3 >= col("n_total"), col("avg_nll")))
          .as("cut_head"),
        min(when(col("cum") * 3 >= col("n_total") * 2, col("avg_nll")))
          .as("cut_middle"))
  }

  /** Value-based bucket membership against a (possibly precomputed)
    * cutoff frame: every doc with the same rounded avg_nll lands in the
    * same bucket, unscoreable docs in `unscored`. */
  private[graft] def assignBuckets(scores: DataFrame,
                                   cuts: DataFrame): DataFrame =
    scores.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("avg_nll").isNull, lit("unscored"))
          .when(col("avg_nll") <= col("cut_head"), lit("head"))
          .when(col("avg_nll") <= col("cut_middle"), lit("middle"))
          .otherwise(lit("tail")))

  /** The per-bucket census — the head/middle/tail dashboard row a CCNet
    * run publishes: doc and bigram mass, OOV mass, the nll range each
    * bucket actually spans, and the two global cutoffs that defined it.
    * O(4) rows out of one aggregation over [[bucketAssign]]. */
  def perplexityBuckets(train: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, k: Double = 1.0): DataFrame =
    bucketAssign(train, target, idCol, textCol, k)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        sum(col("n_oov")).as("n_oov"),
        min(col("avg_nll")).as("min_nll"),
        max(col("avg_nll")).as("max_nll"),
        max(col("cut_head")).as("cut_head"),
        max(col("cut_middle")).as("cut_middle"))

  // ---------------------------------------------------------------------
  // Interpolated Kneser-Ney TRIGRAM tier — the next rung above the add-k
  // bigram: CCNet's actual gate is a KenLM 5-gram with modified KN
  // smoothing (Wenzek 2020 §3; Kneser & Ney 1995; Chen & Goodman 1999 —
  // all public), and add-k is known to misassign mass on exactly the
  // head-heavy zipfian distributions a quality gate filters. This is
  // textbook INTERPOLATED KN with one fixed discount D: the highest
  // order discounts raw counts, lower orders use CONTINUATION counts
  // (how many distinct contexts a word completes — "Francisco" is
  // frequent but only ever follows "San", so its continuation mass is
  // tiny), and the final rung interpolates with uniform 1/V so OOV
  // words keep nonzero mass.
  //
  //   p(w3|w1w2) = (max(c(w1w2w3)−D,0) + D·T(w1w2·)·p(w3|w2)) / c(w1w2·)
  //   p(w3|w2)   = (max(N1+(·w2w3)−D,0) + D·T(w2·)·p(w3)) / N1+(·w2·)
  //   p(w3)      = (max(N1+(·w3)−D,0) + D·W/V) / B
  // with T(·) = distinct-continuation type counts, N1+ = continuation
  // counts from the next-higher type table (trigram types for the
  // middle rung, raw bigram TYPES for the unigram rung), B = total
  // bigram types, W = |{w : N1+(·w) > 0}|, V = vocab. An unseen context
  // (null denominator) backs off wholesale to the next rung.
  //
  // Everything is a plain aggregate — trigram counts, type counts per
  // context, continuation counts are counts over the TYPE table — so a
  // second engine replays the full ladder in SQL, and the engine-
  // exactness discipline is the family's: integer counts combine in
  // fixed expression trees (IEEE ops on identical doubles are
  // bit-identical across engines; D = 0.75 is exact binary), ln() may
  // drift 1 ulp, and the per-doc SUM rounds to 4dp before any ratio.
  //
  // Scale shape: the trigram stream is map-only (nested zip_with, no
  // window); the model is one groupBy over the stream plus THREE
  // aggregations over the already-aggregated TYPE tables (each
  // zipfian-sublinear in corpus bytes); scoring is the stream left-
  // joined to five skinny model frames — shuffle joins by default (the
  // model outgrows the driver at corpus scale), AQE-broadcast at gate
  // scale, hot heads (the "the the the" keys) split by AQE skew
  // handling exactly as the bigram tier's scoring join.
  // ---------------------------------------------------------------------

  /** (doc_id, w1, w2, w3) trigram stream — map-only. */
  private def trigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = greatest(size(col("__ws")) - 2, lit(0))
    df.select(col(idCol).as("doc_id"), toks(col(textCol)).as("__ws"))
      .select(col("doc_id"),
        explode(zip_with(
          zip_with(slice(col("__ws"), lit(1), n), slice(col("__ws"), lit(2), n),
            (a, b) => struct(a.as("w1"), b.as("w2"))),
          slice(col("__ws"), lit(3), n),
          (p, c) => struct(p.getField("w1").as("w1"),
            p.getField("w2").as("w2"), c.as("w3")))).as("tg"))
      .select(col("doc_id"), col("tg.w1"), col("tg.w2"), col("tg.w3"))
  }

  /** The six KN serving frames, all derived from ONE trigram aggregation
    * plus one bigram-type pass (the continuation rung needs raw bigram
    * TYPES, which the trigram table cannot supply — a (w2,w3) bigram at a
    * document's edge belongs to no trigram). The trigram type table is
    * persisted (tracked) because four of the frames aggregate FROM it —
    * without the cut each consumer re-runs the corpus explode. */
  final case class KnFrames(tri: DataFrame, ctx2: DataFrame, contb: DataFrame,
                            mid: DataFrame, contu: DataFrame, scalars: DataFrame)

  /** `minCount` > 1 enables count-cutoff PRUNING (the KenLM `--prune`
    * recipe — public knowledge; singletons dominate a zipfian trigram
    * table and carry the least signal, so dropping them shrinks the
    * model far faster than it moves scores): trigrams below the cutoff
    * are removed BEFORE estimation and every downstream frame (context
    * margins, type counts, continuation counts) derives from the KEPT
    * table, so each surviving context's rung stays a PROPER distribution
    * — Σ_kept(c3 − D) + D·T = cctx exactly because cctx is the kept sum
    * — and a fully-pruned context backs off wholesale through the
    * ladder's existing null-denominator arm. The unigram rung (raw
    * bigram types) is never pruned, the KenLM convention. */
  def knFrames(train: DataFrame, idCol: String, textCol: String,
               minCount: Long = 1L): KnFrames = {
    require(minCount >= 1, "minCount must be >= 1")
    val tri = Dedup.persistTracked(
      trigrams(train, idCol, textCol)
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3")))
    // c(w1w2·) and T(w1w2·): the trigram-context margins
    val ctx2 = tri.groupBy("w1", "w2")
      .agg(sum(col("c3")).as("cctx"), count(lit(1)).as("t2"))
    // N1+(·w2w3): distinct w1 preceding — one row per (w2,w3) over types
    val contb = Dedup.persistTracked(
      tri.groupBy("w2", "w3").agg(count(lit(1)).as("cb")))
    // N1+(·w2·) = Σ_w3 N1+(·w2w3) and T(w2·) = |{w3 : N1+(·w2w3) > 0}| —
    // both fold over contb, not a third corpus pass
    val mid = contb.groupBy("w2")
      .agg(sum(col("cb")).as("nmid"), count(lit(1)).as("ndw3"))
    // unigram continuation counts from raw bigram TYPES
    val bt = Dedup.persistTracked(
      bigrams(train, idCol, textCol).select("w1", "w2").distinct())
    val contu = bt.groupBy("w2").agg(count(lit(1)).as("cu"))
    val scalars = contu.agg(sum(col("cu")).as("b"), count(lit(1)).as("wtypes"))
      .crossJoin(broadcast(
        train.select(explode(toks(col(textCol))).as("w"))
          .agg(countDistinct(col("w")).as("v"))))
    val base = KnFrames(tri, ctx2, contb, mid, contu, scalars)
    if (minCount == 1L) base else knPruned(base, minCount)
  }

  /** The count-cutoff-pruned frames DERIVED from already-built ones (no
    * second corpus pass — the prune-stats census scores both models off
    * one trigram aggregation): the kept trigram table re-aggregates into
    * its own context margins, type counts, and continuation counts, so
    * every rung above the (never-pruned) unigram one is estimated on the
    * pruned table and stays proper; the unigram rung and the scalar frame
    * are shared with the base model by construction. */
  def knPruned(f: KnFrames, minCount: Long): KnFrames = {
    require(minCount >= 1, "minCount must be >= 1")
    val tri = Dedup.persistTracked(f.tri.filter(col("c3") >= minCount))
    val ctx2 = tri.groupBy("w1", "w2")
      .agg(sum(col("c3")).as("cctx"), count(lit(1)).as("t2"))
    val contb = Dedup.persistTracked(
      tri.groupBy("w2", "w3").agg(count(lit(1)).as("cb")))
    val mid = contb.groupBy("w2")
      .agg(sum(col("cb")).as("nmid"), count(lit(1)).as("ndw3"))
    KnFrames(tri, ctx2, contb, mid, f.contu, f.scalars)
  }

  /** Per-doc interpolated-KN trigram score against prebuilt frames.
    * Output mirrors the bigram tier's ledger plus the backoff census:
    * `n_hit3`/`n_hit2` count trigram/continuation-bigram model hits (the
    * in-domain signal; their complements are the OOV mass per rung).
    * Docs with < 3 tokens are unscoreable (n_trigrams 0, null scores,
    * keep false) — no sentence-boundary padding, the family convention.
    * Expression grouping is FROZEN (mirrored verbatim by the oracle):
    * p1 = (max(cu−D,0) + (D·W)/V) / B
    * p2 = (max(cb−D,0) + (D·ndw3)·p1) / nmid     [nmid null → p1]
    * p3 = (max(c3−D,0) + (D·t2)·p2) / cctx       [cctx null → p2] */
  def knScoreWithFrames(target: DataFrame, f: KnFrames, idCol: String,
                        textCol: String, discount: Double = 0.75,
                        nllKeep: Double = 3.5): DataFrame = {
    val d = lit(discount)
    val p1 = (greatest(coalesce(col("cu"), lit(0L)) - d, lit(0.0))
      + (d * col("wtypes")) / col("v")) / col("b")
    val p2of = (p1c: Column) => when(col("nmid").isNull, p1c)
      .otherwise((greatest(coalesce(col("cb"), lit(0L)) - d, lit(0.0))
        + (d * col("ndw3")) * p1c) / col("nmid"))
    val p3of = (p2c: Column) => when(col("cctx").isNull, p2c)
      .otherwise((greatest(coalesce(col("c3"), lit(0L)) - d, lit(0.0))
        + (d * col("t2")) * p2c) / col("cctx"))
    val scored = trigrams(target, idCol, textCol)
      .join(f.tri, Seq("w1", "w2", "w3"), "left")
      .join(f.ctx2, Seq("w1", "w2"), "left")
      .join(f.contb, Seq("w2", "w3"), "left")
      .join(f.mid, Seq("w2"), "left")
      .join(f.contu.withColumnRenamed("w2", "w3"), Seq("w3"), "left")
      .crossJoin(broadcast(f.scalars))
      // rungs as SEPARATE named columns: inlining p3of(p2of(p1)) copies
      // the p1 tree into both branches of every enclosing CASE (4× by
      // the top rung); CollapseProject keeps non-cheap multi-use aliases
      // un-inlined, so each rung evaluates once per row
      .withColumn("__p1", p1)
      .withColumn("__p2", p2of(col("__p1")))
      .withColumn("__lp", log(p3of(col("__p2"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("c3").isNotNull, 1L).otherwise(0L)).as("n_hit3"),
        sum(when(col("cb").isNotNull, 1L).otherwise(0L)).as("n_hit2"),
        round(sum(col("__lp")), 4).as("logprob_sum"))
      // avg_nll at 4dp via EXACT integer arithmetic: the float form
      // round(-sum/n, 4) landed a doc exactly on a .00005 boundary where
      // the engines' round() implementations split — scale the already-
      // rounded sum to an exact Long and do half-up in integer division
      // ((2P + n) div 2n), which both engines compute identically
      .withColumn("__p4", round(-col("logprob_sum") * 10000).cast("long"))
      .withColumn("avg_nll",
        expr("(__p4 * 2 + n_trigrams) div (n_trigrams * 2)")
          .cast("double") / 10000.0)
      .withColumn("ppl", round(exp(col("avg_nll")), 4))
    target.select(col(idCol).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_hit3"), lit(0L)).as("n_hit3"),
        coalesce(col("n_hit2"), lit(0L)).as("n_hit2"),
        col("logprob_sum"), col("avg_nll"), col("ppl"),
        coalesce(col("avg_nll") <= lit(nllKeep), lit(false)).as("keep"))
  }

  /** Train-on-trusted / score-foreign composition for the KN tier — the
    * CCNet cross-scoring setup, one call. */
  def knScoreAgainst(train: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, discount: Double = 0.75,
                     nllKeep: Double = 3.5, minCount: Long = 1L): DataFrame =
    knScoreWithFrames(target, knFrames(train, idCol, textCol, minCount),
      idCol, textCol, discount, nllKeep)

  // ---------------------------------------------------------------------
  // MODIFIED Kneser-Ney (D31d) — KenLM's actual smoothing (Chen & Goodman
  // 1999 §3): instead of one fixed discount, each count class gets its
  // own, ESTIMATED from the count-of-counts of the very table being
  // discounted — singletons are mostly noise and discount hardest:
  //   Y  = n1/(n1 + 2·n2)
  //   D1 = 1 − 2Y·n2/n1,  D2 = 2 − 3Y·n3/n2,  D3+ = 3 − 4Y·n4/n3
  // applied as D(c) = D1/D2/D3+ for c = 1 / 2 / ≥3, with the
  // interpolation weight carrying exactly the discounted mass:
  //   λ(ctx) = (D1·N1(ctx) + D2·N2(ctx) + D3+·N3+(ctx)) / c(ctx)
  // where Nk(ctx) counts the w3 types whose count is in class k — so
  // every rung stays a PROPER distribution (Σ_w3 p = 1, the spec
  // property). The trigram rung discounts raw counts with discounts from
  // the raw count-of-counts; the middle rung discounts continuation
  // counts with discounts from THEIR count-of-counts; the unigram rung
  // keeps [[knFrames]]'s 1/V-interpolated continuation form (fixed 0.75
  // — the rung carries ~no mass and KenLM's unigram handling is likewise
  // simplified). Estimated discounts can be degenerate on small or
  // unusual corpora (a zero count-of-count, or a negative D2/D3+ when
  // n3/n2 or n4/n3 is large — then λ could go negative and ln(p) NaN):
  // the standard guard falls back to the fixed-0.75 ladder for that
  // rung, mirrored verbatim in the oracle's CASE. Count-of-counts are
  // two 4-scalar aggregates over the already-built type tables — the
  // model costs ONE extra pass over each (bounded) table, nothing over
  // the corpus.
  // ---------------------------------------------------------------------

  /** `tDisc`/`bDisc` are the (D1, D2, D3+) discount triples for the
    * trigram and continuation rungs — MODEL CONSTANTS, computed once at
    * frame-build time from the count-of-counts (a bounded 1-row collect,
    * the KenLM shape: discounts ship inside the model file). Embedding
    * them as literals keeps the scoring expression the same size as the
    * fixed-D ladder's — the per-row CASE-tree form measured a ~5×
    * heavier data term at sf1. */
  final case class MknFrames(tri: DataFrame, ctx2: DataFrame,
                             contb: DataFrame, mid: DataFrame,
                             contu: DataFrame, scalars: DataFrame,
                             tDisc: (Double, Double, Double),
                             bDisc: (Double, Double, Double))

  def mknFrames(train: DataFrame, idCol: String, textCol: String): MknFrames = {
    val tri = Dedup.persistTracked(
      trigrams(train, idCol, textCol)
        .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3")))
    // context margins + per-class type counts N1/N2/N3+(w1w2·)
    val ctx2 = tri.groupBy("w1", "w2")
      .agg(sum(col("c3")).as("cctx"),
        sum(when(col("c3") === 1L, 1L).otherwise(0L)).as("tn1"),
        sum(when(col("c3") === 2L, 1L).otherwise(0L)).as("tn2"),
        sum(when(col("c3") >= 3L, 1L).otherwise(0L)).as("tn3"))
    val contb = Dedup.persistTracked(
      tri.groupBy("w2", "w3").agg(count(lit(1)).as("cb")))
    val mid = contb.groupBy("w2")
      .agg(sum(col("cb")).as("nmid"),
        sum(when(col("cb") === 1L, 1L).otherwise(0L)).as("bn1"),
        sum(when(col("cb") === 2L, 1L).otherwise(0L)).as("bn2"),
        sum(when(col("cb") >= 3L, 1L).otherwise(0L)).as("bn3"))
    val bt = Dedup.persistTracked(
      bigrams(train, idCol, textCol).select("w1", "w2").distinct())
    val contu = bt.groupBy("w2").agg(count(lit(1)).as("cu"))
    // count-of-counts → discounts, ONCE, driver-side (two bounded 1-row
    // collects over the persisted type tables — materializing them here
    // also means every later consumer reads the cache)
    val tDisc = discountsOf(tri.groupBy("c3").agg(count(lit(1)).as("n"))
      .filter(col("c3").between(1L, 4L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val bDisc = discountsOf(contb.groupBy("cb").agg(count(lit(1)).as("n"))
      .filter(col("cb").between(1L, 4L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val scalars = contu.agg(sum(col("cu")).as("b"), count(lit(1)).as("wtypes"))
      .crossJoin(broadcast(
        train.select(explode(toks(col(textCol))).as("w"))
          .agg(countDistinct(col("w")).as("v"))))
    MknFrames(tri, ctx2, contb, mid, contu, scalars, tDisc, bDisc)
  }

  /** The modified-KN frames DERIVED from already-built fixed-D frames —
    * no second corpus pass: tri/contb/contu/scalars are shared outright,
    * only the per-context CLASS columns (tn/bn) re-aggregate from the
    * persisted type tables and the two count-of-count collects run over
    * the cache. The kn-vs-mkn crosstab scores both gates off ONE trigram
    * aggregation this way (the shape its SQL oracle replays — the
    * independent-builds first cut paid the corpus trigram shuffle and
    * its persist footprint twice per run). */
  def mknFrom(f: KnFrames): MknFrames = {
    val ctx2 = f.tri.groupBy("w1", "w2")
      .agg(sum(col("c3")).as("cctx"),
        sum(when(col("c3") === 1L, 1L).otherwise(0L)).as("tn1"),
        sum(when(col("c3") === 2L, 1L).otherwise(0L)).as("tn2"),
        sum(when(col("c3") >= 3L, 1L).otherwise(0L)).as("tn3"))
    val mid = f.contb.groupBy("w2")
      .agg(sum(col("cb")).as("nmid"),
        sum(when(col("cb") === 1L, 1L).otherwise(0L)).as("bn1"),
        sum(when(col("cb") === 2L, 1L).otherwise(0L)).as("bn2"),
        sum(when(col("cb") >= 3L, 1L).otherwise(0L)).as("bn3"))
    val tDisc = discountsOf(f.tri.groupBy("c3").agg(count(lit(1)).as("n"))
      .filter(col("c3").between(1L, 4L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val bDisc = discountsOf(f.contb.groupBy("cb").agg(count(lit(1)).as("n"))
      .filter(col("cb").between(1L, 4L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    MknFrames(f.tri, ctx2, f.contb, mid, f.contu, f.scalars, tDisc, bDisc)
  }

  /** The three per-class discounts from a {count → count-of-count} map,
    * with the degenerate-estimate guard (any empty class or non-positive
    * estimate → the fixed-0.75 ladder for the whole rung). Plain-double
    * arithmetic with the SAME grouping the oracle replays in SQL —
    * identical IEEE results. */
  private def discountsOf(coc: Map[Long, Long]): (Double, Double, Double) = {
    val n1 = coc.getOrElse(1L, 0L); val n2 = coc.getOrElse(2L, 0L)
    val n3 = coc.getOrElse(3L, 0L); val n4 = coc.getOrElse(4L, 0L)
    if (n1 == 0L || n2 == 0L || n3 == 0L || n4 == 0L) (0.75, 0.75, 0.75)
    else {
      val y = n1 / (n1 + 2.0 * n2)
      val d1 = 1.0 - (2.0 * y) * (n2.toDouble / n1)
      val d2 = 2.0 - (3.0 * y) * (n3.toDouble / n2)
      val d3 = 3.0 - (4.0 * y) * (n4.toDouble / n3)
      if (d1 > 0.0 && d2 > 0.0 && d3 > 0.0) (d1, d2, d3)
      else (0.75, 0.75, 0.75)
    }
  }

  /** Per-doc MODIFIED-KN trigram score against prebuilt frames — the
    * [[knScoreWithFrames]] ladder with per-class estimated discounts at
    * the trigram and continuation-bigram rungs. Same output schema and
    * engine-exactness discipline. */
  def mknScoreWithFrames(target: DataFrame, f: MknFrames, idCol: String,
                         textCol: String,
                         nllKeep: Double = 3.5): DataFrame = {
    val (td1, td2, td3) = (lit(f.tDisc._1), lit(f.tDisc._2), lit(f.tDisc._3))
    val (bd1, bd2, bd3) = (lit(f.bDisc._1), lit(f.bDisc._2), lit(f.bDisc._3))
    val p1 = (greatest(coalesce(col("cu"), lit(0L)) - lit(0.75), lit(0.0))
      + (lit(0.75) * col("wtypes")) / col("v")) / col("b")
    val dOf = (c: Column, d1: Column, d2: Column, d3: Column) =>
      when(c === 1L, d1).when(c === 2L, d2).otherwise(d3)
    val p2of = (p1c: Column) => when(col("nmid").isNull, p1c)
      .otherwise((
        when(col("cb").isNull, lit(0.0))
          .otherwise(greatest(col("cb") - dOf(col("cb"), bd1, bd2, bd3),
            lit(0.0)))
          + (bd1 * col("bn1") + bd2 * col("bn2") + bd3 * col("bn3")) * p1c)
        / col("nmid"))
    val p3of = (p2c: Column) => when(col("cctx").isNull, p2c)
      .otherwise((
        when(col("c3").isNull, lit(0.0))
          .otherwise(greatest(col("c3") - dOf(col("c3"), td1, td2, td3),
            lit(0.0)))
          + (td1 * col("tn1") + td2 * col("tn2") + td3 * col("tn3")) * p2c)
        / col("cctx"))
    val scored = trigrams(target, idCol, textCol)
      .join(f.tri, Seq("w1", "w2", "w3"), "left")
      .join(f.ctx2, Seq("w1", "w2"), "left")
      .join(f.contb, Seq("w2", "w3"), "left")
      .join(f.mid, Seq("w2"), "left")
      .join(f.contu.withColumnRenamed("w2", "w3"), Seq("w3"), "left")
      .crossJoin(broadcast(f.scalars))
      // separate named rungs — the knScoreWithFrames expression-growth
      // note; doubly important here where each rung carries the
      // discount CASE trees
      .withColumn("__p1", p1)
      .withColumn("__p2", p2of(col("__p1")))
      .withColumn("__lp", log(p3of(col("__p2"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("c3").isNotNull, 1L).otherwise(0L)).as("n_hit3"),
        sum(when(col("cb").isNotNull, 1L).otherwise(0L)).as("n_hit2"),
        round(sum(col("__lp")), 4).as("logprob_sum"))
      .withColumn("__p4", round(-col("logprob_sum") * 10000).cast("long"))
      .withColumn("avg_nll",
        expr("(__p4 * 2 + n_trigrams) div (n_trigrams * 2)")
          .cast("double") / 10000.0)
      .withColumn("ppl", round(exp(col("avg_nll")), 4))
    target.select(col(idCol).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_hit3"), lit(0L)).as("n_hit3"),
        coalesce(col("n_hit2"), lit(0L)).as("n_hit2"),
        col("logprob_sum"), col("avg_nll"), col("ppl"),
        coalesce(col("avg_nll") <= lit(nllKeep), lit(false)).as("keep"))
  }

  def mknScoreAgainst(train: DataFrame, target: DataFrame, idCol: String,
                      textCol: String, nllKeep: Double = 3.5): DataFrame =
    mknScoreWithFrames(target, mknFrames(train, idCol, textCol), idCol,
      textCol, nllKeep)

  /** The model's head — top-N bigrams by count (ties broken (w1, w2)):
    * the inspection query a pipeline dashboards to sanity-check what the
    * LM actually learned. orderBy+limit plans as TakeOrderedAndProject
    * (per-partition heaps, never a global sort of the model); the rank
    * window then runs over the N surviving rows only. */
  def topBigrams(df: DataFrame, idCol: String, textCol: String,
                 topN: Int = 20, k: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val head = model(df, idCol, textCol, k)
      .orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
      .limit(topN)
    val w = Window.orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
    head.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("w1"), col("w2"), col("c12"),
        round(col("logp"), 6).as("logp"))
  }
}
