package graft.operators

import org.apache.spark.sql.DataFrame
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
  * splitting since the model side carries one row per key. The per-doc
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
