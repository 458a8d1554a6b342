package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling — data selection via hashed-ngram
  * importance weights (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling" — public knowledge). The rung the
  * curation tier was missing between the rule filters (Gopher, entropy)
  * and the LM gates: instead of asking "is this document well-formed
  * text", it asks "does this document LOOK LIKE the target domain",
  * scoring every raw document by the log-likelihood ratio of its hashed
  * n-gram features under a target distribution vs the raw-corpus
  * distribution, then keeping the target-like mass. The reference has no
  * equivalent; this is the standard pretraining-mix selection step
  * (select web data that resembles Wikipedia/books) at 100 TB.
  *
  * Features: unigrams + word bigrams hashed into a CLOSED space of
  * `buckets` buckets (md5-prefix arithmetic — the [[Sample.hashSplit]]
  * convention, so any engine replays membership exactly). Both
  * distributions are add-1 smoothed OVER THE BUCKET SPACE, which is
  * finite and fixed, so smoothing is principled (every bucket has a
  * defined probability) and the weight of a doc is
  * Σ_f n_f · (ln p_target(f) − ln p_raw(f)).
  *
  * Scale shape — and why this beats the LM gate's join at 100 TB: the
  * feature stream is a map-only explode (tokens + zip_with bigrams,
  * concatenated per doc) that deliberately runs TWICE — once for the
  * bucket marginals, once for scoring — instead of materializing a
  * per-doc bucket histogram; both consumers then map-side combine to
  * BOUNDED frames (≤ buckets marginal rows per partition, one score
  * row per doc per partition). The bucket-marginal agg is bounded by
  * `buckets` REGARDLESS of corpus size — so unlike the LM's vocab-sized
  * model (zipfian, billions of rows at 100 TB, must shuffle-join), the
  * DSIR ratio table is a fixed few-KB frame that is genuinely
  * broadcastable at ANY corpus scale. Scoring is therefore a broadcast
  * join + per-doc reduce: no model-side shuffle anywhere in the plan.
  *
  * Determinism across engines: per-doc weights round the SUM at 4dp
  * (the q3/LM discipline — accumulation order differs, the rounded sum
  * doesn't); ln arguments are rationals of integer counts, identical
  * doubles in any IEEE engine.
  */
object Dsir {

  /** Lowercased whitespace tokens, empties filtered — the shared
    * [[TextOps.lowerToks]] regime, oracle-replayable verbatim. */
  private def toks(text: Column): Column = TextOps.lowerToks(text)

  /** md5-prefix bucket in [0, buckets) — the [[Sample.hashSplit]]
    * cross-engine hash convention. */
  private def bucketOf(f: Column, buckets: Int): Column =
    conv(substring(md5(f), 1, 4), 16, 10).cast("long") % buckets

  /** (doc_id[, is_target], bucket) hashed-feature stream: unigrams and
    * space-joined bigrams, one explode off a single tokenize pass. The
    * target predicate is only projected when estimating (`Some`); the
    * scoring path passes `None` so a foreign batch that lacks the
    * predicate's columns (the production serving shape) still resolves. */
  private def featureStream(df: DataFrame, idCol: String, textCol: String,
                            targetPred: Option[Column], buckets: Int): DataFrame = {
    val n = greatest(size(col("__ws")) - 1, lit(0))
    val tagged = targetPred.map(p => Seq(p.as("tgt"))).getOrElse(Nil)
    val tagCol = targetPred.map(_ => Seq(col("tgt"))).getOrElse(Nil)
    df.select(col(idCol).as("doc_id") +: tagged :+
        toks(col(textCol)).as("__ws"): _*)
      .select(col("doc_id") +: tagCol :+
        explode(concat(
          col("__ws"),
          zip_with(slice(col("__ws"), lit(1), n), slice(col("__ws"), lit(2), n),
            (a, b) => concat(a, lit(" "), b)))).as("f"): _*)
      .select(col("doc_id") +: tagCol :+
        bucketOf(col("f"), buckets).as("b"): _*)
  }

  /** The (bucket → logratio) model as skinny driver-side rows — the
    * build-once half of the production shape (estimate the ratio on one
    * corpus snapshot, score many batches against it; the Bpe.train memo
    * precedent). ≤ `buckets` rows, one map-only feature pass + one
    * bounded agg; the collect is capped at `buckets` (≤ 65,536) rows. */
  def ratioTable(df: DataFrame, targetPred: Column, idCol: String,
                 textCol: String, buckets: Int = 1024): Seq[(Long, Double)] = {
    require(buckets > 0 && buckets <= 65536, "buckets in (0, 65536]")
    val stream = featureStream(df, idCol, textCol, Some(targetPred), buckets)
    // marginals for BOTH distributions in one pass; bounded by `buckets`
    val marg = stream.groupBy("b")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val r = marg.values.map(_._1).sum.toDouble
    val t = marg.values.map(_._2).sum.toDouble
    // densified over the CLOSED bucket space (add-1 smoothing defines a
    // logratio for never-observed buckets too), so the scoring join is
    // total for ANY input corpus — same arithmetic as the self-estimated
    // marginal join, and scoring a foreign batch needs no special case
    (0L until buckets.toLong).map { b =>
      val (cr, ct) = marg.getOrElse(b, (0L, 0L))
      b -> (math.log((ct + 1.0) / (t + buckets)) -
        math.log((cr + 1.0) / (r + buckets)))
    }
  }

  /** Per-document importance weights. Emits (doc_id, n_feats, weight,
    * keep): weight is the rounded log-likelihood-ratio sum, keep =
    * weight ≥ `keepAt` (0 = "more target-like than raw-average");
    * featureless docs (null/empty text) get n_feats 0, null weight,
    * keep false. With `ratio = None` the model is estimated from `df`
    * itself against the slice `targetPred` selects (two map-only
    * feature passes — see below); passing a precomputed [[ratioTable]]
    * scores in ONE corpus pass — the production serving shape and what
    * the SparkEntry memo uses so the three registered queries share one
    * model build per (session, dir). In that mode `targetPred` is NOT
    * evaluated, so a foreign batch need not carry the predicate's
    * columns — estimate on a snapshot, score any (doc_id, text) frame. */
  def weights(df: DataFrame, targetPred: Column, idCol: String,
              textCol: String, buckets: Int = 1024,
              keepAt: Double = 0.0,
              ratio: Option[Seq[(Long, Double)]] = None): DataFrame = {
    require(buckets > 0 && buckets <= 65536, "buckets in (0, 65536]")
    // When estimating inline, the stream is deliberately computed TWICE
    // (two map-only tokenize+explode passes) rather than materialized as
    // a per-doc histogram: a (doc, bucket) histogram shuffle ships
    // ~min(tokens, buckets) rows PER DOC (hundreds at web-doc sizes),
    // while the two aggregations each map-side combine to a bounded
    // frame — ≤ `buckets` rows per partition for the marginals, ONE row
    // per doc per partition for the scores. At corpus scale that is ~2
    // orders of magnitude less shuffle for one extra embarrassingly-
    // parallel scan (sf10 crossover pinned in BASELINE.md: 84.9 s
    // histogram form → 53.5 s this form).
    val spark = df.sparkSession
    import spark.implicits._
    val ratioDf = ratio
      .getOrElse(ratioTable(df, targetPred, idCol, textCol, buckets))
      .toDF("b", "logratio")
    // the ratio table is DENSE over the closed bucket space, so the
    // broadcast join is total for any input corpus; the per-doc agg sums
    // one logratio per feature OCCURRENCE (same sum as a histogram-form
    // n·logratio, different accumulation order — rounded at 4dp, the
    // discipline that makes order irrelevant)
    // scoring never reads the target tag (only ratioTable's own stream
    // does) — skip the projection entirely, so with a precomputed model
    // the predicate's columns need not exist on the batch being scored
    val stream = featureStream(df, idCol, textCol, None, buckets)
    val scored = stream.join(broadcast(ratioDf), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("logratio")), 4).as("weight"))
    df.select(col(idCol).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        col("weight"),
        coalesce(col("weight") >= lit(keepAt), lit(false)).as("keep"))
  }

  /** Gumbel-top-k importance RESAMPLING — the DSIR paper's actual
    * selection protocol (§2.2: sample the target-sized corpus WITHOUT
    * replacement with probability ∝ exp(weight/τ), not a hard
    * threshold — thresholding mode-collapses onto the most target-like
    * slice; resampling keeps diversity). Gumbel-top-k realizes it
    * exactly: key_i = weight_i/τ + G_i with G_i standard Gumbel noise,
    * take the k largest keys.
    *
    * Every term is deterministic and engine-replayable: the uniform is
    * an md5-prefix draw u = (first-8-hex("gum:"||id) + 0.5) / 2^32 —
    * (v + 0.5)/2^32 is exact binary arithmetic, so u is the identical
    * double in any engine — and G = −ln(−ln u). Keys round at 4dp (the
    * LM-oracle ln discipline) with doc_id as the total tiebreak, so
    * top-k membership and rank replay exactly.
    *
    * Scale shape: the noise/key is a map-only projection over the
    * weights frame; selection is orderBy(key desc, id).limit(k), which
    * Catalyst plans as TakeOrderedAndProject — per-partition top-k
    * heaps, never a global sort (asserted in the spec). The rank column
    * is a window over the k survivors only — k rows, not the corpus.
    * τ → 0 degenerates to deterministic top-k by weight; τ large
    * approaches a uniform draw. Unscoreable docs (null weight) never
    * enter the draw. */
  def resample(df: DataFrame, targetPred: Column, idCol: String,
               textCol: String, k: Int, tau: Double = 1.0,
               buckets: Int = 1024,
               ratio: Option[Seq[(Long, Double)]] = None): DataFrame = {
    require(k > 0, "k must be positive")
    require(tau > 0, "tau must be positive")
    val w = weights(df, targetPred, idCol, textCol, buckets, ratio = ratio)
      .filter(col("weight").isNotNull)
    val u = (conv(substring(md5(concat(lit("gum:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    val keyed = w.withColumn("key",
      round(col("weight") / lit(tau) - log(-log(u)), 4))
    keyed.orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("key").desc, col("doc_id"))))
      .select("rank", "doc_id", "weight", "key")
  }

  /** The resampling census — what the selection DID to the source mix:
    * per source, holdings vs kept count and the rounded weight sum
    * (sum of already-rounded doc weights, rounded again — both engines
    * sum identical doubles). O(|sources|) rows; the dashboard row a
    * mix owner reads before exporting the resampled corpus. */
  def mixShift(df: DataFrame, targetPred: Column, idCol: String,
               textCol: String, sourceCol: String, buckets: Int = 1024,
               keepAt: Double = 0.0,
               ratio: Option[Seq[(Long, Double)]] = None): DataFrame = {
    val w = weights(df, targetPred, idCol, textCol, buckets, keepAt, ratio)
    df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
      .join(w, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        round(sum(col("weight")), 4).as("weight_sum"))
  }
}
