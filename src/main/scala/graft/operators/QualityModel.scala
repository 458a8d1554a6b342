package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the trained complement to
  * [[TextOps.qualityScore]]'s fixed heuristic, re-expressing the public
  * CCNet/GPT-3 corpus-filter recipe (Wenzek et al. 2020; Brown et al.
  * 2020 Appendix A): train a linear classifier to separate corpus-like
  * text from noise, then keep documents the model scores positive.
  *
  * Scale shape, in three deliberate pieces:
  *  - FEATURES are pure Column expressions (rounded to 4dp) — the exact
  *    forms the `quality_score`/`token_count` oracles already proved
  *    engine-portable, so a second engine recomputes them bit-for-bit.
  *  - TRAINING is driver-side deterministic gradient descent on a CAPPED
  *    feature sample (`maxSample`, sorted-by-id take — bounded driver
  *    material, the same discipline as the PQ codebooks and BPE merge
  *    table; never collect-the-corpus). Negatives are deterministic
  *    synthetic gibberish (LCG word soup — no stopwords, long tokens,
  *    digit-ridden), the weak-supervision trick that needs no labels.
  *  - SCORING is one codegen'd projection: logit = w·x as plain Column
  *    arithmetic (no UDF, no model object), with the weights rounded to
  *    6dp so they embed exactly as SQL literals — the DuckDB gate replays
  *    the whole scoring pass with the pinned weights and must land on
  *    identical rounded logits.
  */
object QualityModel {

  /** Trained weights, rounded to 6dp so both engines compute with the
    * exact same decimal values. Order matches [[featureCols]]. */
  case class Weights(bias: Double, w: Array[Double]) {
    require(w.length == featureNames.length)
  }

  val featureNames: Seq[String] = Seq("f_len", "f_stop", "f_wordlen", "f_punct")

  /** The four portable features, each bounded to [0,1] and rounded to
    * 4dp. Bounding keeps the gradient well-conditioned without
    * train-time standardization (which would bake corpus statistics
    * into the weights and break replayability). */
  def featureCols(textCol: Column): Seq[Column] = {
    val toks = split(trim(textCol), "\\s+")
    val nWords = size(toks).cast("double")
    val nStop = size(filter(toks,
      (t: Column) => Seq("the", "a", "of", "and", "to", "in").map(t === _).reduce(_ || _)))
    val squeezed = length(regexp_replace(textCol, "\\s+", ""))
    Seq(
      round(least(nWords / lit(100.0), lit(1.0)), 4).as("f_len"),
      round(nStop * lit(1.0) / nWords, 4).as("f_stop"),
      round(least(squeezed * lit(1.0) / nWords / lit(10.0), lit(1.0)), 4).as("f_wordlen"),
      round(length(regexp_replace(textCol, "[A-Za-z0-9\\s]", "")) * lit(1.0)
        / greatest(length(textCol), lit(1)), 4).as("f_punct"))
  }

  /** Deterministic gibberish corpus — the synthetic NEGATIVE class: LCG
    * word soup with no function words, 8-19-char tokens, digits mixed
    * in. Generated on executors from the row id alone (replayable, no
    * RNG state). */
  def syntheticNegatives(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      ids.map { id =>
        var x = id * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
        def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
        val nWords = 30 + (((next() >>> 33) % 40)).toInt
        val sb = new StringBuilder
        var w = 0
        while (w < nWords) {
          if (w > 0) sb.append(' ')
          val len = 8 + ((next() >>> 33) % 12).toInt
          var c = 0
          while (c < len) {
            val r = ((next() >>> 33) % 36).toInt
            sb.append(if (r < 26) ('b' + (r % 25)).toChar else ('0' + (r - 26)).toChar)
            c += 1
          }
          w += 1
        }
        (id, sb.toString)
      }
    }.toDF("neg_id", "text")
  }

  private def round6(v: Double): Double = math.rint(v * 1e6) / 1e6

  /** Train the classifier: real docs (label 1) vs synthetic gibberish
    * (label 0), features collected up to `maxSample` per class in doc-id
    * order (deterministic, bounded), then full-batch gradient descent on
    * the logistic loss — fixed iteration count and step, pure double
    * arithmetic in a fixed order, so the weights are identical across
    * runs, partitionings, and JVMs. */
  def train(docs: DataFrame, idCol: String, textCol: String,
            maxSample: Int = 65536, iters: Int = 400, step: Double = 1.0): Weights = {
    val spark = docs.sparkSession
    val posRows = docs.orderBy(col(idCol)).limit(maxSample)
      .select(featureCols(col(textCol)): _*)
      .collect() // one action; the id-sorted limit runs as TakeOrdered
    val neg = syntheticNegatives(spark, posRows.length)
      .select(featureCols(col("text")): _*)
    require(posRows.nonEmpty,
      "quality_classifier: cannot train on an empty corpus")
    val xs = (posRows.map(r => (featureRow(r), 1.0))
      ++ neg.collect().map(r => (featureRow(r), 0.0)))
    val dim = featureNames.length
    val w = new Array[Double](dim + 1) // [bias, w1..w4]
    var it = 0
    while (it < iters) {
      val grad = new Array[Double](dim + 1)
      var i = 0
      while (i < xs.length) {
        val (x, y) = xs(i)
        var z = w(0)
        var j = 0
        while (j < dim) { z += w(j + 1) * x(j); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val d = p - y
        grad(0) += d
        j = 0
        while (j < dim) { grad(j + 1) += d * x(j); j += 1 }
        i += 1
      }
      var j = 0
      while (j <= dim) { w(j) -= step * grad(j) / xs.length; j += 1 }
      it += 1
    }
    Weights(round6(w(0)), w.drop(1).map(round6))
  }

  private def featureRow(r: org.apache.spark.sql.Row): Array[Double] = {
    val out = new Array[Double](featureNames.length)
    var i = 0
    while (i < out.length) { out(i) = r.getDouble(i); i += 1 }
    out
  }

  /** The rounded linear logit over a text column — pure Column
    * arithmetic with the weights as literals, so it composes anywhere a
    * predicate fits (e.g. CorpusPipeline's `keep`) and stays inside
    * whole-stage codegen. Left-associated multiply-add, matching the
    * oracle's SQL evaluation order exactly. */
  def logitCol(textCol: Column, wts: Weights): Column = {
    val fs = featureCols(textCol)
    val logit = fs.indices.foldLeft(lit(wts.bias): Column) { (acc, i) =>
      acc + lit(wts.w(i)) * fs(i)
    }
    round(logit, 4)
  }

  /** Score a corpus with trained weights: one codegen'd projection —
    * per-doc features, the rounded linear logit, and the keep verdict.
    * No UDF, no model broadcast; the weights are five literal constants
    * folded into the plan. */
  def score(docs: DataFrame, idCol: String, textCol: String, wts: Weights): DataFrame = {
    val withF = docs.select((col(idCol) +: featureCols(col(textCol))): _*)
    val logit = featureNames.zipWithIndex
      .foldLeft(lit(wts.bias): Column) { case (acc, (f, i)) =>
        acc + lit(wts.w(i)) * col(f)
      }
    withF.withColumn("logit", round(logit, 4))
      .withColumn("keep", col("logit") > 0)
  }
}
