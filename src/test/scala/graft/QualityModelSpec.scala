package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityModel

class QualityModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // prose-like positives: function words, short tokens — the shape the
  // classifier must learn to keep
  private lazy val docs = (0L until 24L).map { i =>
    (i, s"the quick report $i covers a range of events and trends to watch " +
      s"in the region over week $i with notes on the data and a summary")
  }.toDF("doc_id", "text")

  test("syntheticNegatives: deterministic, stopword-free, long-token word soup") {
    val a = QualityModel.syntheticNegatives(spark, 10).as[(Long, String)].collect().sortBy(_._1)
    val b = QualityModel.syntheticNegatives(spark, 10).as[(Long, String)].collect().sortBy(_._1)
    assert(a === b, "negative generation must be deterministic")
    a.foreach { case (id, text) =>
      val words = text.split(" ")
      assert(words.forall(_.length >= 8), s"neg $id: tokens are long")
      assert(!words.exists(Set("the", "a", "of", "and", "to", "in")),
        s"neg $id: no function words")
    }
  }

  test("train: deterministic weights, and the classes separate completely") {
    val w1 = QualityModel.train(docs, "doc_id", "text", iters = 400)
    val w2 = QualityModel.train(docs, "doc_id", "text", iters = 400)
    assert(w1.bias === w2.bias && w1.w.toSeq === w2.w.toSeq,
      "training must be run-to-run deterministic")
    val kept = QualityModel.score(docs, "doc_id", "text", w1)
      .select("keep").as[Boolean].collect()
    assert(kept.forall(identity), "every prose doc scores positive")
    val negs = QualityModel.syntheticNegatives(spark, 24)
      .select(col("neg_id").as("doc_id"), col("text"))
    val dropped = QualityModel.score(negs, "doc_id", "text", w1)
      .select("keep").as[Boolean].collect()
    assert(dropped.forall(!_), "every gibberish doc scores negative")
  }

  test("score: one codegen'd projection — no UDF, weights are plan literals") {
    val w = QualityModel.Weights(1.0, Array(0.5, -0.25, 0.125, 0.0))
    val scored = QualityModel.score(docs, "doc_id", "text", w)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), "scoring must not fall out of codegen")
    // logit equals the hand-computed dot product on a sample row
    val r = scored.filter(col("doc_id") === 0).select("f_len", "f_stop", "f_wordlen", "f_punct", "logit")
      .as[(Double, Double, Double, Double, Double)].head()
    val expect = math.rint((1.0 + 0.5 * r._1 - 0.25 * r._2 + 0.125 * r._3 + 0.0 * r._4) * 1e4) / 1e4
    assert(math.abs(r._5 - expect) < 1e-9, s"logit ${r._5} vs $expect")
  }

  test("train: the sample cap bounds driver material without changing determinism") {
    val wCapped = QualityModel.train(docs, "doc_id", "text", maxSample = 8, iters = 200)
    val wCapped2 = QualityModel.train(docs, "doc_id", "text", maxSample = 8, iters = 200)
    assert(wCapped.bias === wCapped2.bias && wCapped.w.toSeq === wCapped2.w.toSeq)
    // capped training still separates (the sample is id-ordered, not random)
    val negs = QualityModel.syntheticNegatives(spark, 8)
      .select(col("neg_id").as("doc_id"), col("text"))
    assert(QualityModel.score(negs, "doc_id", "text", wCapped)
      .select("keep").as[Boolean].collect().forall(!_))
  }
}
