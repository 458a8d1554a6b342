package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

class DsirSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // target slice = docs 1-2 (spark prose); raw adds a target-twin (3),
  // an off-domain junk doc (4), and an empty doc (5)
  private val docs = Seq(
    (1L, "spark table scan spark table", true),
    (2L, "table scan fast scan", true),
    (3L, "spark table scan", false),
    (4L, "zzz qqq zzz qqq zzz", false),
    (5L, "", false)
  ).toDF("doc_id", "text", "tgt")

  test("weights: target-like doc scores positive, junk negative, empty unscoreable") {
    // DSIR's operating regime: the raw corpus dwarfs the target slice and
    // feature counts dwarf the add-1 smoothing mass (at tiny counts the
    // uniform smoothing drowns the signal and even a target twin scores
    // ~0). 30 extra replicas of each target doc, 200 of the junk doc —
    // the probe docs 3 (twin), 4 (junk), 5 (empty) stay singular.
    val corpus = docs.unionByName(Seq.tabulate(30) { k =>
        (1000L + k, "spark table scan spark table", true)
      }.toDF("doc_id", "text", "tgt"))
      .unionByName(Seq.tabulate(30) { k =>
        (1100L + k, "table scan fast scan", true)
      }.toDF("doc_id", "text", "tgt"))
      .unionByName(Seq.tabulate(200) { k =>
        (2000L + k, "zzz qqq zzz qqq zzz", false)
      }.toDF("doc_id", "text", "tgt"))
    val w = Dsir.weights(corpus, col("tgt"), "doc_id", "text", buckets = 64)
      .orderBy("doc_id").collect()
    // doc 3 is built from target vocabulary only — every feature is more
    // probable under target than raw → positive weight, kept
    val d3 = w(2)
    assert(d3.getAs[Long]("n_feats") === 5L) // 3 unigrams + 2 bigrams
    assert(d3.getAs[Double]("weight") > 0.0)
    assert(d3.getAs[Boolean]("keep"))
    // doc 4 shares no vocabulary with the target slice → every feature
    // has ct=0 → negative weight, dropped
    val d4 = w(3)
    assert(d4.getAs[Double]("weight") < 0.0)
    assert(!d4.getAs[Boolean]("keep"))
    // doc 5 has no features: n_feats 0, null weight, keep false
    val d5 = w(4)
    assert(d5.getAs[Long]("n_feats") === 0L)
    assert(d5.isNullAt(d5.fieldIndex("weight")))
    assert(!d5.getAs[Boolean]("keep"))
  }

  test("weights: hand-computed log-likelihood-ratio sum on a 1-bucket-per-feature corpus") {
    // buckets=65536 with this tiny vocabulary: no collisions in practice,
    // so each distinct feature is its own bucket and the arithmetic is
    // checkable by hand. The raw doc repeats its token 9 times so BOTH
    // expected weights are non-zero at the 4dp round (a 2-doc corpus
    // leaves the target weight at ~5e-5 → 0.0000, which would pass under
    // a dropped-bigram or swapped-total mutation — vacuous)
    val tiny = Seq((1L, "a a", true),
      (2L, "b b b b b b b b b", false)).toDF("doc_id", "text", "tgt")
    val b = 65536
    val w = Dsir.weights(tiny, col("tgt"), "doc_id", "text", buckets = b)
      .orderBy("doc_id").collect()
    // features: doc1 = [a, a, "a a"] (tgt); doc2 = [b ×9, "b b" ×8]
    // T = 3, R = 20
    // logratio(a)    = ln((2+1)/(3+B)) - ln((2+1)/(20+B))
    // logratio("a a")= ln((1+1)/(3+B)) - ln((1+1)/(20+B))
    // logratio(b)    = ln((0+1)/(3+B)) - ln((9+1)/(20+B))
    // logratio("b b")= ln((0+1)/(3+B)) - ln((8+1)/(20+B))
    val la = math.log(3.0 / (3 + b)) - math.log(3.0 / (20 + b))
    val laa = math.log(2.0 / (3 + b)) - math.log(2.0 / (20 + b))
    val lb = math.log(1.0 / (3 + b)) - math.log(10.0 / (20 + b))
    val lbb = math.log(1.0 / (3 + b)) - math.log(9.0 / (20 + b))
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    // doc1: 2·la + laa ≈ +7.8e-4 → 0.0008 — non-zero at 4dp, so a
    // dropped bigram term (0.0005) or swapped t/r totals (-0.0008) fail
    assert(w(0).getAs[Double]("weight") === r4(2 * la + laa))
    assert(w(0).getAs[Double]("weight") > 0.0)
    assert(w(0).getAs[Boolean]("keep"))
    // doc2: 9·lb + 8·lbb ≈ -38.3 — dominated by the -ln(10)/-ln(9) terms
    assert(w(1).getAs[Double]("weight") === r4(9 * lb + 8 * lbb))
    assert(!w(1).getAs[Boolean]("keep"))
  }

  test("weights: deterministic under repartitioning") {
    val a = Dsir.weights(docs, col("tgt"), "doc_id", "text", buckets = 64)
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.weights(docs.repartition(7), col("tgt"), "doc_id", "text",
      buckets = 64).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("mixShift census reconciles with per-doc weights") {
    val bySource = docs.withColumn("source",
      when(col("doc_id") <= 2, "trusted").otherwise("web"))
    val w = Dsir.weights(bySource, col("tgt"), "doc_id", "text", buckets = 64)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (Option(r.get(r.fieldIndex("weight"))).map(_.asInstanceOf[Double]),
          r.getAs[Boolean]("keep")))).toMap
    val m = Dsir.mixShift(bySource, col("tgt"), "doc_id", "text", "source",
      buckets = 64).orderBy("source").collect()
    assert(m.length === 2)
    val web = m(1)
    assert(web.getAs[String]("source") === "web")
    assert(web.getAs[Long]("n_docs") === 3L)
    assert(web.getAs[Long]("n_kept") ===
      Seq(3L, 4L, 5L).count(id => w(id)._2).toLong)
    val expSum = Seq(3L, 4L, 5L).flatMap(id => w(id)._1).sum
    assert(web.getAs[Double]("weight_sum") === math.rint(expSum * 1e4) / 1e4)
  }

  test("resample: τ→0 degenerates to deterministic top-k by weight, tiebroken by id") {
    val r = Dsir.resample(docs, col("tgt"), "doc_id", "text", k = 2,
      tau = 1e-6, buckets = 64).collect()
    val w = Dsir.weights(docs, col("tgt"), "doc_id", "text", buckets = 64)
      .filter(col("weight").isNotNull).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Double]("weight")))
    // at τ=1e-6 the weight/τ term dwarfs any Gumbel draw: selection is
    // exactly the 2 largest weights (ties broken by id)
    val expect = w.sortBy { case (id, wt) => (-wt, id) }.take(2).map(_._1)
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === expect.toSeq)
    assert(r.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2))
  }

  test("resample: k beyond the scored population returns every scoreable doc exactly once") {
    val r = Dsir.resample(docs, col("tgt"), "doc_id", "text", k = 100,
      buckets = 64).collect()
    // doc 5 is empty (null weight) — never enters the draw
    assert(r.map(_.getAs[Long]("doc_id")).sorted === Array(1L, 2L, 3L, 4L))
    assert(r.map(_.getAs[Int]("rank")).sorted === Array(1, 2, 3, 4))
  }

  test("resample: deterministic under repartitioning, ranks total-ordered") {
    val a = Dsir.resample(docs, col("tgt"), "doc_id", "text", k = 3,
      buckets = 64).orderBy("rank").collect().toSeq
    val b = Dsir.resample(docs.repartition(7), col("tgt"), "doc_id", "text",
      k = 3, buckets = 64).orderBy("rank").collect().toSeq
    assert(a === b)
    // keys non-increasing down the rank order
    val keys = a.map(_.getAs[Double]("key"))
    assert(keys === keys.sorted(Ordering[Double].reverse))
  }

  test("resample selection plans as TakeOrderedAndProject, not a global sort") {
    val plan = Dsir.resample(docs, col("tgt"), "doc_id", "text", k = 3,
      buckets = 64).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"resample must use per-partition top-k heaps:\n$plan")
  }

  test("ratio table is bucket-bounded and the scoring join broadcasts") {
    val plan = Dsir.weights(docs, col("tgt"), "doc_id", "text", buckets = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"DSIR scoring must broadcast the bucket-bounded ratio table:\n$plan")
  }

  test("precomputed ratio scores a foreign batch lacking the predicate's columns") {
    // the production serving shape: estimate on a snapshot that carries
    // the target tag, then score a later batch that has ONLY (doc_id,
    // text) — the predicate must not be evaluated on the scoring pass
    val table = Dsir.ratioTable(docs, col("tgt"), "doc_id", "text", buckets = 64)
    val batch = Seq((10L, "spark table scan"), (11L, "zzz qqq"))
      .toDF("doc_id", "text") // no tgt column at all
    val w = Dsir.weights(batch, col("tgt"), "doc_id", "text", buckets = 64,
        ratio = Some(table))
      .orderBy("doc_id").collect()
    assert(w.length === 2 && w(0).getAs[Long]("n_feats") === 5L)
    // and the scores equal scoring the same docs through the self-tagged
    // frame — the tag projection changes resolution, never arithmetic
    val tagged = Dsir.weights(
        batch.withColumn("tgt", lit(false)), col("tgt"), "doc_id", "text",
        buckets = 64, ratio = Some(table))
      .orderBy("doc_id").collect()
    assert(w.map(_.toString).toSeq === tagged.map(_.toString).toSeq)
  }
}
