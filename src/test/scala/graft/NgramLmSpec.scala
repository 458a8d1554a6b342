package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

class NgramLmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 3 docs, vocab {a,b,c,x,y}: doc 1/2 are the "corpus-normal" pattern,
  // doc 3 is the outlier with bigrams seen nowhere else
  private lazy val docs = Seq(
    (1L, "a b a b a b"),
    (2L, "a b a b"),
    (3L, "x y c x"),
    (4L, "solo"), // one token: unscoreable
    (5L, "")      // empty: unscoreable
  ).toDF("doc_id", "text").cache()

  test("model: counts and smoothed logp match hand arithmetic") {
    val m = NgramLm.model(docs, "doc_id", "text")
      .select("w1", "w2", "c12", "c1", "v", "logp")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // bigrams: doc1 = ab,ba,ab,ba,ab ; doc2 = ab,ba,ab ; doc3 = xy,yc,cx
    // c(a,b)=5 c(b,a)=3 c(x,y)=1 c(y,c)=1 c(c,x)=1
    // margins: c(a,·)=5 c(b,·)=3 c(x,·)=1 c(y,·)=1 c(c,·)=1 ; V=6 (incl. solo)
    assert(m(("a", "b"))._3 === 5L)
    assert(m(("b", "a"))._3 === 3L)
    assert(m(("x", "y"))._3 === 1L)
    assert(m.size === 5)
    assert(m(("a", "b"))._5 === 6L)
    assert(math.abs(m(("a", "b"))._6 - math.log(6.0 / 11.0)) < 1e-12)
    assert(math.abs(m(("x", "y"))._6 - math.log(2.0 / 7.0)) < 1e-12)
  }

  test("score: the outlier doc scores worse; sums match hand arithmetic") {
    val s = NgramLm.score(docs, "doc_id", "text", nllKeep = 1.0)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(s.size === 5)
    // doc1: 3·ln(6/11) + 2·ln(4/9)
    val d1 = 3 * math.log(6.0 / 11.0) + 2 * math.log(4.0 / 9.0)
    assert(s(1L)._2 === 5L)
    assert(math.abs(s(1L)._3.get - BigDecimal(d1).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // doc3: 3 unique bigrams, each ln(2/7) — far worse per token
    assert(s(3L)._4.get > s(1L)._4.get && s(3L)._4.get > s(2L)._4.get)
    // keep verdict at 1.0 nats: docs 1/2 pass, outlier fails
    assert(s(1L)._6 && s(2L)._6 && !s(3L)._6)
    // unscoreable docs: 0 bigrams, null scores, never kept
    assert(s(4L)._2 === 0L && s(4L)._3.isEmpty && !s(4L)._6)
    assert(s(5L)._2 === 0L && s(5L)._3.isEmpty && !s(5L)._6)
    // ppl = exp(avg_nll) on the rounded value
    assert(math.abs(s(1L)._5.get - BigDecimal(math.exp(s(1L)._4.get))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("topBigrams: count-ranked head with deterministic tie-break") {
    val top = NgramLm.topBigrams(docs, "doc_id", "text", topN = 3)
      .as[(Int, String, String, Long, Double)].collect()
    assert(top.map(t => (t._1, t._2, t._3, t._4)).toSeq === Seq(
      (1, "a", "b", 5L), (2, "b", "a", 3L), (3, "c", "x", 1L)))
  }

  test("scoreAgainst: self-training degenerates to score with zero OOV") {
    val self = NgramLm.scoreAgainst(docs, docs, "doc_id", "text")
    assert(self.filter(col("n_oov") =!= 0L).count() === 0L)
    val a = self.drop("n_oov").orderBy("doc_id").collect()
    val b = NgramLm.score(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("scoreAgainst: unseen bigrams back off through the smoothing mass") {
    val train = docs.filter(col("doc_id") <= 2) // vocab {a,b}, V=2
    val target = Seq((10L, "a b z")).toDF("doc_id", "text")
    val got = NgramLm.scoreAgainst(train, target, "doc_id", "text")
      .as[(Long, Long, Long, Option[Double], Option[Double], Option[Double], Boolean)]
      .collect().head
    // train bigrams: c(a,b)=5, c(b,a)=3; margins c(a,·)=5, c(b,·)=3; V=2.
    // (a,b) seen → ln((5+1)/(5+2)); (b,z) unseen under seen b →
    // ln(1/(c(b,·)+V)) = ln(1/5)
    assert(got._2 === 2L && got._3 === 1L)
    val want = math.log(6.0 / 7.0) + math.log(1.0 / 5.0)
    assert(math.abs(got._4.get - BigDecimal(want).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("knScoreAgainst: hand arithmetic through all three rungs") {
    // train "a b c a b c": trigram counts abc=2, bca=1, cab=1; bigram
    // TYPES {ab, bc, ca} → every word has continuation count 1; B=3,
    // W=3, V=3, so p1 = 1/3 for each vocab word.
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    def score1(t: String): (Long, Long, Long, Option[Double]) = {
      val r = NgramLm.knScoreAgainst(train,
          Seq((10L, t)).toDF("doc_id", "text"), "doc_id", "text")
        .select("n_trigrams", "n_hit3", "n_hit2", "logprob_sum")
        .as[(Long, Long, Long, Option[Double])].collect().head
      r
    }
    // seen trigram: p3(c|ab) = (max(2-.75,0) + .75*1*p2(c|b)) / 2 with
    // p2(c|b) = (max(1-.75,0) + .75*1*(1/3)) / 1 = 0.5 → 0.8125
    val seen = score1("a b c")
    assert(seen._1 === 1L && seen._2 === 1L && seen._3 === 1L)
    assert(math.abs(seen._4.get - BigDecimal(math.log(0.8125)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // OOV w3 under a seen context: p1(z) = (0 + .75*3/3)/3 = 0.25,
    // p2(z|b) = .75*1*0.25/1 = 0.1875, p3 = .75*1*0.1875/2 = 0.0703125
    val oov = score1("a b z")
    assert(oov._1 === 1L && oov._2 === 0L && oov._3 === 0L)
    assert(math.abs(oov._4.get - BigDecimal(math.log(0.0703125)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // wholly unseen context/middle: p3 = p2 = p1(a) = (max(1-.75,0)
    // + .75*3/3)/3 = 1/3
    val bare = score1("z z a")
    assert(bare._2 === 0L && bare._3 === 0L)
    assert(math.abs(bare._4.get - BigDecimal(math.log(1.0 / 3.0)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("kn distribution sums to 1 over the vocab for a seen context") {
    // train vocab {a,b}: the interpolated-KN ladder is a PROPER
    // distribution at every rung, so Σ_w3 p(w3|a,b) over the vocab = 1 —
    // the property add-k notoriously distorts on zipfian heads. Scored
    // through the public API (one single-trigram doc per candidate w3);
    // the 4dp sum rounding bounds the tolerance.
    val train = docs.filter(col("doc_id") <= 2)
    val target = Seq((10L, "a b a"), (11L, "a b b")).toDF("doc_id", "text")
    val ps = NgramLm.knScoreAgainst(train, target, "doc_id", "text")
      .select("logprob_sum").as[Double].collect().map(math.exp)
    assert(math.abs(ps.sum - 1.0) < 1e-3, s"sum=${ps.sum}")
  }

  test("knScoreAgainst: sub-3-token docs are unscoreable, not dropped") {
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val got = NgramLm.knScoreAgainst(train,
        Seq((10L, "a b"), (11L, ""), (12L, "a b c")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id", "n_trigrams", "keep")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) === ((0L, false)))
    assert(got(11L) === ((0L, false)))
    assert(got(12L)._1 === 1L)
  }


  test("knPruned: count-cutoff drops singletons, kept context stays proper") {
    // train trigrams: abc=2 (kept at minCount 2), bca/cab/bcd/cda/dab=1
    // (all pruned); bigram types {ab,bc,ca,cd,da} -> B=5, W=4, V=4
    val train = Seq((1L, "a b c a b c d a b")).toDF("doc_id", "text")
    def score1(t: String): (Long, Long, Long, Option[Double]) =
      NgramLm.knScoreAgainst(train,
          Seq((10L, t)).toDF("doc_id", "text"), "doc_id", "text",
          minCount = 2L)
        .select("n_trigrams", "n_hit3", "n_hit2", "logprob_sum")
        .as[(Long, Long, Long, Option[Double])].collect().head
    // the kept trigram: p1(c) = (0.25+0.75)/5 = 0.2, p2(c|b) =
    // (0.25 + 0.75*0.2)/1 = 0.4, p3(c|ab) = (1.25 + 0.75*0.4)/2 = 0.775
    val kept = score1("a b c")
    assert(kept._2 === 1L && kept._3 === 1L)
    assert(math.abs(kept._4.get - BigDecimal(math.log(0.775)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // a PRUNED trigram (bca): its context and continuation rows vanished
    // with it, so the ladder backs off wholesale to p1(a) = 0.4 — no
    // model hit at any pruned rung
    val pruned = score1("b c a")
    assert(pruned._2 === 0L && pruned._3 === 0L)
    assert(math.abs(pruned._4.get - BigDecimal(math.log(0.4)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("knPruned: the surviving context's distribution still sums to 1") {
    // pruning re-derives cctx from the KEPT counts, so
    // sum_kept(c3 - D) + D*T = cctx exactly and the rung stays proper —
    // the property a naive prune (drop rows, keep old denominators) loses
    val train = Seq((1L, "a b c a b c d a b")).toDF("doc_id", "text")
    val target = Seq((10L, "a b a"), (11L, "a b b"), (12L, "a b c"),
      (13L, "a b d")).toDF("doc_id", "text")
    val ps = NgramLm.knScoreAgainst(train, target, "doc_id", "text",
        minCount = 2L)
      .select("logprob_sum").as[Double].collect().map(math.exp)
    assert(math.abs(ps.sum - 1.0) < 1e-3, s"sum=${ps.sum}")
  }

  test("knPruned at minCount 1 scores identically to the base frames") {
    val train = docs
    val target = docs.select(col("doc_id"), col("text"))
    val base = NgramLm.knFrames(train, "doc_id", "text")
    val b = NgramLm.knScoreWithFrames(target, base, "doc_id", "text")
      .orderBy("doc_id").collect()
    val p = NgramLm.knScoreWithFrames(target,
        NgramLm.knPruned(base, minCount = 1L), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(b === p)
  }

  test("mknScoreAgainst: degenerate count-of-counts fall back to the fixed-0.75 ladder") {
    // tiny corpus → zero n3/n4 classes at both rungs → every estimated
    // discount is invalid → modified KN must equal plain KN row-for-row
    // (with all classes at 0.75 the class-picked discount and the
    // discounted-mass lambda collapse to the fixed-D formulas)
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val target = Seq((10L, "a b c"), (11L, "a b z"), (12L, "z z a"))
      .toDF("doc_id", "text")
    val kn = NgramLm.knScoreAgainst(train, target, "doc_id", "text")
      .orderBy("doc_id").collect()
    val mkn = NgramLm.mknScoreAgainst(train, target, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(mkn.toSeq === kn.toSeq)
  }

  test("mkn distribution sums to 1 with ACTIVE estimated discounts") {
    // trigram counts spanning classes 1..4 (each phrase-doc repeated k
    // times) → n1=n2=n3=n4=1, Y=1/3, D1=1/3, D2=1, D3+=5/3 — all valid,
    // so the trigram rung runs the ESTIMATED ladder (the middle rung's
    // continuation counts are all 1 → it falls back, which is fine) —
    // and the per-class discounted mass must still leave a proper
    // distribution: Σ_w3∈V p(w3 | s,t) = 1.
    val phrases = Seq(
      ("p q r", 1), ("s t u", 2), ("v w x", 3), ("y z a", 4))
    val train = phrases.zipWithIndex.flatMap { case ((t, k), i) =>
      (0 until k).map(j => (i * 10L + j, t))
    }.toDF("doc_id", "text")
    val vocab = phrases.flatMap(_._1.split(" ")).distinct
    val target = vocab.zipWithIndex
      .map { case (w, i) => (100L + i, s"s t $w") }.toDF("doc_id", "text")
    val scored = NgramLm.mknScoreAgainst(train, target, "doc_id", "text")
      .select("logprob_sum").as[Double].collect().map(math.exp)
    assert(scored.length === vocab.length)
    assert(math.abs(scored.sum - 1.0) < 2e-3, s"sum=${scored.sum}")
    // and the estimation is ACTIVE: the seen trigram's probability
    // differs from the fixed-0.75 ladder's
    val mkn1 = NgramLm.mknScoreAgainst(train,
        Seq((200L, "s t u")).toDF("doc_id", "text"), "doc_id", "text")
      .select("logprob_sum").as[Double].collect().head
    val kn1 = NgramLm.knScoreAgainst(train,
        Seq((200L, "s t u")).toDF("doc_id", "text"), "doc_id", "text")
      .select("logprob_sum").as[Double].collect().head
    assert(mkn1 !== kn1, "estimated discounts should move the score")
  }

  test("knScoreAgainst is partitioning-invariant") {
    val train = docs.filter(col("doc_id") <= 3)
    val base = NgramLm.knScoreAgainst(train, docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val re = NgramLm.knScoreAgainst(train.repartition(5),
        docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(base.toSeq === re.toSeq)
  }

  test("score is partitioning-invariant (shuffle join, no driver state)") {
    val base = NgramLm.score(docs, "doc_id", "text").orderBy("doc_id").collect()
    val re = NgramLm.score(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(base.toSeq === re.toSeq)
  }
}
