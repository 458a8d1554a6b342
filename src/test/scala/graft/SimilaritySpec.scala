package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dot and l2norm over float arrays") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 1.0f))).toDF("a", "b")
    val got = df.select(
      Similarity.dot(col("a"), col("b")).as("d"),
      Similarity.l2norm(col("a")).as("n"))
      .as[(Double, Double)].collect()(0)
    assert(got._1 === 4.0)
    assert(got._2 === 3.0)
  }

  test("cosineTopK: exact brute-force neighbors with deterministic ranks") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),   // closest to 0
      (2L, Seq(0.0f, 1.0f)),   // orthogonal to 0
      (3L, Seq(-1.0f, 0.0f))   // opposite to 0
    ).toDF("vec_id", "embedding")
    val got = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 2)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(got.map(_._2).toSeq === Seq(1L, 2L))
    assert(got(0)._3 > 0.99 && math.abs(got(1)._3) < 1e-9)
  }

  test("nearDupPairs matches brute-force cosine on jittered duplicates") {
    // 40 deterministic pseudo-random 8-dim vectors + jittered copies of the
    // first 5; LSH-bucketed pairs must contain exactly the planted pairs
    // that brute force finds at the same threshold.
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 1
      Seq.fill(8) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val base = (0 until 40).map(i => (i.toLong, vec(i)))
    val jittered = (0 until 5).map(i =>
      (100L + i, vec(i).zipWithIndex.map { case (v, j) => v + 0.001f * ((i + j) % 3) }))
    val all = (base ++ jittered).toDF("id", "emb")

    val lsh = Similarity.nearDupPairs(all, "id", "emb", dim = 8, nPlanes = 8, threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // driver-side brute force oracle
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val allSeq = base ++ jittered
    val brute = (for {
      (ia, va) <- allSeq; (ib, vb) <- allSeq
      if ia < ib && cos(va, vb) >= 0.98
    } yield (ia, ib)).toSet

    assert(brute.nonEmpty, "test needs at least one true near-dup pair")
    // LSH may miss pairs split across buckets but must never invent pairs
    assert(lsh.subsetOf(brute), s"false positives: ${lsh.diff(brute)}")
    // planted pairs are near-identical → same bucket with overwhelming odds
    val planted = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(planted.intersect(lsh).size >= 4,
      s"LSH recalled only ${planted.intersect(lsh).size}/5 planted pairs")
  }

  test("semanticDedupPairs: trained-cluster blocking recovers planted pairs, never invents them") {
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 1
      Seq.fill(8) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val base = (0 until 40).map(i => (i.toLong, vec(i)))
    val jittered = (0 until 5).map(i =>
      (100L + i, vec(i).zipWithIndex.map { case (v, j) => v + 0.001f * ((i + j) % 3) }))
    val all = (base ++ jittered).toDF("id", "emb")
    val got = Similarity.semanticDedupPairs(all, "id", "emb",
        nlist = 4, threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val allSeq = base ++ jittered
    val brute = (for {
      (ia, va) <- allSeq; (ib, vb) <- allSeq
      if ia < ib && cos(va, vb) >= 0.98
    } yield (ia, ib)).toSet
    // cluster blocking can only MISS (split across clusters), never invent
    assert(got.subsetOf(brute), s"false positives: ${got.diff(brute)}")
    // a near-identical copy argmaxes to its original's cluster: all 5 found
    val planted = (0 until 5).map(i => (i.toLong, 100L + i)).toSet
    assert(planted.subsetOf(got),
      s"cluster blocking recalled only ${planted.intersect(got).size}/5 planted pairs")
  }

  test("semanticDedupPairs: pair space is LINEAR in n at fixed mean cluster size (nlist ∝ n)") {
    // The 100×-scale contract behind the BASELINE third-decade row,
    // pinned exactly: k well-separated clusters of m members each →
    // emitted pairs = k·C(m,2). Scale the corpus 10× WITH nlist (k→10k,
    // mean cluster size m constant): pairs grow exactly 10× — linear in
    // n — where fixed nlist would grow them ~100×. Pre-fitted one-hot
    // centroids (the production plug-in path) keep clustering exact.
    def corpus(k: Int, m: Int): (Seq[(Long, Seq[Float])], Seq[Seq[Double]]) = {
      val centroids = (0 until k).map(i =>
        Seq.tabulate(k)(j => if (j == i) 1.0 else 0.0))
      val vecs = for (i <- 0 until k; j <- 0 until m) yield {
        val v = Array.fill(k)(0.0f)
        v(i) = 1.0f
        v((i + 1) % k) = 0.01f * (j + 1) // tiny per-member jitter axis
        ((i.toLong * m + j), v.toSeq)
      }
      (vecs, centroids)
    }
    def pairCount(k: Int, m: Int): Long = {
      val (vecs, cents) = corpus(k, m)
      Similarity.semanticDedupPairs(vecs.toDF("id", "emb"), "id", "emb",
          nlist = k, threshold = 0.95, centroids = Some(cents))
        .count()
    }
    val m = 6
    val small = pairCount(8, m)   // n = 48,  nlist = 8
    val big = pairCount(80, m)    // n = 480, nlist = 80 (10× corpus, 10× nlist)
    assert(small === 8L * m * (m - 1) / 2, s"expected k*C(m,2), got $small")
    assert(big === 80L * m * (m - 1) / 2, s"expected k*C(m,2), got $big")
    assert(big === 10L * small,
      "10× corpus at 10× nlist must emit exactly 10× the pairs — linear, not n²")
  }

  test("semanticDedupPairs: a single explicit centroid routes through the fold path") {
    // greatest() needs >= 2 args, so nlist = 1 must take the broadcast
    // fold; everything lands in cluster 0 and only the true pair emits
    val vecs = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f))).toDF("id", "emb")
    val got = Similarity.semanticDedupPairs(vecs, "id", "emb", nlist = 1,
        threshold = 0.99, centroids = Some(Seq(Seq(1.0, 0.0))))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("semanticDedupPairs: maxCluster guard drops a degenerate identical-vector flood") {
    // 30 identical vectors in one cluster → 435 quadratic pairs; with the
    // cap they vanish from candidate generation while a distinct planted
    // pair in another cluster survives. Centroids are supplied explicitly
    // (the pre-fitted-model path): trained KMeans on 30-identical + 2
    // points seeds all centers inside the flood, which is exactly the
    // degenerate-cluster shape the guard exists for — the explicit model
    // makes the cap's effect assertable in isolation.
    val flood = (0 until 30).map(i => (i.toLong, Seq.fill(8)(0.5f)))
    val pairVec = Seq(1.0f, -1.0f, 1.0f, -1.0f, 1.0f, -1.0f, 1.0f, -1.0f)
    val keep = Seq((200L, pairVec), (201L, pairVec.map(_ * 1.0001f)))
    val df = (flood ++ keep).toDF("id", "emb")
    val cents = Some(Seq(Seq.fill(8)(0.5), pairVec.map(_.toDouble)))
    val capped = Similarity.semanticDedupPairs(df, "id", "emb",
        threshold = 0.98, maxCluster = 5, centroids = cents)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped === Set((200L, 201L)),
      "flood pairs dropped by the cap; the real pair in its own cluster survives")
    val uncapped = Similarity.semanticDedupPairs(df, "id", "emb",
        threshold = 0.98, centroids = cents)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(uncapped.length === 30 * 29 / 2 + 1, "uncapped control keeps the flood")
  }

  test("ivfTopK: recalls what brute force finds, never invents pairs") {
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 7
      Seq.fill(8) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val rows = (0 until 60).map(i => (i.toLong, vec(i)))
    val df = rows.toDF("id", "emb")
    val queries = df.filter(col("id") < 4)
    val got = Similarity.ivfTopK(df, queries, "id", "emb", k = 3, nlist = 8, nprobe = 8)
      .as[(Long, Long, Double, Int)].collect()

    def cos(a: Seq[Float], b: Seq[Float]) = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    // nprobe = nlist → every list probed → results must EQUAL brute force
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L))
    for ((qid, hits) <- byQuery) {
      val qv = rows(qid.toInt)._2
      val brute = rows.filter(_._1 != qid)
        .map { case (i, v) => (i, cos(qv, v)) }
        .sortBy { case (i, c) => (-c, i) }.take(3).map(_._1)
      assert(hits.sortBy(_._4).map(_._2).toSeq === brute.toSeq, s"query $qid")
    }
  }

  test("ivfTopKBroadcast: broadcast-centroid path equals the literal-matrix path") {
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 7
      Seq.fill(8) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val df = (0 until 60).map(i => (i.toLong, vec(i))).toDF("id", "emb")
    val queries = df.filter(col("id") < 4)
    // identical sampled centroids (same hash sample) → identical output,
    // row for row, for both partial (nprobe=2) and exhaustive probing
    for (nprobe <- Seq(2, 8)) {
      val literal = Similarity.ivfTopK(df, queries, "id", "emb",
          k = 3, nlist = 8, nprobe = nprobe)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
      val bcast = Similarity.ivfTopKBroadcast(df, queries, "id", "emb",
          k = 3, nlist = 8, nprobe = nprobe)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
      assert(bcast === literal, s"nprobe=$nprobe")
    }
  }

  test("lshTopK multi-probe: recall never below single-probe") {
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 40503L + 11
      Seq.fill(8) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val rows = (0 until 80).map(i => (i.toLong, vec(i)))
    val df = rows.toDF("id", "emb")
    val queries = df.filter(col("id") < 6)
    def run(pb: Int) =
      Similarity.lshTopK(df, queries, "id", "emb", dim = 8, k = 10, nPlanes = 6, probeBits = pb)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // recall against the exact brute-force top-10 must not degrade with
    // extra probes (at fixed k the result SET can shift — more candidates
    // displace weaker in-bucket hits — so subset inclusion is NOT the
    // property; recall is)
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val truth = (0 until 6).flatMap { q =>
      rows.filter(_._1 != q)
        .map { case (i, v) => (q.toLong, i, cos(rows(q)._2, v)) }
        .sortBy { case (_, i, c) => (-c, i) }.take(10).map(t => (t._1, t._2))
    }.toSet
    def recall(found: Set[(Long, Long)]) = found.intersect(truth).size.toDouble / truth.size
    val (rSingle, rMulti) = (recall(run(0)), recall(run(4)))
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single-probe $rSingle")
    // 64 buckets over 80 vectors and 5 probes: top-10-recall ~0.4 is the
    // expected regime here; the floor guards against a broken bucket fn
    assert(rMulti > 0.3, s"multi-probe recall only $rMulti on 8-dim/6-plane buckets")
  }

  test("lshTopK: bucketed ANN returns ranked in-bucket neighbors") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.01f)), (1L, Seq(1.0f, 0.02f)), (2L, Seq(0.99f, 0.0f)),
      (3L, Seq(-1.0f, -0.01f))
    ).toDF("id", "emb")
    val got = Similarity.lshTopK(vecs, vecs.filter(col("id") === 0), "id", "emb",
      dim = 2, k = 3, nPlanes = 4)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    // 1 and 2 share 0's half-space; 3 is opposite and lands in another bucket
    assert(got.map(_._2).toSet.subsetOf(Set(1L, 2L)))
    assert(got.forall(_._3 > 0.99))
  }

  test("ivfTopKTrained: KMeans centroids, exhaustive probe equals brute force") {
    def vec(cluster: Int, seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 13
      val center = Seq.tabulate(8)(j => if (j % 4 == cluster % 4) 5.0f else 0.0f)
      center.map { c => x = x * 6364136223846793005L + 1442695040888963407L
        c + ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    // 4 well-separated clusters of 20 vectors each
    val rows = (0 until 80).map(i => (i.toLong, vec(i % 4, i)))
    val df = rows.toDF("id", "emb")
    val queries = df.filter(col("id") < 4)
    val got = Similarity.ivfTopKTrained(df, queries, "id", "emb",
      k = 3, nlist = 4, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect()
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L))
    for ((qid, hits) <- byQuery) {
      val qv = rows(qid.toInt)._2
      val brute = rows.filter(_._1 != qid)
        .map { case (i, v) => (i, cos(qv, v)) }
        .sortBy { case (i, c) => (-c, i) }.take(3).map(_._1)
      assert(hits.sortBy(_._4).map(_._2).toSeq === brute.toSeq, s"query $qid")
    }
    // single-probe on clustered data: trained centroids put each query's
    // cluster in its own list, so k in-cluster neighbors still surface
    val single = Similarity.ivfTopKTrained(df, queries, "id", "emb",
      k = 3, nlist = 4, nprobe = 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(single.groupBy(_._1).forall(_._2.length == 3))
  }

  test("ivfPqTopK: planted near-copies are the ADC global minimum; runs are deterministic") {
    // 60 pseudo-random 16-dim vectors + a jittered copy of each of the
    // first 4 (ids 100+i). A copy's residual ≈ the query's own residual,
    // so its PQ codes equal the per-subspace argmin of the query's ADC
    // table — the copy is the global ADC minimum and MUST rank 1 under an
    // exhaustive coarse probe. This pins the whole chain (normalize,
    // coarse-assign, residual, encode, table, lookup) without relying on
    // PQ recall over random data.
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 11
      Seq.fill(16) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val base = (0 until 60).map(i => (i.toLong, vec(i)))
    val planted = (0 until 4).map(i =>
      (100L + i, vec(i).zipWithIndex.map { case (v, j) => v + 0.001f * ((i + j) % 3) }))
    val df = (base ++ planted).toDF("id", "emb")
    val queries = df.filter(col("id") < 4)
    def run() = Similarity.ivfPqTopK(df, queries, "id", "emb", k = 3,
        nlist = 4, nprobe = 4, m = 4, codebookSize = 8)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val got = run()
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L))
    for ((qid, hits) <- byQuery) {
      assert(hits.map(_._4).toSeq === Seq(1, 2, 3), s"query $qid ranks")
      assert(hits.head._2 === 100L + qid,
        s"query $qid: planted copy must be the ADC top-1, got ${hits.head._2}")
      assert(hits.head._3 < hits(1)._3, s"query $qid: top-1 must strictly win")
    }
    assert(got === run(), "IVF-PQ must be deterministic run to run")
  }

  test("ivfPqTopKRerank: exact re-rank of a full shortlist equals in-list brute force") {
    // With an exhaustive coarse probe and a shortlist covering the whole
    // corpus, the ADC stage can only SELECT candidates (all of them) and
    // the exact re-rank must reproduce brute-force cosine order exactly.
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 17
      Seq.fill(16) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val rows = (0 until 50).map(i => (i.toLong, vec(i)))
    val df = rows.toDF("id", "emb")
    val queries = df.filter(col("id") < 3)
    val got = Similarity.ivfPqTopKRerank(df, queries, "id", "emb", k = 3,
        shortlist = 100, nlist = 4, nprobe = 4, m = 4, codebookSize = 8)
      .as[(Long, Long, Double, Int)].collect()
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === Set(0L, 1L, 2L))
    for ((qid, hits) <- byQuery) {
      val qv = rows(qid.toInt)._2
      val brute = rows.filter(_._1 != qid)
        .map { case (i, v) => (i, cos(qv, v)) }
        .sortBy { case (i, c) => (-c, i) }.take(3).map(_._1)
      assert(hits.sortBy(_._4).map(_._2).toSeq === brute.toSeq, s"query $qid")
    }
  }

  test("randomRotation: orthogonal, and matvecCol application preserves dot products") {
    val dim = 16
    val r = Similarity.randomRotation(dim, seed = 7L)
    // R·Rᵀ = I within float slop (rows were Gram-Schmidt orthonormalized)
    for (i <- 0 until dim; j <- 0 until dim) {
      val d = (0 until dim).map(k => r(i)(k) * r(j)(k)).sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"R·Rᵀ[$i][$j]")
    }
    // the executor-side kernel agrees: dot(Rx, Ry) == dot(x, y)
    val x = Seq.tabulate(dim)(i => math.sin(i + 1.0))
    val y = Seq.tabulate(dim)(i => math.cos(i * 2.0))
    val got = Seq((x, y)).toDF("x", "y")
      .select(
        Similarity.dot(
          graft.functions.VecOps.matvecCol(col("x"), r),
          graft.functions.VecOps.matvecCol(col("y"), r)).as("rot"),
        Similarity.dot(col("x"), col("y")).as("plain"))
      .as[(Double, Double)].collect()(0)
    assert(math.abs(got._1 - got._2) < 1e-9)
  }

  test("ivfOpqTopKRerank: rotated full-shortlist retrieval equals brute force") {
    // Same exhaustive setup as the ivfPqTopKRerank test: when the probe
    // covers every list and the shortlist the whole corpus, the rotation
    // can only change WHICH codes represent a vector, never the exact
    // re-rank's cosine order — OPQ must reproduce brute force too.
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 17
      Seq.fill(16) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val rows = (0 until 50).map(i => (i.toLong, vec(i)))
    val df = rows.toDF("id", "emb")
    val queries = df.filter(col("id") < 3)
    val got = Similarity.ivfOpqTopKRerank(df, queries, "id", "emb", k = 3,
        dim = 16, shortlist = 100, nlist = 4, nprobe = 4, m = 4, codebookSize = 8)
      .as[(Long, Long, Double, Int)].collect()
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === Set(0L, 1L, 2L))
    for ((qid, hits) <- byQuery) {
      val qv = rows(qid.toInt)._2
      val brute = rows.filter(_._1 != qid)
        .map { case (i, v) => (i, cos(qv, v)) }
        .sortBy { case (i, c) => (-c, i) }.take(3).map(_._1)
      assert(hits.sortBy(_._4).map(_._2).toSeq === brute.toSeq, s"query $qid")
    }
  }

  test("pqEncode: m tinyint codes per vector, codes within the codebook range") {
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 13
      Seq.fill(16) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val df = (0 until 50).map(i => (i.toLong, vec(i))).toDF("id", "emb")
    val cents = Similarity.kmeansCentroids(df, "id", "emb", nlist = 4)
    val books = Similarity.pqCodebooks(df, "id", "emb", cents, m = 4, codebookSize = 8)
    assert(books.size === 4 && books.forall(_.size === 8)
      && books.forall(_.forall(_.size === 4)))
    val coded = Similarity.pqEncode(df, "id", "emb", cents, books)
      .as[(Long, Int, Seq[Byte])].collect()
    assert(coded.length === 50)
    assert(coded.forall(_._3.size === 4), "m codes per vector")
    assert(coded.forall(_._3.forall(c => c >= 0 && c < 8)), "codes in [0, K)")
    assert(coded.forall(r => r._2 >= 0 && r._2 < 4), "list id in [0, nlist)")
  }

  test("pqCodebooks: identical codebooks across partition layouts (hash-order cap)") {
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 2654435761L + 13
      Seq.fill(16) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val df = (0 until 200).map(i => (i.toLong, vec(i))).toDF("id", "emb")
    val cents = Similarity.kmeansCentroids(df, "id", "emb", nlist = 4)
    // maxTrain below the row count so the cap actually bites; three
    // adversarial layouts (1 partition, 13 round-robin, hash by id)
    def books(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqCodebooks(d, "id", "emb", cents, m = 4, codebookSize = 8,
        maxTrain = 120)
    val base = books(df.coalesce(1))
    assert(books(df.repartition(13)) === base, "round-robin layout")
    assert(books(df.repartition(5, col("id"))) === base, "hash layout")
  }

  test("quantize/dequantize: int8 roundtrip preserves cosine within 1%") {
    def vec(seed: Long): Seq[Float] = {
      var x = seed * 9176L + 3
      Seq.fill(32) { x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f }
    }
    val df = (0 until 50).map(i => (i.toLong, vec(i))).toDF("id", "emb")
    val q = Similarity.quantize(df, "id", "emb")
    // schema: tinyint array + float scale (the 4x storage claim)
    assert(q.schema("qvec").dataType.simpleString === "array<tinyint>")
    val joined = df.join(q, "id").select(
      col("id"),
      Similarity.cosine(
        col("emb"), Similarity.dequantize(col("qvec"), col("scale")),
        Similarity.l2norm(col("emb")),
        Similarity.l2norm(Similarity.dequantize(col("qvec"), col("scale")))).as("cos"))
    val cosines = joined.as[(Long, Double)].collect().map(_._2)
    assert(cosines.forall(_ > 0.99), s"worst cosine ${cosines.min}")
    // quantized values actually bounded to int8
    val maxAbs = q.select(array_max(transform(col("qvec"), x => abs(x.cast("int")))))
      .as[Int].collect().max
    assert(maxAbs <= 127)
  }

  test("matryoshkaTopK: full shortlist equals exact top-k; tail-blind prefix is reranked") {
    // 6 corpus vectors, 1 query; dims 1-2 are the "prefix", 3-4 the tail
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // the query
      (1L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),   // prefix-identical, tail drifts
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // exact duplicate of the query
      (3L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),   // near in prefix and in full
      (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal
      (5L, Seq(1.0f, 0.0f, 3.0f, 0.0f))    // prefix-IDENTICAL, full-far
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
    // shortlist = whole corpus -> the prefix stage cannot lose anyone,
    // so the result must equal the exact brute-force top-k row-for-row
    val exact = Similarity.cosineTopK(vecs, q, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    val mrlFull = Similarity.matryoshkaTopK(vecs, q, "vec_id", "embedding",
        prefixDim = 2, shortlist = 5, k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(mrlFull.toSeq === exact.toSeq)
    // full ranking puts the true duplicate (2) first; vec 5's prefix is
    // IDENTICAL to the query's (pcos = 1) but its tail drags the full
    // cosine to ~0.32 — with the full shortlist the rerank demotes it
    assert(mrlFull.map(_._2).toSeq === Seq(2L, 3L, 1L))
    // the documented trade: a tiny shortlist is prefix-BLIND — vecs 1,
    // 2, 5 all tie at pcos = 1 (prefix identical to the query), so the
    // vec_id tie-break fills shortlist 3 with exactly {1, 2, 5} and the
    // genuinely-2nd-best vec 3 (pcos 0.995) never reaches the rerank —
    // which then orders the shortlist by TRUE cosine
    val mrlTiny = Similarity.matryoshkaTopK(vecs, q, "vec_id", "embedding",
        prefixDim = 2, shortlist = 3, k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(mrlTiny.map(_._2).toSeq === Seq(2L, 1L, 5L))
  }
}
