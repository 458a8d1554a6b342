package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * The tier ladder, per the 100 TB design rule — each step trades exact
  * work for a cheaper corpus-side representation:
  *  - `cosineTopK`: exact brute force with the QUERY side broadcast — the
  *    corpus streams through one pass, no shuffle of the corpus.
  *  - `lshTopK` / `nearDupPairs`: random-hyperplane LSH buckets the corpus
  *    once, then joins on bucket id — the pair space is |bucket|², the
  *    scale path when the query set itself is large.
  *  - `ivfTopK` / `ivfTopKTrained` / `ivfTopKBroadcast`: coarse-quantizer
  *    inverted lists; probing is a hash join on list ids.
  *  - `ivfPqTopK` (+ `ivfPqTopKRerank`): the memory-bound tier — vectors
  *    as m one-byte PQ codes, asymmetric-distance scoring, optional exact
  *    re-rank of a per-query shortlist.
  *
  * Vector math runs as native codegen'd kernels where it is hot
  * ([[graft.functions.VecOps]]: the ANN pair-score dot, the PQ encode
  * chain — bit-identical IEEE fold to the higher-order-function forms)
  * and as built-in higher-order functions elsewhere. No UDFs, no MLlib
  * Vector boxing.
  */
object Similarity {

  /** dot(a, b) with double accumulation — a native codegen'd kernel
    * ([[graft.functions.VecOps.dot]]) with the exact IEEE fold order of
    * the equivalent `aggregate(zip_with(a, b, _*_), 0.0, _+_)` chain, so
    * results are bit-identical to the higher-order-function form (and to
    * DuckDB's list_dot_product, which cosine_topk's oracle pins) while
    * the per-pair cost drops from ~4·dim boxed expression evals to one
    * static call. This is the inner loop of every ANN pair score. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecOps.dotCol(a, b)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); the corpus is
    * never shuffled — only the (|queries| × k) result heap is. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("norm", l2norm(col("vec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", l2norm(col("qvec")))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("vec"), col("qvec"), col("norm"), col("qnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** Matryoshka (MRL) two-stage top-k (Kusupati et al. 2022, public
    * knowledge: embeddings trained so every PREFIX of the vector is
    * itself a valid lower-dim embedding): stage 1 shortlists by cosine
    * over the first `prefixDim` dims (truncate + renormalize — the MRL
    * serving pattern), stage 2 re-ranks the shortlist with the exact
    * full-dim cosine. The [[ivfPqRerank]] shortlist-then-rerank shape
    * with dimension truncation as the cheap stage instead of quantized
    * codes — at scale the prefix slice is what a serving tier keeps hot
    * (prefixDim/dim of the bandwidth and FLOPs per scanned candidate;
    * here 4× at 16/64), with the full vectors touched only for the
    * `shortlist` survivors per query. Same determinism discipline as
    * [[cosineTopK]]: the VecOps dot's IEEE fold on the SLICED array is
    * bit-identical to DuckDB's list_dot_product over the same slice, and
    * both rank ties break on vec_id — so the whole two-stage result is
    * exactly replayable, including which candidates make the shortlist. */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, prefixDim: Int, shortlist: Int,
                     k: Int): DataFrame = {
    require(prefixDim > 0, "prefixDim must be positive")
    require(shortlist >= k && k > 0, "need shortlist >= k > 0")
    // the "cheap prefix" contract needs prefixDim at or below the
    // embedding dim: slice() past the end silently returns the whole
    // vector, which keeps results CORRECT but turns stage 1 into the
    // full-dim cosine computed twice — the advertised bandwidth/FLOP
    // saving vanishes with no visible failure. Schema check first (a
    // non-array column must fail with the named message, not a
    // ClassCastException), then ONE bounded aggregate over the
    // broadcast-small queries frame — min(size) catches ragged vectors
    // in ANY row and a null count catches null vectors anywhere, where
    // the r19 head(1) probe validated only the first row (r19 advice
    // fix). An EMPTY queries frame still passes the schema check but
    // skips the dim check by design — with zero rows there is no
    // embedding dim to validate against and the result is empty either
    // way (the vacuous case, not a hole). This is still a deliberate
    // eager job at frame-construction time; the queries side is
    // broadcast-small by the operator's contract.
    val vecField = queries.schema.fields.find(_.name == vecCol).getOrElse(
      throw new IllegalArgumentException(
        s"matryoshkaTopK: queries has no column '$vecCol'"))
    require(vecField.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
      s"matryoshkaTopK: '$vecCol' must be an array column, got " +
        vecField.dataType.simpleString)
    val probe = queries.agg(
      min(size(col(vecCol))).as("min_dim"),
      sum(when(col(vecCol).isNull, 1L).otherwise(0L)).as("n_null"),
      count(lit(1)).as("n")).head()
    if (probe.getLong(2) > 0) {
      require(probe.getLong(1) == 0,
        s"matryoshkaTopK: ${probe.getLong(1)} query vector(s) are null")
      val minDim = probe.getInt(0)
      require(prefixDim <= minDim,
        s"prefixDim=$prefixDim must be <= the smallest embedding dim" +
          s"=$minDim: slicing past the end degenerates the prefix stage " +
          "to the full-dim cosine")
      // == dim is legal (results stay correct) but defeats the point —
      // stage 1 IS the full-dim cosine; say so instead of rejecting
      if (prefixDim == minDim) System.err.println(
        s"[matryoshkaTopK] prefixDim=$prefixDim equals the embedding dim — " +
          "the prefix stage saves nothing; use cosineTopK directly")
    }
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("pvec", slice(col("vec"), 1, prefixDim))
      .withColumn("norm", l2norm(col("vec")))
      .withColumn("pnorm", l2norm(col("pvec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("pqvec", slice(col("qvec"), 1, prefixDim))
      .withColumn("qnorm", l2norm(col("qvec")))
      .withColumn("pqnorm", l2norm(col("pqvec")))
    val wPre = Window.partitionBy("query_id")
      .orderBy(col("pcos").desc, col("vec_id").asc)
    val short = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("pcos",
        cosine(col("pvec"), col("pqvec"), col("pnorm"), col("pqnorm")))
      .withColumn("prank", row_number().over(wPre))
      .filter(col("prank") <= shortlist)
    val wFull = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    short
      .withColumn("cos",
        cosine(col("vec"), col("qvec"), col("norm"), col("qnorm")))
      .withColumn("rank", row_number().over(wFull))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** Deterministic random hyperplanes (seeded LCG), as a literal matrix. */
  private def planes(seed: Long, nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var x = seed
    def next(): Double = {
      x = x * 6364136223846793005L + 1442695040888963407L
      // top 53 bits → uniform in [-1, 1)
      (x >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** Sign-of-dot-product LSH bucket id over `nPlanes` hyperplanes. */
  def lshBucket(vecCol: Column, nPlanes: Int, dim: Int, seed: Long = 7L): Column =
    planes(seed, nPlanes, dim).zipWithIndex.map { case (p, i) =>
      when(dot(vecCol, typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate near-duplicate pairs: corpus bucketed by hyperplane
    * signature, pairs generated within buckets only, cosine-verified. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   nPlanes: Int = 12, threshold: Double = 0.95): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), nPlanes, dim))
      .withColumn("norm", l2norm(col("vec")))
    val a = base.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"), col("norm").as("norm_a"))
    val b = base.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"), col("norm").as("norm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("vec_a"), col("vec_b"), col("norm_a"), col("norm_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Bucketed approximate top-k: queries and corpus meet only inside their
    * LSH bucket. Recall trades against bucket size via `nPlanes`;
    * `probeBits > 0` enables multi-probe — each query additionally probes
    * the buckets at Hamming distance 1 on its first `probeBits` planes
    * (query-side fan-out only; the corpus is bucketed and shuffled once,
    * which is what makes multi-probe the recall lever at 100 TB — more
    * probes, not more corpus copies). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int, nPlanes: Int = 8,
              probeBits: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), nPlanes, dim))
      .withColumn("norm", l2norm(col("vec")))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("bucket0", lshBucket(col("qvec"), nPlanes, dim))
      .withColumn("qnorm", l2norm(col("qvec")))
    val probes = col("bucket0") +: (0 until probeBits).map(b =>
      col("bucket0").bitwiseXOR(lit(1L << b)))
    val q = q0
      .withColumn("bucket", explode(array_distinct(array(probes: _*))))
      .drop("bucket0")
    val scored = c.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("vec"), col("qvec"), col("norm"), col("qnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored
      // a (query, vec) pair can match through several probes — keep one
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** IVF-style ANN: a bounded set of `nlist` coarse centroids partitions
    * the corpus (inverted lists); each query probes its `nprobe` nearest
    * centroids and scores only those lists.
    *
    * The centroids are a deterministic hash-sample of the corpus (at
    * production scale you would KMeans-train them with MLlib), pulled once
    * into a *literal unit-vector matrix* — the same dimension-table-sized
    * materialization as broadcasting a fitted KMeans model, and the reason
    * both assignment passes are pure codegen projections: list assignment
    * is argmax-dot over the literal matrix (no shuffle of the corpus, no
    * window), and the probe step is a hash join on centroid_id. Nothing
    * ever cross-joins the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame =
    ivfTopKWith(sampledCentroids(corpus, idCol, vecCol, nlist),
      corpus, queries, idCol, vecCol, k, nprobe)

  /** Deterministic hash-sampled coarse centroids (shared by [[ivfTopK]] and
    * [[ivfTopKBroadcast]] so the two policies cannot drift): the `nlist`
    * corpus rows with the smallest xxhash64(id), L2-normalized. O(nlist)
    * rows ever reach the driver. */
  private def sampledCentroids(corpus: DataFrame, idCol: String,
                               vecCol: String, nlist: Int): Seq[Seq[Double]] =
    normalized(corpus
      .select(col(vecCol).as("cvec"), xxhash64(col(idCol)).as("__r"))
      .orderBy("__r").limit(nlist)
      .select("cvec").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq)

  /** IVF with KMeans-TRAINED coarse centroids (the production quantizer):
    * MLlib KMeans fits on a deterministic hash sample of the corpus —
    * distributed, seeded, a few passes over the sample — and the fitted
    * cluster centers flow into the same literal-matrix probe machinery as
    * [[ivfTopK]]. Trained centroids track the data distribution, so lists
    * are balanced and recall at a given nprobe is higher than with sampled
    * centroids. */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
                     sampleFraction: Double = 1.0, seed: Long = 42L): DataFrame =
    ivfTopKWith(
      kmeansCentroids(corpus, idCol, vecCol, nlist, sampleFraction, seed),
      corpus, queries, idCol, vecCol, k, nprobe)

  /** Fit the coarse quantizer: KMeans over `array_to_vector` embeddings on
    * a hash sample, centers L2-normalized for dot-product argmax. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nlist: Int, sampleFraction: Double = 1.0,
                      seed: Long = 42L): Seq[Seq[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sample = Sample.hashSample(corpus, col(idCol), sampleFraction)
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // Random init, not k-means||: the parallel init alone costs
    // initSteps×(job + collect) rounds — scheduler overhead that dwarfs
    // the Lloyd's iterations on a bounded sample, and the coarse
    // quantizer only needs centers that track the density (recall gates
    // hold either way; Lloyd's iterations do the refining).
    // maxIter 10, not the MLlib default 20: every Lloyd's iteration is a
    // full Spark job, and the coarse quantizer only needs centers that
    // track density — list routing is refined by nprobe at query time, so
    // the marginal iterations buy scheduler overhead, not recall (the
    // planted-neighbor recall gates hold at 10 with margin).
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
      .setInitMode("random").setMaxIter(10)
      .fit(sample)
    normalized(model.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  /** Largest centroid count assigned through the literal-matrix codegen
    * path: each centroid folds ~64 doubles into generated code, and the
    * JVM constant pool / 64KB method limit bites around 4096×64 (the
    * ivfTopKBroadcast boundary) — 1024 leaves 4× headroom. */
  private val LiteralCentroidMax = 1024

  /** SemDeDup-style semantic dedup pairs (Abbas et al. 2023,
    * arXiv:2303.09540 — the public cluster-then-prune formulation):
    * cluster the embedding space with the TRAINED coarse quantizer
    * ([[kmeansCentroids]]), then compare vectors only WITHIN a cluster
    * and emit pairs with cosine >= `threshold`. Compose with
    * [[Dedup.canonicalize]] to keep one representative per group.
    *
    * The cluster id is the blocking key — the complement of
    * [[nearDupPairs]]' random-hyperplane buckets: trained centroids track
    * the data distribution, so blocking recall holds in anisotropic
    * embedding spaces where fixed random planes split dense regions. Pair
    * space is Σ|cluster|², never |corpus|² — which makes `nlist` the
    * CORPUS-PROPORTIONAL knob: at fixed nlist the expected pair count is
    * n²/nlist (quadratic — measured 15.7× for a 10× corpus at nlist=16),
    * so production callers scale nlist with n (the SemDeDup paper trains
    * tens of thousands of clusters for web corpora), keeping mean cluster
    * size — and the pair space per row — constant. Same contract as the
    * LSH tier's plane count. `maxCluster` is the same
    * skew guard as the LSH band joins (a degenerate cluster of
    * near-identical boilerplate embeddings would explode quadratically —
    * capped clusters drop from candidate generation only, and the cap
    * window rides the self-join's own exchange). Assignment is a
    * map-only projection, no shuffle before the one cluster-keyed
    * self-join — via the LITERAL centroid matrix (the ivfTopK shape:
    * codegen'd native-dot argmax, r16) while nlist fits the codegen
    * constant pool, falling back to the broadcast-centroid running-argmax
    * fold above that (the interpreted HOF costs ~10× per centroid-dot,
    * which is the whole assignment bill once nlist follows the ∝ n
    * contract). Both paths break sim ties toward the HIGHER cid, so for
    * FINITE vectors the choice cannot move an assignment. Caveat: a NaN
    * embedding component makes every centroid dot NaN, and the paths
    * then DIVERGE — greatest() over structs ranks NaN highest (some
    * NaN-dot centroid wins) while the fold's `sim >= acc.sim` is false
    * for NaN (the NaN row keeps cid -1 from the init). Finite vectors
    * are the operator's contract (the embedding sources here are unit-
    * normalized floats); callers ingesting untrusted vectors should
    * filter non-finite components upstream rather than rely on either
    * path's NaN placement. */
  def semanticDedupPairs(df: DataFrame, idCol: String, vecCol: String,
                         nlist: Int = 16, threshold: Double = 0.95,
                         sampleFraction: Double = 1.0, seed: Long = 42L,
                         maxCluster: Int = 100000,
                         centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // callers with a pre-fitted cluster model (the common production case:
    // the corpus-curation KMeans is trained once and reused) plug in here,
    // same as ivfTopKWithBroadcast
    val cents = centroids.map(normalized)
      .getOrElse(kmeansCentroids(df, idCol, vecCol, nlist, sampleFraction, seed))
    val assigned = (
      if (cents.length > 1 && cents.length <= LiteralCentroidMax) {
        // greatest over (sim, cid) structs == the fold's `>=` update rule:
        // on a sim tie both pick the highest cid. (greatest needs ≥2
        // args, hence the length > 1 bound — a single-centroid caller
        // trivially assigns cluster 0 below)
        val assignLit = (vec: Column) => greatest(cents.zipWithIndex.map {
          case (c, i) => struct(dot(vec, typedLit(c)).as("sim"), lit(i).as("cid"))
        }: _*).getField("cid")
        df.select(col(idCol).as("id"), col(vecCol).as("vec"))
          .withColumn("cluster", assignLit(col("vec")))
      } else {
        val centRow = broadcast(
          cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cid", "cvec")
            .agg(sort_array(collect_list(struct(col("cid"), col("cvec")))).as("__cents")))
        val assignFold = (vec: Column) =>
          aggregate(
            transform(col("__cents"),
              s => struct(dot(vec, s.getField("cvec")).as("sim"), s.getField("cid").as("cid"))),
            struct(lit(Double.MinValue).as("sim"), lit(-1).as("cid")),
            (acc, s) => when(s.getField("sim") >= acc.getField("sim"), s).otherwise(acc))
            .getField("cid")
        df.select(col(idCol).as("id"), col(vecCol).as("vec"))
          .crossJoin(centRow)
          .withColumn("cluster", assignFold(col("vec")))
          .drop("__cents")
      })
      .withColumn("norm", l2norm(col("vec")))
    val guarded =
      if (maxCluster == Int.MaxValue) assigned
      else assigned
        .withColumn("__n", count(lit(1)).over(Window.partitionBy("cluster")))
        .filter(col("__n") <= maxCluster).drop("__n")
    val a = guarded.select(col("cluster"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("norm").as("norm_a"))
    val b = guarded.select(col("cluster"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("norm").as("norm_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("vec_a"), col("vec_b"), col("norm_a"), col("norm_b")))
      .filter(col("cos") >= threshold)
      .select("cluster", "id_a", "id_b", "cos")
  }

  /** Symmetric per-vector int8 scalar quantization — the storage tier for
    * an embedding lake (4× smaller than float32 at rest; cosine after
    * dequantization stays within ~1% for typical embeddings). Pure
    * projection: (id, scale, qvec tinyint[]). */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // The scale is an O(dim) reduction; keep it OUT of the per-element
    // lambda below. transform() re-evaluates its whole lambda body per
    // element, so inlining the array_max chain there costs O(dim²) per row
    // (measured 3× on the sf0.1 roundtrip gate). Behind a projection
    // boundary it is evaluated once per row; CollapseProject leaves the two
    // selects apart because __scale is non-cheap and referenced twice.
    df.select(col(idCol), col(vecCol),
        (greatest(
          array_max(transform(col(vecCol), x => abs(x.cast("double")))),
          lit(1e-12)) / 127.0).as("__scale"))
      .select(
        col(idCol),
        col("__scale").cast("float").as("scale"),
        transform(col(vecCol),
          x => round(x.cast("double") / col("__scale")).cast("tinyint")).as("qvec"))
  }

  /** Inverse of [[quantize]]: float vector from (qvec, scale). */
  def dequantize(qvec: Column, scale: Column): Column =
    transform(qvec, q => (q.cast("double") * scale).cast("float"))

  /** Column form of [[quantize]]: `struct(scale, qvec)` from a vector —
    * composable inside a single projection (no self-join needed to compare
    * a corpus against its own quantized form). PERF: because the scale
    * reduction sits inside the transform lambda here, this form is
    * O(dim²) per row under interpreted higher-order-function eval — fine
    * for ad-hoc use, but hot paths should use [[quantize]]'s hoisted
    * two-projection shape instead. */
  def quantized(vec: Column): Column = {
    val scale = greatest(
      array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-12)) / 127.0
    struct(
      scale.cast("float").as("scale"),
      transform(vec, x => round(x.cast("double") / scale).cast("tinyint")).as("qvec"))
  }

  /** IVF for LARGE `nlist` (≈4096+): the literal centroid matrix of
    * [[ivfTopK]] is baked into generated code and blows past codegen /
    * constant-pool limits well before 4096×64 doubles. Here the centroids
    * ride along as ONE broadcast row holding an array of (cid, cvec)
    * structs, and assignment is a running-argmax fold over that array —
    * still a pure projection per corpus row (no explosion, no window, no
    * corpus shuffle), and the probe step stays a hash join on the list id.
    * Same sampled-centroid policy as [[ivfTopK]]; spec asserts the two
    * paths agree exactly at small nlist. */
  def ivfTopKBroadcast(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, k: Int, nlist: Int = 16,
                       nprobe: Int = 4): DataFrame =
    ivfTopKWithBroadcast(sampledCentroids(corpus, idCol, vecCol, nlist),
      corpus, queries, idCol, vecCol, k, nprobe)

  /** Broadcast-array centroid machinery behind [[ivfTopKBroadcast]] —
    * callers with their own (e.g. KMeans-trained) centroids plug in here. */
  def ivfTopKWithBroadcast(cents: Seq[Seq[Double]], corpus: DataFrame,
                           queries: DataFrame, idCol: String, vecCol: String,
                           k: Int, nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // one row: array<struct<cid,cvec>> — broadcast to every task like a
    // dimension table; the data never appears in generated code
    val centRow = broadcast(
      cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cid", "cvec")
        .agg(sort_array(collect_list(struct(col("cid"), col("cvec")))).as("__cents")))

    def sims(vec: Column): Column =
      transform(col("__cents"),
        s => struct(dot(vec, s.getField("cvec")).as("sim"), s.getField("cid").as("cid")))
    // running argmax over the centroid array: one fold, no sort. `>=` so an
    // exact sim tie resolves to the larger cid — the same (sim, cid) struct
    // order the literal path's greatest() uses.
    def assignList(vec: Column): Column =
      aggregate(sims(vec),
        struct(lit(Double.MinValue).as("sim"), lit(-1).as("cid")),
        (acc, s) => when(s.getField("sim") >= acc.getField("sim"), s).otherwise(acc))
        .getField("cid")
    def probeLists(vec: Column): Column =
      transform(slice(reverse(array_sort(sims(vec))), 1, nprobe),
        s => s.getField("cid"))

    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .crossJoin(centRow)
      .withColumn("centroid_id", assignList(col("vec")))
      .withColumn("norm", l2norm(col("vec")))
      .drop("__cents")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .crossJoin(centRow)
      .withColumn("centroid_id", explode(probeLists(col("qvec"))))
      .withColumn("qnorm", l2norm(col("qvec")))
      .drop("__cents")
    scoreWithinLists(c, q, k)
  }

  private def normalized(vs: Seq[Seq[Double]]): Seq[Seq[Double]] =
    vs.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / (if (n == 0.0) 1.0 else n))
    }

  private def ivfTopKWith(cents: Seq[Seq[Double]], corpus: DataFrame,
                          queries: DataFrame, idCol: String, vecCol: String,
                          k: Int, nprobe: Int): DataFrame = {

    // (dot with each unit centroid, centroid index) — the vector's own norm
    // is a common positive factor and cannot change the argmax/ordering.
    def centSims(vec: Column): Seq[Column] =
      cents.zipWithIndex.map { case (c, i) =>
        struct(dot(vec, typedLit(c)).as("sim"), lit(i).as("cid"))
      }
    def assignList(vec: Column): Column = greatest(centSims(vec): _*).getField("cid")
    def probeLists(vec: Column): Column =
      transform(
        slice(reverse(array_sort(array(centSims(vec): _*))), 1, nprobe),
        s => s.getField("cid"))

    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("centroid_id", assignList(col("vec")))
      .withColumn("norm", l2norm(col("vec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("centroid_id", explode(probeLists(col("qvec"))))
      .withColumn("qnorm", l2norm(col("qvec")))
    scoreWithinLists(c, q, k)
  }

  /** Shared IVF tail: hash join corpus↔queries on the probed list id, score
    * cosine, rank per query. No dedup needed: every corpus vector lives in
    * exactly one list, so a (query, vector) pair can only meet once. */
  private def scoreWithinLists(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val scored = c.join(q, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("vec"), col("qvec"), col("norm"), col("qnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  // ---- IVF-PQ: product-quantized codes + asymmetric distance ----------
  //
  // The memory-bound tier. The tiers above still JOIN the raw vectors of
  // every probed list; at 10^9+ vectors the float payload itself is the
  // bottleneck. IVF-PQ stores each vector as `m` tinyint codes (8 bytes at
  // the defaults vs 256 for float32×64): unit-normalize, subtract the
  // assigned coarse centroid, split the residual into m subspaces, and
  // code each slice against a per-subspace KMeans codebook. Search scores
  // CODES, not vectors — per (query, probed list) an m×K lookup table of
  // exact subspace distances is computed once, and each candidate costs m
  // array lookups (asymmetric distance computation). On unit vectors,
  // ascending L2 ADC order ≈ descending cosine order.

  /** Unit-normalize, coarse-assign (dot argmax against the literal unit
    * centroids), subtract the assigned centroid. Every O(dim) reduction
    * sits behind its own projection boundary and is referenced ≥2× so
    * CollapseProject cannot inline it into a per-element lambda (the
    * O(dim²) trap documented at [[quantize]]). */
  private def residuals(df: DataFrame, idCol: String, vecCol: String,
                        cents: Seq[Seq[Double]]): DataFrame = {
    val centLit = typedlit(cents)
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("__n", greatest(l2norm(col("v")), lit(1e-12)))
      .select(col("id"), transform(col("v"), x => x / col("__n")).as("u"), col("__n"))
      .select(col("id"), col("u"),
        greatest(cents.zipWithIndex.map { case (c, i) =>
          struct(dot(col("u"), typedlit(c)).as("sim"), lit(i).as("cid")) }: _*)
          .getField("cid").as("centroid_id"))
      .select(col("id"), col("centroid_id"),
        zip_with(col("u"), element_at(centLit, col("centroid_id") + 1),
          (x, c) => x - c).as("res"))
  }

  /** Exact squared L2 between a (residual-slice) column and a literal
    * codeword. */
  private def sqDist(v: Column, cw: Seq[Double]): Column =
    aggregate(zip_with(v, typedlit(cw), (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, x) => acc + x)

  /** Train the per-subspace PQ codebooks on coarse residuals. PQ codebook
    * training is a bounded-sample problem by design (m tiny k-means over
    * dim/m-wide slices), so the sample is COLLECTED — capped at
    * `maxTrain` rows, ≤32 MB at the defaults, the same justified-collect
    * category as the O(nlist) centroid pull — and m deterministic Lloyd's
    * runs execute driver-side. The distributed alternative (m sequential
    * MLlib fits) costs m×iterations Spark jobs to cluster kilobytes of
    * data: at any corpus scale the sample cap bounds the driver work,
    * while the job count would not shrink. m×K×(dim/m) doubles out — 8 KB
    * at the defaults, literal-sized, so encode/search stay projections. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  cents: Seq[Seq[Double]], m: Int = 8, codebookSize: Int = 16,
                  sampleFraction: Double = 1.0, seed: Long = 42L,
                  maxTrain: Int = 65536, iters: Int = 12): Seq[Seq[Seq[Double]]] = {
    val dim = cents.head.size
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val sub = dim / m
    // Cap the sample in HASH order, not `.limit` order: a bare LIMIT
    // without ORDER BY is partition-layout dependent, so two runs over
    // differently-partitioned inputs would train different codebooks.
    // orderBy+limit plans as TakeOrderedAndProject (per-partition top-K,
    // no full shuffle), so the cap stays cheap and fully deterministic.
    val sample: Array[Seq[Double]] = residuals(
      Sample.hashSample(corpus, col(idCol), sampleFraction), idCol, vecCol, cents)
      .select(col("id"), col("res"))
      .orderBy(xxhash64(col("id")), col("id")).limit(maxTrain)
      .select(col("res"))
      .collect().map(_.getSeq[Double](0))
    (0 until m).map { mi =>
      val slices = sample.map(r => r.slice(mi * sub, (mi + 1) * sub).toArray)
      lloyd(slices, codebookSize, iters, seed + mi).map(_.toSeq).toSeq
    }
  }

  /** Deterministic Lloyd's k-means (driver-side, for bounded PQ codebook
    * samples): seeded-hash initial centers, `iters` assign/update rounds,
    * empty clusters re-seeded from the point farthest from its center. */
  private def lloyd(points: Array[Array[Double]], k: Int, iters: Int,
                    seed: Long): Array[Array[Double]] = {
    val n = points.length
    require(n > 0, "empty PQ training sample")
    val d = points(0).length
    // deterministic distinct-ish init: points at seeded-LCG positions
    var x = seed
    def next(): Int = { x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) % n).toInt }
    val centers = Array.tabulate(k)(_ => points(next()).clone())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var p = 0
      while (p < n) {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          val dd = d2(points(p), centers(c))
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        assign(p) = best; p += 1
      }
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      p = 0
      while (p < n) {
        val c = assign(p); counts(c) += 1
        var i = 0
        while (i < d) { sums(c)(i) += points(p)(i); i += 1 }
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < d) { centers(c)(i) = sums(c)(i) / counts(c); i += 1 }
        } else {
          // re-seed an empty cluster from the worst-fit point
          var worst = 0; var worstD = -1.0; var p2 = 0
          while (p2 < n) {
            val dd = d2(points(p2), centers(assign(p2)))
            if (dd > worstD) { worstD = dd; worst = p2 }
            p2 += 1
          }
          centers(c) = points(worst).clone()
        }
        c += 1
      }
      it += 1
    }
    centers
  }

  /** Encode the corpus: (vec_id, centroid_id, codes array<tinyint>[m]) —
    * per subspace, the argmin-distance codeword index; ties resolve to the
    * larger index, deterministically. The whole normalize→assign→residual→
    * code chain runs as ONE native codegen'd kernel per row
    * ([[graft.functions.VecOps.ivfPqCode]]) — the interpreted
    * higher-order-function form costs ~2k boxed expression evals per row,
    * which at corpus scale is pure CPU tax on the encode pass. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = books.size
    corpus
      .select(col(idCol).as("vec_id"),
        graft.functions.VecOps.ivfPqCodeCol(col(vecCol), cents, books).as("cc"))
      .select(col("vec_id"),
        col("cc").getItem(0).as("centroid_id"),
        slice(col("cc"), 2, m).cast("array<tinyint>").as("codes"))
  }

  /** IVF-PQ search with caller-supplied coarse centroids + codebooks.
    * Corpus side: one encode projection, hash-partitioned by list id.
    * Query side: top-`nprobe` lists, one ADC table (m×K exact subspace
    * distances) per (query, list). The join ships CODES (m bytes/vector)
    * — never the float payload — and each candidate costs m lookups. */
  def ivfPqTopKWith(cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]],
                    corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val m = books.size
    val kk = books.head.size
    val sub = books.head.head.size
    val centLit = typedlit(cents)
    val coded = pqEncode(corpus, idCol, vecCol, cents, books)
    def centSims(u: Column): Seq[Column] =
      cents.zipWithIndex.map { case (c, i) =>
        struct(dot(u, typedlit(c)).as("sim"), lit(i).as("cid")) }
    val adcEntries = books.zipWithIndex.flatMap { case (book, mi) =>
      val sl = slice(col("qres"), mi * sub + 1, sub)
      book.map(cw => sqDist(sl, cw))
    }
    val qt = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("__n", greatest(l2norm(col("v")), lit(1e-12)))
      .select(col("query_id"), transform(col("v"), x => x / col("__n")).as("u"), col("__n"))
      .select(col("query_id"), col("u"),
        explode(transform(
          slice(reverse(array_sort(array(centSims(col("u")): _*))), 1, nprobe),
          s => s.getField("cid"))).as("centroid_id"))
      .select(col("query_id"), col("centroid_id"),
        zip_with(col("u"), element_at(centLit, col("centroid_id") + 1),
          (x, c) => x - c).as("qres"))
      .select(col("query_id"), col("centroid_id"), array(adcEntries: _*).as("adt"))
    val scored = coded.join(qt, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adist",
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (c, i) => element_at(col("adt"), i * kk + c + 1)),
          lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy("query_id").orderBy(col("adist").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "adist", "rank")
  }

  /** Coarse centroids via the same driver-side Lloyd's as the PQ
    * codebooks: unit-normalized hash-sampled vectors are collected (capped
    * at `maxTrain`, ≤32 MB at the defaults), clustered locally, and the
    * centers re-normalized for dot-product argmax. Same rationale as
    * [[pqCodebooks]]: clustering a BOUNDED sample is driver work by
    * design; an iterative distributed fit pays jobs-per-iteration to
    * cluster megabytes. [[kmeansCentroids]] (MLlib) remains the choice
    * where the fit itself should be distributed. */
  def lloydCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     nlist: Int, sampleFraction: Double = 1.0,
                     seed: Long = 42L, maxTrain: Int = 65536,
                     iters: Int = 12): Seq[Seq[Double]] = {
    // hash-ordered cap, same reasoning as [[pqCodebooks]]: a bare LIMIT is
    // partition-layout dependent and would train layout-dependent centers
    val sample = Sample.hashSample(corpus, col(idCol), sampleFraction)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("__n", greatest(l2norm(col("v")), lit(1e-12)))
      .select(col("id"), transform(col("v"), x => x / col("__n")).as("u"))
      .orderBy(xxhash64(col("id")), col("id")).limit(maxTrain)
      .select(col("u")).collect().map(_.getSeq[Double](0).toArray)
    normalized(lloyd(sample, nlist, iters, seed).map(_.toSeq).toSeq)
  }

  /** End-to-end IVF-PQ: Lloyd's coarse quantizer + per-subspace codebooks
    * trained on a capped hash sample, then [[ivfPqTopKWith]]. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, codebookSize: Int = 16,
                sampleFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    val cents = lloydCentroids(corpus, idCol, vecCol, nlist, sampleFraction, seed)
    val books = pqCodebooks(corpus, idCol, vecCol, cents, m, codebookSize,
      sampleFraction, seed)
    ivfPqTopKWith(cents, books, corpus, queries, idCol, vecCol, k, nprobe)
  }

  /** Two-stage retrieval — the production IVF-PQ pattern: the ADC pass
    * shortlists `shortlist` candidates per query from CODES alone, and
    * only that shortlist (|queries|×shortlist rows, not the corpus) joins
    * back to the raw vectors for an exact cosine re-rank. Quantization
    * error then affects only which candidates make the shortlist, never
    * their final order — with a generous shortlist this recovers
    * brute-force ordering inside the probed lists while the corpus-wide
    * work still touches nothing but 8-byte codes. */
  def ivfPqTopKRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, k: Int, shortlist: Int = 50,
                      nlist: Int = 16, nprobe: Int = 4,
                      m: Int = 8, codebookSize: Int = 16,
                      sampleFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    val cand = ivfPqTopK(corpus, queries, idCol, vecCol, k = shortlist,
      nlist, nprobe, m, codebookSize, sampleFraction, seed)
      .select("query_id", "vec_id")
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
      .withColumn("norm", l2norm(col("vec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", l2norm(col("qvec")))
    val exact = cand
      .join(c, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos", cosine(col("vec"), col("qvec"), col("norm"), col("qnorm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** Seeded random orthogonal rotation — the OPQ initialization (FAISS's
    * OPQMatrix starts from exactly this; Ge et al., "Optimized Product
    * Quantization", CVPR 2013, use it as the R(0) of the alternating
    * minimization). A Gaussian matrix orthonormalized by modified
    * Gram-Schmidt: O(dim³) driver-side on a 64-dim space is microseconds,
    * and the result ships to executors as ONE plan literal. */
  def randomRotation(dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    val m = Array.fill(dim, dim)(rnd.nextGaussian())
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) {
        var d = 0.0; var k = 0
        while (k < dim) { d += m(i)(k) * m(j)(k); k += 1 }
        k = 0
        while (k < dim) { m(i)(k) -= d * m(j)(k); k += 1 }
        j += 1
      }
      val n = math.sqrt(m(i).map(x => x * x).sum)
      require(n > 1e-9, s"degenerate rotation row $i — change the seed")
      var k = 0
      while (k < dim) { m(i)(k) /= n; k += 1 }
      i += 1
    }
    m.map(_.toSeq).toSeq
  }

  /** OPQ-rotated two-stage IVF-PQ: a fixed orthogonal rotation is applied
    * to corpus and queries before coarse quantization + PQ coding, so the
    * per-subspace codebooks quantize decorrelated coordinates instead of
    * whatever axes the embedding model happened to emit — the standard fix
    * for PQ's blind spot (energy concentrated in a few of the m subspaces
    * starves the rest of codebook resolution). Rotation preserves inner
    * products exactly, so the exact re-rank stage scores TRUE cosines and
    * the brute-force gate remains the ground truth unchanged.
    *
    * Scale shape: identical to [[ivfPqTopKRerank]] plus one
    * `VecOps.matvec` projection per row — a native kernel inside
    * whole-stage codegen, with the dim×dim matrix a plan literal (32 KB at
    * dim=64), NOT a join side or a broadcast variable. Nothing new
    * shuffles; the exchanged payload is still 8-byte codes. */
  def ivfOpqTopKRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, k: Int, dim: Int, shortlist: Int = 50,
                       nlist: Int = 16, nprobe: Int = 4,
                       m: Int = 8, codebookSize: Int = 16,
                       sampleFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    val rot = randomRotation(dim, seed)
    def rotated(df: DataFrame) = df.select(
      col(idCol),
      graft.functions.VecOps.matvecCol(col(vecCol), rot).as("__rv"))
    ivfPqTopKRerank(rotated(corpus), rotated(queries), idCol, "__rv",
      k, shortlist, nlist, nprobe, m, codebookSize, sampleFraction, seed)
  }

  /** Cluster-balanced diversity selection — the D4/SSL-prototypes-family
    * "pick k documents that COVER the embedding space" step (Tirumala et
    * al. 2023; Sorscher et al. 2022 — public papers): a training subset
    * drawn uniformly over-represents the dense modes of the corpus, so
    * selection partitions the space into `nlist` clusters and fills the
    * k slots round-robin across clusters, most-prototypical-first within
    * each. Centroids are the nlist corpus rows with the smallest
    * md5-prefix draw — deterministic AND engine-replayable, unlike
    * xxhash64 sampling or a KMeans fit, so the WHOLE selection (centroid
    * choice, cluster assignment, in-cluster rank, final pick order)
    * replays bit-for-bit in a second engine: cosines ride the same
    * double-fold [[dot]] chain the cosine_topk oracle pins.
    *
    * Emits the k picked rows: (pick_order, vec_id, cluster_id,
    * cluster_rank, cos). pick_order interleaves clusters (all rank-1
    * representatives first, then rank-2, ...), so ANY prefix of the
    * output is itself cluster-balanced — cutting at k' < k needs no
    * re-selection. Zero vectors (no cosine) never enter. If a cluster
    * holds fewer than ceil(k/nlist) members the output may fall short of
    * k rather than over-draw dense clusters — the quota IS the diversity
    * guarantee.
    *
    * Scale shape: assignment is map-only (a literal centroid matrix —
    * ≤ nlist·dim doubles in the plan — scored with the codegen'd [[dot]]
    * kernel). The per-cluster rank is a window by cluster_id whose
    * `cluster_rank ≤ quota` filter Catalyst's InferWindowGroupLimit
    * pushes BELOW the exchange (the domain_cap lesson): each map
    * partition ships at most quota rows per cluster, so the shuffle and
    * the final single-partition pick window both see ≤ nlist·quota rows
    * regardless of corpus size. O(nlist) rows ever reach the driver. */
  def diversitySample(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, nlist: Int = 8,
                      centroids: Option[Seq[Seq[Double]]] = None): DataFrame = {
    require(k > 0, "k must be positive")
    require(nlist > 0 && nlist <= 256, "nlist in (0, 256]")
    val base = corpus
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("vec"))
      .filter(dot(col("vec"), col("vec")) > lit(0.0))
    // gate form: centroids = the nlist smallest-md5-draw corpus rows
    // (engine-replayable); production form: a caller-supplied trained
    // model (lloydCentroids — the semanticDedupPairs convention)
    val cents: Seq[Seq[Double]] = centroids.getOrElse(base
      .select(col("vec"),
        conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("__r"))
      .orderBy(col("__r").asc, col("vec_id").asc).limit(nlist)
      .select("vec").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq)
    require(cents.nonEmpty, "corpus has no non-zero vectors to sample from")
    val quota = (k + cents.size - 1) / cents.size
    // argmax cosine over the literal centroid matrix; the struct-greatest
    // tie-break is on negated cid, so ties go to the SMALLEST cluster id
    // (replayed as ORDER BY cos DESC, cid ASC in the oracle). Centroid
    // norms are driver-side constants off the same left-fold sum-of-
    // squares chain as sqrt(list_dot_product(c, c)).
    val sims = cents.zipWithIndex.map { case (c, i) =>
      struct(
        (dot(col("vec"), typedLit(c)) /
          (col("__norm") * lit(math.sqrt(c.map(x => x * x).sum)))).as("cos"),
        lit(-i).as("negcid"))
    }
    // Spark's greatest() wants ≥2 args; a 1-centroid corpus degenerates
    // to "everything is cluster 0"
    val best = if (sims.size == 1) sims.head else greatest(sims: _*)
    val wc = Window.partitionBy("cluster_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    val wp = Window.orderBy(col("cluster_rank").asc, col("cluster_id").asc)
    base.withColumn("__norm", l2norm(col("vec")))
      .withColumn("__best", best)
      .select(col("vec_id"),
        (-col("__best").getField("negcid")).as("cluster_id"),
        col("__best").getField("cos").as("cos"))
      .withColumn("cluster_rank", row_number().over(wc))
      .filter(col("cluster_rank") <= quota)
      .withColumn("pick_order", row_number().over(wp))
      .filter(col("pick_order") <= k)
      .select("pick_order", "vec_id", "cluster_id", "cluster_rank", "cos")
  }
}
