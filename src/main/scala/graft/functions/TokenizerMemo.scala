package graft.functions

/** Shared per-thread word→ids memo plumbing for the tokenizer kernels
  * (BPE-family encode loops): memos are keyed to the MODEL LITERAL they
  * were computed under (identity — two models sharing one plan, the
  * decode(encode(x)) shape, must not serve each other's ids), and the
  * model-count cap DECLINES TO CACHE overflow models rather than evict
  * a resident entry: IdentityHashMap has no access order, so eviction
  * picked an arbitrary victim — and under `ModelCap`+1 models
  * alternating row-by-row that victim could be the currently-executing
  * plan's own hot memo, re-evicted EVERY ROW (each rebuild allocating
  * the 2^14-slot map). Declining instead keeps the first ModelCap
  * residents hot forever and bills only the overflow literal, which
  * gets a small per-call scratch map (words still memoize within one
  * row's encode) — a bounded slowdown on the 9th+ simultaneous model
  * per thread, never a wrong result, never resident-memo thrash.
  * Clearing the whole map was rejected earlier for the same reason
  * (per-switch allocation thrash). One definition serves both
  * [[Unigram]] and [[WordPiece]] so the cap and eviction rule cannot
  * drift apart. */
private[functions] object TokenizerMemo {

  /** Max distinct model literals memoized per thread — deliberately its
    * own constant (the parse caches bound O(vocab) entries; word memos
    * bound O(2^17 words) each, so the two caps must be tunable apart). */
  val ModelCap = 8

  def forModel(
      cache: java.util.IdentityHashMap[AnyRef, java.util.HashMap[String, Array[Long]]],
      model: AnyRef): java.util.HashMap[String, Array[Long]] = {
    val hit = cache.get(model)
    if (hit != null) hit
    else if (cache.size >= ModelCap)
      // overflow literal: un-cached scratch map (see header) — small
      // initial capacity because it lives for one kernel call, not the
      // 2^14 slots a resident memo pre-sizes for
      new java.util.HashMap[String, Array[Long]](16)
    else {
      val fresh = new java.util.HashMap[String, Array[Long]](1 << 14)
      cache.put(model, fresh)
      fresh
    }
  }
}
