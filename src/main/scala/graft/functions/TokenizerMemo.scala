package graft.functions

/** Shared per-thread word→ids memo plumbing for the tokenizer kernels
  * (BPE-family encode loops): memos are keyed to the MODEL LITERAL they
  * were computed under (identity — two models sharing one plan, the
  * decode(encode(x)) shape, must not serve each other's ids), and the
  * model-count cap evicts ONE resident entry rather than clearing the
  * map — clearing re-created the per-switch allocation thrash the
  * identity map was built to fix. The evicted entry is ARBITRARY
  * (IdentityHashMap has no access order, so this is not LRU): under
  * `ModelCap`+1 models alternating row-by-row the evicted memo may be
  * immediately re-needed, which costs a rebuild of that one memo — a
  * bounded slowdown, never a wrong result. One definition serves both
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
    else {
      val fresh = new java.util.HashMap[String, Array[Long]](1 << 14)
      if (cache.size >= ModelCap) {
        val it = cache.keySet().iterator()
        it.next(); it.remove()
      }
      cache.put(model, fresh)
      fresh
    }
  }
}
