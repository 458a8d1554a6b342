package graft.functions

/** Shared per-thread word→ids memo plumbing for the tokenizer kernels
  * (BPE-family encode loops): memos are keyed to the MODEL LITERAL they
  * were computed under (identity — two models sharing one plan, the
  * decode(encode(x)) shape, must not serve each other's ids; value
  * hashing would cost O(vocab) per row).
  *
  * Eviction rule (r19, after two earlier iterations): at the cap, evict
  * an arbitrary resident that is NOT one of the two most-recently-used
  * models. Both failure modes this protects against are real:
  *   - alternating literals IN ONE PLAN (decode(encode(x))): a blind
  *     arbitrary eviction can hit the executing plan's own hot memo and
  *     re-evict it every row, each rebuild allocating the 2^14-slot map
  *     — the MRU-2 shield keeps both of an alternating pair resident;
  *   - fresh identities PER TASK (tasks deserialize their binaries, so a
  *     literal's object identity does not survive a task boundary): a
  *     decline-to-cache rule (the r18-advice form, tried and reverted)
  *     filled the cap with 8 DEAD identities from finished tasks and
  *     then never cached again for the thread's life — every later task
  *     lost cross-row memoization entirely. Eviction keeps turnover.
  * One definition serves both [[Unigram]] and [[WordPiece]] so the cap
  * and eviction rule cannot drift apart.
  *
  * Accepted lifetime tradeoff (r19 advice, reviewed): mru1/mru2 hold
  * strong refs to the last two model literals even after their tasks
  * finish, so a thread can pin up to TWO dead models' memos until newer
  * models displace them — bounded at 2 × O(2^14) entries per executor
  * thread by construction. Clearing from a task-completion listener was
  * considered and rejected: the listener would also kill the
  * alternating-pair shield mid-plan, re-opening the per-row rebuild
  * failure this design exists to stop. Revisit only if executor heap
  * profiles ever show these maps mattering. */
private[functions] object TokenizerMemo {

  /** Max distinct model literals memoized per thread — deliberately its
    * own constant (the parse caches bound O(vocab) entries; word memos
    * bound O(2^17 words) each, so the two caps must be tunable apart). */
  val ModelCap = 8

  /** Per-thread memo state: the identity-keyed map plus the two
    * most-recently-used model refs (the eviction shield). */
  final class Memo {
    val cache = new java.util.IdentityHashMap[
      AnyRef, java.util.HashMap[String, Array[Long]]]
    var mru1: AnyRef = null
    var mru2: AnyRef = null
  }

  def forModel(memo: Memo, model: AnyRef): java.util.HashMap[String, Array[Long]] = {
    if (memo.mru1 ne model) { memo.mru2 = memo.mru1; memo.mru1 = model }
    val hit = memo.cache.get(model)
    if (hit != null) hit
    else {
      if (memo.cache.size >= ModelCap) {
        // evict any resident except the MRU-2 shield (cap 8 >> 2, so a
        // victim always exists); with per-task fresh identities this is
        // how dead entries cycle out
        val it = memo.cache.keySet().iterator()
        var victim: AnyRef = null
        while (victim == null && it.hasNext) {
          val k = it.next()
          if ((k ne memo.mru1) && (k ne memo.mru2)) victim = k
        }
        if (victim != null) memo.cache.remove(victim)
      }
      val fresh = new java.util.HashMap[String, Array[Long]](1 << 14)
      memo.cache.put(model, fresh)
      fresh
    }
  }
}
