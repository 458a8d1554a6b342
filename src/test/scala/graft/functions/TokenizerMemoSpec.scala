package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The tokenizer word-memo eviction contract (r19, after the
  * decline-to-cache form measured wrong): MRU-2-shielded eviction must
  * keep an alternating model pair resident across arbitrarily many
  * switches AND cycle dead identities out so fresh per-task literals
  * still get cached once the cap has ever filled. */
class TokenizerMemoSpec extends AnyFunSuite {

  private def freshModels(n: Int): IndexedSeq[AnyRef] =
    IndexedSeq.fill(n)(new Object)

  test("resident models hit: same identity returns the same memo") {
    val memo = new TokenizerMemo.Memo
    val m = new Object
    val first = TokenizerMemo.forModel(memo, m)
    first.put("w", Array(1L))
    assert(TokenizerMemo.forModel(memo, m) eq first)
  }

  test("a strictly alternating pair stays resident once seated — even at a full cap") {
    val memo = new TokenizerMemo.Memo
    // fill the cap with dead literals first, so every later insertion
    // must evict
    freshModels(TokenizerMemo.ModelCap).foreach(
      TokenizerMemo.forModel(memo, _): Unit)
    // the decode(encode(x)) row pattern: two models alternating with no
    // third literal in between — the MRU-2 shield's exact contract. The
    // first two calls may evict dead entries to seat a and b; from then
    // on both must hit the same memo on every row.
    val a = new Object
    val b = new Object
    val memoA = TokenizerMemo.forModel(memo, a)
    val memoB = TokenizerMemo.forModel(memo, b)
    (1 to 50).foreach { _ =>
      assert(TokenizerMemo.forModel(memo, a) eq memoA)
      assert(TokenizerMemo.forModel(memo, b) eq memoB)
    }
    assert(memo.cache.size <= TokenizerMemo.ModelCap)
  }

  test("dead identities cycle out: fresh literals still get cached past the cap") {
    val memo = new TokenizerMemo.Memo
    // fill the cap with identities that are never used again (the
    // per-task-fresh-literal pattern that broke decline-to-cache)
    freshModels(TokenizerMemo.ModelCap).foreach(
      TokenizerMemo.forModel(memo, _): Unit)
    // a brand-new literal must be CACHED (same map back on re-ask), not
    // handed a throwaway scratch map
    val late = new Object
    val lateMemo = TokenizerMemo.forModel(memo, late)
    assert(TokenizerMemo.forModel(memo, late) eq lateMemo)
    // and the map never exceeds the cap
    assert(memo.cache.size <= TokenizerMemo.ModelCap)
  }

  test("the cap holds across heavy churn with an active hot model") {
    val memo = new TokenizerMemo.Memo
    val hot = new Object
    val hotMemo = TokenizerMemo.forModel(memo, hot)
    freshModels(100).foreach { other =>
      TokenizerMemo.forModel(memo, other): Unit
      assert(TokenizerMemo.forModel(memo, hot) eq hotMemo)
      assert(memo.cache.size <= TokenizerMemo.ModelCap)
    }
  }
}
