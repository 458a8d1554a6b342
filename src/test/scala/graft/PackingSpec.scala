package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("packSequences: budget respected, all docs assigned, deterministic") {
    val rnd = new scala.util.Random(5)
    val docs = (1 to 2000).map(i => (i.toLong, 1L + rnd.nextInt(500))).toDF("doc_id", "tok")
    val packed = Packing.packSequences(docs, "doc_id", "tok", budget = 2048, shards = 8)
      .as[(Long, Long, Int, Long)].collect()
    assert(packed.length === 2000, "every doc must be assigned")
    assert(packed.map(_._1).distinct.length === 2000)
    // no sequence exceeds the budget (no oversized docs in this data)
    val bySeq = packed.groupBy(p => (p._3, p._4)).map { case (_, g) => g.map(_._2).sum }
    assert(bySeq.forall(_ <= 2048), s"over-budget sequence: ${bySeq.max}")
    // sequences are reasonably full (greedy on ~250-token docs: >60% fill)
    val fills = bySeq.toSeq.sorted
    assert(fills.sum.toDouble / (fills.length * 2048) > 0.6,
      f"poor packing efficiency: ${fills.sum.toDouble / (fills.length * 2048)}%.2f")
    // deterministic
    val again = Packing.packSequences(docs, "doc_id", "tok", budget = 2048, shards = 8)
      .as[(Long, Long, Int, Long)].collect()
    assert(packed.sortBy(_._1) === again.sortBy(_._1))
  }

  test("packSequences: oversized doc gets its own sequence; neighbors unaffected") {
    val docs = Seq((1L, 10L), (2L, 99999L), (3L, 10L)).toDF("doc_id", "tok")
    val packed = Packing.packSequences(docs, "doc_id", "tok", budget = 100, shards = 1)
      .as[(Long, Long, Int, Long)].collect().sortBy(_._1).map(p => p._1 -> p._4).toMap
    // the oversized doc is alone in its sequence
    val seqOf2 = packed(2L)
    assert(packed.count { case (_, s) => s == seqOf2 } === 1)
  }
}
