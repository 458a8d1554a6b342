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

  test("packSequences: shardOn override routes by the caller's expression") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 40L).map(i => (i, 10L)).toDF("doc_id", "tok")
    val packed = Packing.packSequences(docs, "doc_id", "tok",
      budget = 30, shards = 4, shardOn = Some(col("doc_id") % 4))
      .as[(Long, Long, Int, Long)].collect()
    packed.foreach { case (id, _, shard, _) =>
      assert(shard === (id % 4).toInt, s"doc $id routed to $shard")
    }
    // ...and packing stays correct under the override: 10-token docs in a
    // 30 budget → each sequence holds exactly 3 of the shard's 10 docs
    val bySeq = packed.groupBy(p => (p._3, p._4)).view.mapValues(_.length)
    assert(bySeq.values.forall(n => n == 3 || n == 1))
  }

  test("packed token stream composition: conservation, contiguity, budget") {
    import org.apache.spark.sql.functions._
    // mirrors the packed_token_stream query on a small synthetic corpus:
    // stream length == Σ encode lengths, per-sequence positions are
    // 0..n-1, and no sequence exceeds the budget
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 60L)
      .map(i => (i, ("tok " * (1 + (i % 9).toInt)).trim)).toDF("doc_id", "text")
    val merges = Seq(("74", "6f"), ("746f", "6b"))
    val withIds = docs
      .select(col("doc_id"), graft.functions.Bpe.encodeCol(col("text"), merges).as("ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .filter(col("n_tokens") > 0)
    val assigned = Packing.packSequences(
      withIds.select("doc_id", "n_tokens"), "doc_id", "n_tokens",
      budget = 16, shards = 2,
      shardOn = Some(col("doc_id") % 2))
    val w = Window.partitionBy("shard", "seq_id").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val stream = assigned
      .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .join(withIds.select(col("doc_id").as("id"), col("ids")), Seq("id"))
      .select(col("shard"), col("seq_id"), col("offset"), posexplode(col("ids")))
      .select(col("shard"), col("seq_id"),
        (col("offset") + col("pos")).as("pos"), col("col").as("token_id"))
      .as[(Int, Long, Long, Long)].collect()
    val totalIds = withIds.agg(sum("n_tokens")).as[Long].collect().head
    assert(stream.length.toLong === totalIds, "token conservation across the chain")
    stream.groupBy(t => (t._1, t._2)).foreach { case ((sh, sq), rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.head === 0L && ps.last === ps.length - 1L &&
        ps.distinct.length == ps.length,
        s"($sh,$sq): positions not contiguous 0..n-1")
      assert(ps.length <= 16, s"($sh,$sq): sequence over budget")
    }
  }
}
