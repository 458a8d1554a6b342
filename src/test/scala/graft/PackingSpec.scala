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


  test("packBestFit: textbook win over greedy — perfect packing where greedy wastes a bin") {
    // sizes 6,5,4,3,2 in id order, budget 10: greedy scans in id order
    // (6 | 5,4 | 3,2 = 3 bins); BFD takes them largest-first and places
    // each in the fullest bin with room (6+4, 5+3+2 = 2 FULL bins)
    val docs = Seq((1L, 6L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 2L)).toDF("doc_id", "tok")
    import org.apache.spark.sql.functions.lit
    val greedy = Packing.packSequences(docs, "doc_id", "tok", budget = 10,
      shards = 1, shardOn = Some(lit(0)))
      .as[(Long, Long, Int, Long)].collect()
    val bfd = Packing.packBestFit(docs, "doc_id", "tok", budget = 10,
      shards = 1, shardOn = Some(lit(0)))
      .as[(Long, Long, Int, Long)].collect()
    assert(greedy.map(_._4).distinct.length === 3)
    assert(bfd.map(_._4).distinct.length === 2)
    // and the BFD bins are exactly full
    val loads = bfd.groupBy(_._4).map { case (_, g) => g.map(_._2).sum }
    assert(loads.forall(_ === 10L))
    // the assignment itself: largest-first creation order → 6 opens seq 0,
    // 5 opens seq 1, 4 best-fits seq 0, 3 then 2 best-fit seq 1
    val bySeq = bfd.map(p => p._1 -> p._4).toMap
    assert(bySeq === Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
  }

  test("packBestFit: fullest-bin rule and smallest-seq tie-break") {
    // budget 8, sizes 5,5,3: the 3 fits BOTH open bins (load 5 each) —
    // the tie goes to the smaller seq_id
    val docs = Seq((1L, 5L), (2L, 5L), (3L, 3L)).toDF("doc_id", "tok")
    import org.apache.spark.sql.functions.lit
    val bySeq = Packing.packBestFit(docs, "doc_id", "tok", budget = 8,
      shards = 1, shardOn = Some(lit(0)))
      .as[(Long, Long, Int, Long)].collect().map(p => p._1 -> p._4).toMap
    assert(bySeq(3L) === bySeq(1L))
    assert(bySeq(1L) !== bySeq(2L))
    // fullest-first fill: the first 2 tops up the open 6 exactly, the
    // second 2 must open a new bin (not squeeze into the full one)
    val docs2 = Seq((1L, 6L), (2L, 2L), (3L, 2L)).toDF("doc_id", "tok")
    val bySeq2 = Packing.packBestFit(docs2, "doc_id", "tok", budget = 8,
      shards = 1, shardOn = Some(lit(0)))
      .as[(Long, Long, Int, Long)].collect().map(p => p._1 -> p._4).toMap
    // largest-first order: 6 (seq 0), then 2 best-fits the 6 (seq 0 full),
    // then 2 opens seq 1
    assert(bySeq2 === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("packBestFit: conservation, budget bound, determinism under repartitioning") {
    val rnd = new scala.util.Random(11)
    val docs = (1 to 2000).map(i => (i.toLong, 1L + rnd.nextInt(500))).toDF("doc_id", "tok")
    def run(parts: Int) = Packing.packBestFit(docs.repartition(parts), "doc_id", "tok",
      budget = 2048, shards = 8).as[(Long, Long, Int, Long)].collect()
    val packed = run(3)
    assert(packed.length === 2000)
    assert(packed.map(_._1).distinct.length === 2000)
    val bySeq = packed.groupBy(p => (p._3, p._4)).map { case (_, g) => g.map(_._2).sum }
    assert(bySeq.forall(_ <= 2048), s"over-budget sequence: ${bySeq.max}")
    assert(packed.sortBy(_._1) === run(9).sortBy(_._1), "layout-independent")
    // bin count within the pigeonhole lower bound per shard — NOT a
    // BFD-beats-greedy assertion: best-fit-DECREASING is not pointwise
    // better than the id-order scan on every input (sizes 6,5,4,6,5,4,
    // 5,4,4 at budget 15: greedy 15|15|13 = 3 bins, BFD [6,6][5,5,5]
    // [4,4,4][4] = 4), so a cross-packer inequality here would fail
    // spuriously on an unlucky seed; the crafted textbook-win case
    // above pins the superiority claim on a chosen input instead
    val byShard = packed.groupBy(_._3)
    byShard.foreach { case (shard, g) =>
      val bins = g.map(_._4).distinct.length
      val lower = (g.map(_._2).sum + 2047) / 2048
      assert(bins >= lower && bins <= g.length,
        s"shard $shard: $bins bins outside [$lower, ${g.length}]")
    }
  }

  test("packBestFit: oversized doc opens its own sequence (overflow contract)") {
    import org.apache.spark.sql.functions.lit
    val docs = Seq((1L, 10L), (2L, 99999L), (3L, 10L)).toDF("doc_id", "tok")
    val packed = Packing.packBestFit(docs, "doc_id", "tok", budget = 100,
      shards = 1, shardOn = Some(lit(0)))
      .as[(Long, Long, Int, Long)].collect().map(p => p._1 -> p._4).toMap
    val seqOf2 = packed(2L)
    assert(packed.count { case (_, s) => s == seqOf2 } === 1)
    // the two small docs share the other sequence
    assert(packed(1L) === packed(3L))
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

  test("perDocOverhead: separator slots charged to the budget") {
    // 5 docs of 100 tokens, budget 302: bare packing fits 3 per sequence
    // (300 ≤ 302); with overhead 1 each doc costs 101, so only 2 fit
    // (202 ≤ 302 but 303 > 302)
    val docs = (1 to 5).map(i => (i.toLong, 100L)).toDF("doc_id", "tok")
    val bare = Packing.packSequences(docs, "doc_id", "tok",
        budget = 302, shards = 1)
      .as[(Long, Long, Int, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(bare.values.toSeq.sorted === Seq(0L, 0L, 0L, 1L, 1L))
    val eos = Packing.packSequences(docs, "doc_id", "tok",
        budget = 302, shards = 1, perDocOverhead = 1L)
      .as[(Long, Long, Int, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(eos.values.toSeq.sorted === Seq(0L, 0L, 1L, 1L, 2L))
  }

  test("eos stream: one separator per doc, conservation counts it") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val eosId = 999L
    val docs = Seq(
      (1L, Seq(10L, 11L, 12L)), (2L, Seq(20L)), (3L, Seq(30L, 31L)),
      (4L, Seq(40L, 41L, 42L, 43L))).toDF("doc_id", "ids")
    val withIds = docs.withColumn("n_tokens", size(col("ids")).cast("long"))
    val assigned = Packing.packSequences(
      withIds.select("doc_id", "n_tokens"), "doc_id", "n_tokens",
      budget = 6, shards = 1, perDocOverhead = 1L)
    val w = Window.partitionBy("shard", "seq_id").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val stream = assigned
      .withColumn("offset",
        coalesce(sum(col("n_tokens") + lit(1L)).over(w), lit(0L)))
      .join(withIds.select(col("doc_id").as("id"), col("ids")), Seq("id"))
      .select(col("shard"), col("seq_id"), col("offset"),
        posexplode(concat(col("ids"), array(lit(eosId)))))
      .select(col("shard"), col("seq_id"),
        (col("offset") + col("pos")).as("pos"), col("col").as("token_id"))
      .as[(Int, Long, Long, Long)].collect()
    // conservation: every content token + exactly one EOS per doc
    assert(stream.length === (3 + 1) + (1 + 1) + (2 + 1) + (4 + 1))
    assert(stream.count(_._4 == eosId) === 4, "one separator per doc")
    // contiguity per sequence, and every doc's token run ends in EOS
    stream.groupBy(t => (t._1, t._2)).foreach { case ((sh, sq), rows) =>
      val ordered = rows.sortBy(_._3)
      assert(ordered.map(_._3) === ordered.indices.map(_.toLong),
        s"($sh,$sq): positions not contiguous")
      assert(ordered.map(_._3).length <= 6, s"($sh,$sq): over budget")
      assert(ordered.last._4 === eosId, s"($sh,$sq): sequence must end in EOS")
    }
    // budget: docs 1(3)+2(1) pack as 3+1+1+1 = 6; doc 3(2) next seq with
    // nothing else (2+1 + 4+1 = 8 > 6); doc 4(4) alone
    val seqOf = assigned.as[(Long, Long, Int, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(seqOf(1L) === seqOf(2L), "docs 1+2 share a sequence")
    assert(seqOf(3L) !== seqOf(2L))
    assert(seqOf(4L) !== seqOf(3L))
  }

  test("eos stream roundtrip: split-on-separator recovers every doc's exact ids") {
    // the consumer-side inverse (the packed_stream_roundtrip gate's
    // reconstruction, on synthetic ids): cut the stream at EOS, and each
    // segment must be one doc's exact token sequence — including an
    // OVERSIZED doc (7 > budget 6), which overflows its own sequence but
    // must still round-trip intact
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val eosId = 999L
    val docs = Seq(
      (1L, Seq(10L, 11L, 12L)), (2L, Seq(20L)), (3L, Seq(30L, 31L)),
      (4L, (0 until 7).map(i => 40L + i))).toDF("doc_id", "ids")
    val withIds = docs.withColumn("n_tokens", size(col("ids")).cast("long"))
    val assigned = Packing.packSequences(
      withIds.select("doc_id", "n_tokens"), "doc_id", "n_tokens",
      budget = 6, shards = 1, perDocOverhead = 1L)
    val w = Window.partitionBy("shard", "seq_id").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val stream = assigned
      .withColumn("offset",
        coalesce(sum(col("n_tokens") + lit(1L)).over(w), lit(0L)))
      .join(withIds.select(col("doc_id").as("id"), col("ids")), Seq("id"))
      .select(col("shard"), col("seq_id"), col("offset"),
        posexplode(concat(col("ids"), array(lit(eosId)))))
      .select(col("shard"), col("seq_id"),
        (col("offset") + col("pos")).as("pos"), col("col").as("token_id"))
    // reconstruction: separators-seen-before window, drop EOS, regroup
    val wSeen = Window.partitionBy("shard", "seq_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val segs = stream
      .withColumn("seg_idx",
        coalesce(sum(when(col("token_id") === eosId, 1L)).over(wSeen),
          lit(0L)) + 1L)
      .filter(col("token_id") =!= eosId)
      .groupBy("shard", "seq_id", "seg_idx")
      .agg(sort_array(collect_list(struct(col("pos"), col("token_id"))))
        .as("pt"))
      .select(col("seq_id"), col("seg_idx"),
        expr("transform(pt, p -> p.token_id)").as("ids"))
      .as[(Long, Long, Seq[Long])].collect()
    // every doc's exact sequence comes back, each as one segment
    val expected = Set(Seq(10L, 11L, 12L), Seq(20L), Seq(30L, 31L),
      (0 until 7).map(i => 40L + i).toSeq)
    assert(segs.map(_._3.toSeq).toSet === expected)
    assert(segs.length === 4, "one segment per doc, no phantom segments")
    // segment order within a sequence follows doc-id order
    segs.groupBy(_._1).foreach { case (_, g) =>
      assert(g.sortBy(_._2).map(_._2) === (1L to g.length))
    }
  }

  test("roundtrip consumer plans ONE shuffle: window and regroup share the partitioning") {
    // the scale guard for the packed_stream_roundtrip read side: the
    // separators-seen window partitions by (shard, seq_id) and the
    // segment regroup keys by (shard, seq_id, seg_idx) — the aggregate
    // must reuse the window's exchange, not add a second corpus shuffle
    val df = SparkEntry.queries("packed_stream_roundtrip")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"segment rebuild should reuse one partitioning:\n$plan")
  }
}
