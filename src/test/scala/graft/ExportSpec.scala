package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sink

class ExportSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"doc $i body with some words " + ("x " * (i % 5))))
      .toDF("doc_id", "text")

  private def shardDirs(path: String): Seq[File] =
    new File(path).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))

  private def dataFiles(dir: File): Seq[File] =
    dir.listFiles().toSeq.filter(f => f.getName.endsWith(".parquet"))

  test("one file per shard; directory placement matches shardAssign") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_shards_a"
    Sink.reset(path)
    Sink.exportShards(spark, corpus(400), path, 8, "doc_id", "text").collect()
    val dirs = shardDirs(path)
    assert(dirs.size === 8)
    dirs.foreach { d =>
      assert(dataFiles(d).size === 1,
        s"${d.getName}: every shard must be written by exactly one task")
      val shard = d.getName.stripPrefix("shard=").toLong
      val misplaced = spark.read.parquet(d.getPath)
        .filter(Sink.shardAssign(col("doc_id"), 8) =!= shard).count()
      assert(misplaced === 0L)
    }
  }

  test("within-shard row order is the md5 draw order — the deterministic shuffle") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_shards_b"
    Sink.reset(path)
    val docs = corpus(300)
    Sink.exportShards(spark, docs, path, 4, "doc_id", "text").collect()
    shardDirs(path).foreach { d =>
      val file = dataFiles(d).head
      // one small file = one input split = one partition: collect()
      // preserves the written row order
      val written = spark.read.parquet(file.getPath)
        .select("doc_id").as[Long].collect()
      val expected = docs
        .filter(Sink.shardAssign(col("doc_id"), 4) === d.getName.stripPrefix("shard=").toLong)
        .orderBy(md5(col("doc_id").cast("string")))
        .select("doc_id").as[Long].collect()
      assert(written.toSeq === expected.toSeq, s"${d.getName}: order not the md5 draw")
    }
  }

  test("re-export is a no-op: identical manifest, nothing moves") {
    val p1 = s"${sys.props("java.io.tmpdir")}/graft_test_shards_c1"
    val p2 = s"${sys.props("java.io.tmpdir")}/graft_test_shards_c2"
    Sink.reset(p1); Sink.reset(p2)
    val docs = corpus(250)
    val m1 = Sink.exportShards(spark, docs, p1, 8, "doc_id", "text")
      .orderBy("shard").collect().map(_.toSeq)
    val m2 = Sink.exportShards(spark, docs.repartition(13), p2, 8, "doc_id", "text")
      .orderBy("shard").collect().map(_.toSeq)
    assert(m1.toSeq === m2.toSeq)
  }

  test("manifest equals a direct source recomputation (roundtrip fidelity)") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_shards_d"
    Sink.reset(path)
    val docs = corpus(350)
    val manifest = Sink.exportShards(spark, docs, path, 8, "doc_id", "text")
      .orderBy("shard").collect().map(_.toSeq)
    val direct = docs
      .groupBy(Sink.shardAssign(col("doc_id"), 8).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(filter(split(col("text"), "\\s+"), w => w =!= "")))
          .cast("long").as("n_tokens"),
        sum(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 1000000007L).as("checksum"))
      .orderBy("shard").collect().map(_.toSeq)
    assert(manifest.toSeq === direct.toSeq)
  }

  test("exportTokenStream: one file per shard, rows in stream order, manifest pins positions") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_tokstream"
    Sink.reset(path)
    // 3 shards, 2 sequences each, deterministic token ids
    val stream = (for {
      shard <- 0L until 3L; seq <- 0L until 2L; pos <- 0L until 20L
    } yield (shard, seq, pos, ((shard * 7 + seq * 3 + pos) % 270).toInt))
      .toDF("shard", "seq_id", "pos", "token_id")
    val manifest = Sink.exportTokenStream(spark, stream.repartition(11), path)
      .orderBy("shard").collect()
    assert(shardDirs(path).size === 3)
    shardDirs(path).foreach { d =>
      assert(dataFiles(d).size === 1,
        s"${d.getName}: one memory-mappable file per shard")
      // one small file = one split: collect preserves written order,
      // which must be the (seq_id, pos) stream order
      val rows = spark.read.parquet(dataFiles(d).head.getPath)
        .select("seq_id", "pos").as[(Long, Long)].collect().toSeq
      assert(rows === rows.sortBy(identity),
        s"${d.getName}: rows not in stream order")
    }
    manifest.foreach { r =>
      val shard = r.getLong(0)
      assert(r.getLong(1) === 2L && r.getLong(2) === 40L)
      val want = (for (seq <- 0L until 2L; pos <- 0L until 20L)
        yield (pos + 1) * ((shard * 7 + seq * 3 + pos) % 270) % 1000000007L).sum
      assert(r.getLong(3) === want, s"shard $shard checksum")
    }
    // the checksum is position-sensitive: swapping two distinct tokens flips it
    val swapped = stream.withColumn("token_id",
      when(col("shard") === 0L && col("seq_id") === 0L && col("pos") === 0L,
        lit(99)).otherwise(col("token_id")))
    Sink.reset(path)
    val m2 = Sink.exportTokenStream(spark, swapped, path)
      .filter(col("shard") === 0L).collect().head
    assert(m2.getLong(3) !== manifest.head.getLong(3))
  }

  test("exportTokenStream segments: seg_id lands, manifest pins document boundaries") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_tokstream_segs"
    Sink.reset(path)
    // one shard, one sequence: two documents of 3 tokens + EOS each —
    // seg boundaries at the EOS rows (id 272 at pos 3 and 7)
    val rows = Seq(
      (0L, 0L, 0L, 10, 1L), (0L, 0L, 1L, 11, 1L), (0L, 0L, 2L, 12, 1L),
      (0L, 0L, 3L, 272, 1L),
      (0L, 0L, 4L, 20, 2L), (0L, 0L, 5L, 21, 2L), (0L, 0L, 6L, 22, 2L),
      (0L, 0L, 7L, 272, 2L))
    val stream = rows.toDF("shard", "seq_id", "pos", "token_id", "seg_id")
    val m = Sink.exportTokenStream(spark, stream.repartition(5), path).collect().head
    // extended manifest: (shard, n_seqs, n_tokens, checksum, n_segments,
    // seg_checksum)
    assert(m.length === 6)
    assert(m.getLong(4) === 2L, "two segments in the sequence")
    val wantSeg = rows.map { case (_, _, pos, _, seg) =>
      (pos + 1) * seg % 1000000007L }.sum
    assert(m.getLong(5) === wantSeg, "segment checksum")
    // the landed stream carries seg_id, and the CONSUMER property holds:
    // seg_id == 1 + EOS separators seen strictly before the position —
    // exactly what a loader derives when it cuts at EOS, so an attention
    // mask built from seg_id masks the same boundaries the stream encodes
    val landed = spark.read.parquet(path)
      .select("seq_id", "pos", "token_id", "seg_id")
      .as[(Long, Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    var eosSeen = 0L
    landed.foreach { case (_, _, tok, seg) =>
      assert(seg === eosSeen + 1, s"seg_id at pos with $eosSeen EOS seen")
      if (tok == 272) eosSeen += 1
    }
    // moving a boundary (shrinking doc 1 by one token into doc 2) keeps
    // every token but flips the segment checksum
    val shifted = stream.withColumn("seg_id",
      when(col("pos") === 2L, lit(2L)).otherwise(col("seg_id")))
    Sink.reset(path)
    val m3 = Sink.exportTokenStream(spark, shifted, path).collect().head
    assert(m3.getLong(5) !== m.getLong(5))
    assert(m3.getLong(3) === m.getLong(3), "token checksum unchanged")
  }

  test("packedStreamEosSegs: seg boundaries coincide with EOS cuts on the real chain") {
    // the full chain property on actual corpus docs: for every (shard,
    // seq), each token's seg_id equals 1 + EOS separators strictly
    // before it, and segments are contiguous doc spans
    val segs = EntryOps.packedStreamEosSegs(spark, "/root/testdata/sf0.001")
      .orderBy("shard", "seq_id", "pos")
      .select("shard", "seq_id", "pos", "token_id", "seg_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(segs.nonEmpty)
    segs.groupBy(r => (r._1, r._2)).foreach { case ((sh, sq), rows) =>
      var eosSeen = 0L
      rows.sortBy(_._3).foreach { case (_, _, pos, tok, seg) =>
        assert(seg === eosSeen + 1, s"shard=$sh seq=$sq pos=$pos")
        if (tok == 272) eosSeen += 1
      }
      assert(eosSeen === rows.map(_._5).max,
        "every segment closed by its EOS")
    }
  }
}
