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
}
