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
}
