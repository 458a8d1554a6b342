package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello multimodal world"),
    (2L, "tiny"),
    (3L, "a third payload with more bytes in it")
  ).toDF("doc_id", "text")

  test("asMultimodal: binary payload + typed metadata struct") {
    val mm = Multimodal.asMultimodal(docs, "doc_id", "text")
    val schema = mm.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val r = mm.filter(col("asset_id") === 1L)
      .select(col("meta.mime"), col("meta.n_bytes"), length(col("payload")))
      .as[(String, Int, Int)].collect()(0)
    assert(r === (("image/png", 22, 22)))
  }

  test("extractFeatures: deterministic fixed-dim vectors, batched flow") {
    val mm = Multimodal.asMultimodal(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(mm, dim = 16, batchSize = 2).collect()
      .map(a => a.asset_id -> a).toMap
    assert(f1.keySet === Set(1L, 2L, 3L))
    assert(f1.values.forall(_.features.length === 16))
    assert(f1(2L).n_bytes === 4)
    // determinism: a second run yields bit-identical features
    val f2 = Multimodal.extractFeatures(mm, dim = 16, batchSize = 64).collect()
      .map(a => a.asset_id -> a).toMap
    assert(f1(3L).features.toSeq === f2(3L).features.toSeq)
  }

  test("sampleFrames: deterministic per-frame byte offsets") {
    val mm = Multimodal.asMultimodal(docs.filter(col("doc_id") === 2L), "doc_id", "text")
    val got = Multimodal.sampleFrames(mm, nFrames = 4)
      .select("frame_index", "byte_offset").as[(Int, Long)].collect().sorted
    assert(got === Array((0, 0L), (1, 1L), (2, 2L), (3, 3L)))
  }

  test("resizePlan: aspect-preserving fit, never upscaling") {
    import org.apache.spark.sql.functions._
    val mm = Seq(
      (1L, 1000, 500),  // wide: limited by width → 512x256
      (2L, 200, 800),   // tall: limited by height → 128x512
      (3L, 100, 100)    // already fits → untouched
    ).toDF("asset_id", "w", "h")
      .select(col("asset_id"), lit(Array[Byte]()).as("payload"),
        struct(lit("image/png").as("mime"), col("w").as("width"),
          col("h").as("height"), lit(0L).as("n_bytes")).as("meta"))
    val got = Multimodal.resizePlan(mm, maxW = 512, maxH = 512)
      .select("asset_id", "dst_width", "dst_height")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(got === Array((1L, 512, 256), (2L, 128, 512), (3L, 100, 100)))
  }
}
