package graft

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

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

  test("asMultimodal: payload is a real decodable PNG; meta matches the pixels") {
    val mm = Multimodal.asMultimodal(docs, "doc_id", "text")
    val schema = mm.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val rows = mm.select(col("asset_id"), col("payload"),
        col("meta.mime"), col("meta.width"), col("meta.height"), col("meta.n_bytes"))
      .as[(Long, Array[Byte], String, Int, Int, Int)].collect()
    assert(rows.length === 3)
    rows.foreach { case (id, payload, mime, w, h, nBytes) =>
      assert(mime === "image/png")
      assert(nBytes === payload.length, s"asset $id: n_bytes must be the PNG length")
      // PNG magic bytes — this is a real container, not labeled text
      assert((payload(0) & 0xff) === 0x89 && payload(1) === 'P'.toByte)
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      assert(img != null, s"asset $id: ImageIO must decode the payload")
      assert(img.getWidth === w && img.getHeight === h,
        s"asset $id: claimed dims must equal decoded dims")
    }
  }

  test("extractFeatures: real decode — dims/bands from pixels, deterministic, batched") {
    val mm = Multimodal.asMultimodal(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(mm, dim = 16, batchSize = 2).collect()
      .map(a => a.asset_id -> a).toMap
    assert(f1.keySet === Set(1L, 2L, 3L))
    assert(f1.values.forall(_.features.length === 16))
    val claimed = mm.select(col("asset_id"), col("meta.width"), col("meta.height"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    f1.values.foreach { a =>
      assert((a.decoded_width, a.decoded_height) === claimed(a.asset_id))
      assert(a.channels === 3, "rendered PNGs are 3-band RGB")
      // feature layout: [0]=w, [1]=h, [2]=bands, histogram tail sums to 1
      assert(a.features(0) === a.decoded_width.toFloat)
      assert(a.features(1) === a.decoded_height.toFloat)
      assert(a.features(2) === 3.0f)
      assert(math.abs(a.features.drop(8).sum - 1.0f) < 1e-3,
        "luminance histogram fractions must sum to ~1")
      assert(a.features(6) <= a.features(7), "min luma <= max luma")
    }
    // determinism: a second run with different batching is bit-identical
    val f2 = Multimodal.extractFeatures(mm, dim = 16, batchSize = 64).collect()
      .map(a => a.asset_id -> a).toMap
    assert(f1(3L).features.toSeq === f2(3L).features.toSeq)
  }

  test("extractFeatures: an undecodable payload fails loudly") {
    val bad = Seq((7L, Array[Byte](1, 2, 3))).toDF("asset_id", "payload")
    val ex = intercept[Exception] {
      Multimodal.extractFeatures(bad).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("undecodable")), s"got: ${messages(ex)}")
  }

  test("asByteStream + sampleFrames: deterministic per-frame byte offsets") {
    val mm = Multimodal.asByteStream(docs.filter(col("doc_id") === 2L), "doc_id", "text")
    val got = Multimodal.sampleFrames(mm, nFrames = 4)
      .select("frame_index", "byte_offset").as[(Int, Long)].collect().sorted
    // "tiny" = 4 bytes → offsets 0,1,2,3
    assert(got === Array((0, 0L), (1, 1L), (2, 2L), (3, 3L)))
  }

  test("resizePlan: aspect-preserving fit, never upscaling") {
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
