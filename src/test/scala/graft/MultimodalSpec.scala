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

  test("asAudio: payload is a real decodable RIFF/WAVE; meta matches the container") {
    val au = Multimodal.asAudio(docs, "doc_id", "text")
    val rows = au.select(col("asset_id"), col("payload"),
        col("meta.sample_rate"), col("meta.channels"), col("meta.n_frames"),
        col("meta.n_bytes"))
      .as[(Long, Array[Byte], Int, Int, Int, Int)].collect()
    assert(rows.length === 3)
    rows.foreach { case (id, payload, rate, channels, frames, nBytes) =>
      assert(new String(payload.slice(0, 4), "US-ASCII") === "RIFF")
      assert(new String(payload.slice(8, 12), "US-ASCII") === "WAVE")
      assert(nBytes === payload.length)
      assert(nBytes === 44 + 2 * channels * frames,
        s"asset $id: container size must be header + PCM data exactly")
      assert(channels === 1 + (id % 2).toInt)
      assert(Multimodal.SampleRates.contains(rate))
      // the JDK's own WAV parser must agree with the claim
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      assert(math.round(in.getFormat.getSampleRate) === rate)
      assert(in.getFormat.getChannels === channels)
      assert(in.getFormat.getSampleSizeInBits === 16)
      assert(in.getFrameLength.toInt === frames)
      in.close()
    }
  }

  test("extractAudioFeatures: real decode, per-channel stats, deterministic batching") {
    val au = Multimodal.asAudio(docs, "doc_id", "text")
    val f1 = Multimodal.extractAudioFeatures(au, batchSize = 2).collect()
      .map(a => a.asset_id -> a).toMap
    assert(f1.keySet === Set(1L, 2L, 3L))
    val claimed = au.select(col("asset_id"), col("meta.sample_rate"),
        col("meta.channels"), col("meta.n_frames"))
      .as[(Long, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    f1.values.foreach { a =>
      val (rate, ch, frames) = claimed(a.asset_id)
      assert(a.decoded_rate === rate && a.decoded_channels === ch &&
        a.decoded_frames === frames, "decoded params must equal the claim")
      assert(a.decoded_bits === 16)
      assert(a.duration_ms === frames.toLong * 1000L / rate)
      assert(a.features.length === ch * 4, "4 stat slots per channel")
      (0 until ch).foreach { c =>
        assert(a.features(c * 4) > 0f, "LCG PCM has nonzero RMS")
        assert(a.features(c * 4 + 1) <= 32768f, "peak bounded by 16-bit range")
        assert(a.features(c * 4 + 2) >= 0f && a.features(c * 4 + 2) <= 1f,
          "zero-crossing fraction is a fraction")
      }
    }
    val f2 = Multimodal.extractAudioFeatures(au, batchSize = 64).collect()
      .map(a => a.asset_id -> a).toMap
    assert(f1(3L).features.toSeq === f2(3L).features.toSeq)
  }

  test("extractAudioFeatures: stereo channels are de-interleaved, not mixed") {
    // hand-rolled stereo WAV: channel 0 constant +1000 (zero crossings = 0),
    // channel 1 alternating ±2000 (crossing every frame)
    val frames = 100
    val data = new Array[Byte](44 + 4 * frames)
    def le32(off: Int, v: Int): Unit = (0 until 4).foreach(i => data(off + i) = (v >>> (8 * i)).toByte)
    def le16(off: Int, v: Int): Unit = { data(off) = v.toByte; data(off + 1) = (v >>> 8).toByte }
    def tag(off: Int, s: String): Unit = (0 until 4).foreach(i => data(off + i) = s.charAt(i).toByte)
    tag(0, "RIFF"); le32(4, 36 + 4 * frames); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 2)
    le32(24, 8000); le32(28, 8000 * 4); le16(32, 4); le16(34, 16)
    tag(36, "data"); le32(40, 4 * frames)
    (0 until frames).foreach { f =>
      le16(44 + f * 4, 1000)
      le16(44 + f * 4 + 2, if (f % 2 == 0) 2000 else -2000)
    }
    val au = Seq((9L, data)).toDF("asset_id", "payload")
    val a = Multimodal.extractAudioFeatures(au).collect().head
    assert(a.decoded_channels === 2 && a.decoded_frames === frames)
    assert(a.features(0) === 1000f && a.features(1) === 1000f,
      "ch0: constant signal → rms == peak == 1000")
    assert(a.features(2) === 0f, "ch0: constant signal never crosses zero")
    assert(a.features(3) === 1000f, "ch0 mean")
    assert(a.features(4 + 1) === 2000f, "ch1 peak")
    assert(a.features(4 + 2) === 1f, "ch1: alternating sign crosses every frame")
    assert(math.abs(a.features(4 + 3)) <= 20f, "ch1 mean ~0 for alternating signal")
  }

  test("extractAudioFeatures: an undecodable payload fails loudly") {
    val bad = Seq((8L, "not a wav at all".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val ex = intercept[Exception] {
      Multimodal.extractAudioFeatures(bad).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("undecodable")), s"got: ${messages(ex)}")
  }

  test("asVideo: payload is a real multi-frame animated GIF; meta matches the container") {
    val vd = Multimodal.asVideo(docs, "doc_id", "text")
    val rows = vd.select(col("asset_id"), col("payload"),
        col("meta.mime"), col("meta.width"), col("meta.height"),
        col("meta.n_frames"), col("meta.frame_ms"), col("meta.n_bytes"))
      .as[(Long, Array[Byte], String, Int, Int, Int, Int, Int)].collect()
    assert(rows.length === 3)
    rows.foreach { case (id, payload, mime, w, h, nFrames, frameMs, nBytes) =>
      assert(mime === "image/gif")
      assert(nBytes === payload.length, s"asset $id: n_bytes must be the GIF length")
      // GIF89a magic — a real container, not labeled text
      assert(new String(payload.take(6), "US-ASCII") === "GIF89a")
      assert(w === 8 + (id % 24).toInt && h === 8 + ((id / 5) % 24).toInt,
        s"asset $id: claimed dims are id arithmetic")
      assert(nFrames >= 2 && nFrames <= 7)
      assert(frameMs === 40 * (1 + (id % 3).toInt))
      // an independent JDK parse agrees on the frame count
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(ImageIO.createImageInputStream(
        new ByteArrayInputStream(payload)), false)
      assert(reader.getNumImages(true) === nFrames,
        s"asset $id: container must hold the claimed frame count")
      reader.dispose()
    }
  }

  test("extractVideoFrames: real per-frame decode — claimed==decoded, lossless pixels") {
    val vd = Multimodal.asVideo(docs, "doc_id", "text")
    val frames = Multimodal.extractVideoFrames(vd, stride = 1, batchSize = 2)
      .collect().groupBy(_.asset_id)
    val claimed = vd.select(col("asset_id"), col("meta.width"),
        col("meta.height"), col("meta.n_frames"), col("meta.frame_ms"))
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(frames.keySet === claimed.keySet)
    frames.foreach { case (id, fs) =>
      val (w, h, n, ms) = claimed(id)
      assert(fs.length === n, s"asset $id: stride=1 decodes every frame")
      assert(fs.map(_.frame_index).sorted === (0 until n).toArray)
      fs.foreach { f =>
        assert(f.decoded_frames === n)
        assert((f.decoded_width, f.decoded_height) === ((w, h)))
        assert(f.decoded_frame_ms === ms,
          s"asset $id: GCE delay must round-trip through the container")
        assert(f.min_gray <= f.max_gray)
        assert(f.mean_gray >= f.min_gray && f.mean_gray <= f.max_gray)
      }
      // frames carry distinct content (the LCG stream advances) — a
      // decoder returning frame 0 n times would pass the count check
      assert(fs.map(_.mean_gray).distinct.length > 1 || fs.length == 1,
        s"asset $id: per-frame stats must differ across frames")
    }
    // deterministic: a second render+decode gives identical stats
    val again = Multimodal.extractVideoFrames(
      Multimodal.asVideo(docs, "doc_id", "text"), stride = 1).collect()
    assert(again.sortBy(f => (f.asset_id, f.frame_index)).toSeq ===
      frames.values.flatten.toSeq.sortBy(f => (f.asset_id, f.frame_index)))
  }

  test("extractVideoFrames: stride sampling decodes every k-th frame only") {
    val vd = Multimodal.asVideo(
      Seq((101L, "a doc long enough to land on several frames ok")).toDF("doc_id", "text"),
      "doc_id", "text")
    val n = vd.select(col("meta.n_frames")).as[Int].head()
    val sampled = Multimodal.extractVideoFrames(vd, stride = 2).collect()
    assert(sampled.map(_.frame_index).sorted === (0 until n by 2).toArray)
    assert(sampled.forall(_.decoded_frames === n),
      "decoded_frames reports the FULL container count, not the sample size")
  }

  test("extractVideoFrames: an undecodable payload fails loudly") {
    val bad = Seq((9L, "not a gif at all".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val ex = intercept[Exception] {
      Multimodal.extractVideoFrames(bad).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("undecodable")), s"got: ${messages(ex)}")
  }

  test("persistLevel: session conf selects the decoded-asset storage level") {
    import org.apache.spark.storage.StorageLevel
    val key = "spark.graft.multimodal.persistLevel"
    assert(spark.conf.getOption(key).isEmpty, "precondition: knob unset")
    assert(Multimodal.persistLevel(spark) === StorageLevel.MEMORY_AND_DISK)
    try {
      spark.conf.set(key, "DISK_ONLY")
      assert(Multimodal.persistLevel(spark) === StorageLevel.DISK_ONLY)
      spark.conf.set(key, "MEMORY_AND_DISK_SER")
      assert(Multimodal.persistLevel(spark) === StorageLevel.MEMORY_AND_DISK_SER)
    } finally spark.conf.unset(key)
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
