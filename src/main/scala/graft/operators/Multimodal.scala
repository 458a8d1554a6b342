package graft.operators

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct, and
  * feature extraction runs as a batched per-partition transform — the
  * Scala analogue of `mapInPandas` (iterator-of-batches, fixed output
  * schema, no driver collect).
  *
  * The image path is REAL end to end: [[asMultimodal]] renders each doc
  * into an actual PNG (javax.imageio — public JDK, no external codec) and
  * [[extractFeatures]] decodes those bytes back into pixels, emitting
  * decoded width/height/band-count plus pixel statistics. The metadata
  * struct carries the CLAIMED dimensions; the decoder reports the ACTUAL
  * ones — the claimed-vs-decoded join is exactly the integrity check a
  * production ingest runs. Byte-stream assets (video/audio-shaped) go
  * through [[asByteStream]], whose offset arithmetic is engine-portable
  * for the full-replay frames oracle.
  */
object Multimodal {

  /** Storage level for decoded-asset persists, read from
    * `spark.graft.multimodal.persistLevel` (any `StorageLevel` name:
    * `DISK_ONLY`, `MEMORY_AND_DISK_SER`, ...). Default MEMORY_AND_DISK.
    * Relief valve for single-host runs where a large decoded-frame persist
    * (e.g. ~700 MB at sf10) pressures the unified memory pool: on a real
    * cluster the frames shard across executors, but a local[] run can pin
    * the persist to disk or serialized storage without touching code. */
  def persistLevel(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.storage.StorageLevel =
    s.conf.getOption("spark.graft.multimodal.persistLevel")
      .map(org.apache.spark.storage.StorageLevel.fromString)
      .getOrElse(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Deterministic 64-bit content hash (FNV-1a over UTF-8 bytes) — the
    * per-doc seed for rendered dimensions and pixel content. Self-contained
    * so render and re-render agree across runs and JVMs. */
  private def contentSeed(text: String): Long = {
    val bytes = text.getBytes("UTF-8")
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  private def posMod(x: Long, m: Int): Int = ((x % m + m) % m).toInt

  /** Render a deterministic RGB image and encode it as a real PNG: LCG
    * pixel stream from `seed`, written straight into the raster buffer
    * (one pass, no per-pixel boxing), then ImageIO's PNG encoder. */
  private def renderPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    var x = seed
    var i = 0
    while (i < data.length) {
      x = x * 6364136223846793005L + 1442695040888963407L
      data(i) = (x >>> 56).toByte
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    // explicit memory-cached stream: the ImageIO default (useCache=true)
    // backs non-file streams with a TEMP FILE per call — per-asset disk
    // churn a 100 TB render fleet must not pay
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    ImageIO.write(img, "png", ios)
    ios.close()
    bos.toByteArray
  }

  case class AssetMeta(mime: String, width: Int, height: Int, n_bytes: Int)
  case class Asset(asset_id: Long, payload: Array[Byte], meta: AssetMeta)

  /** Ingest a text corpus as an IMAGE asset table: each doc is rendered
    * into a real PNG payload (dimensions 16–95 px per side, derived from
    * the content hash) with a typed metadata struct whose width/height
    * are the render-time claim and n_bytes the actual encoded length.
    * Runs per-partition on executors — render cost scales out with the
    * corpus, nothing touches the driver. */
  def asMultimodal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val seed = contentSeed(text)
          val w = 16 + posMod(seed, 80)
          val h = 16 + posMod(seed >>> 32, 80)
          val png = renderPng(seed, w, h)
          Asset(id, png, AssetMeta("image/png", w, h, png.length))
        }
      }
      .toDF()
  }

  /** Ingest a text corpus as an opaque BYTE-STREAM asset (the video/audio
    * shape): payload is the raw content bytes, n_bytes its length. Kept
    * separate from the image path on purpose — frame sampling addresses a
    * byte stream, not pixels, and octet_length arithmetic is portable to
    * the second-engine replay (a PNG container length is not). */
  def asByteStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes")).as("meta"))

  case class AssetFeatures(asset_id: Long, n_bytes: Int,
                           decoded_width: Int, decoded_height: Int,
                           channels: Int, features: Array[Float])

  /** Batched per-partition feature extraction over the binary payloads —
    * iterator in, iterator out (never materializes a partition), grouping
    * rows into `batchSize` chunks exactly like a vectorized-UDF runner
    * hands them to the decoder. The decode is REAL: ImageIO parses the
    * PNG bytes and the features are pixel statistics of the decoded
    * raster — [0]=width, [1]=height, [2]=bands, [3..5]=mean R/G/B,
    * [6]=min luma, [7]=max luma, [8..dim-1]=luminance histogram
    * fractions. An undecodable payload fails loudly (a curation pipeline
    * wants the quarantine signal, not a silent zero vector). */
  def extractFeatures(mm: DataFrame, dim: Int = 16, batchSize: Int = 64): Dataset[AssetFeatures] = {
    require(dim >= 9, "dim must leave room for the 8 stat slots + >=1 histogram bin")
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized decoder runs; each batch
          // decodes together, mirroring an arrow-batch UDF's unit of work
          batch.iterator.map { case (id, payload) =>
            // memory-cached stream, not ImageIO's temp-file default
            val img = ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
              new ByteArrayInputStream(payload)))
            if (img == null)
              throw new IllegalArgumentException(
                s"multimodal: undecodable image payload for asset $id")
            AssetFeatures(id, payload.length, img.getWidth, img.getHeight,
              img.getRaster.getNumBands, pixelStats(img, dim))
          }
        }
      }
  }

  private def pixelStats(img: BufferedImage, dim: Int): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val bins = dim - 8
    val hist = new Array[Long](bins)
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var minL = 255.0
    var maxL = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        // integer Rec.601 luma — deterministic across platforms
        val l = (77 * r + 150 * g + 29 * b) >> 8
        if (l < minL) minL = l.toDouble
        if (l > maxL) maxL = l.toDouble
        hist((l * bins) >> 8) += 1
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val out = new Array[Float](dim)
    out(0) = w.toFloat; out(1) = h.toFloat
    out(2) = img.getRaster.getNumBands.toFloat
    out(3) = (sr / n).toFloat; out(4) = (sg / n).toFloat; out(5) = (sb / n).toFloat
    out(6) = minL.toFloat; out(7) = maxL.toFloat
    var i = 0
    while (i < bins) { out(8 + i) = (hist(i) / n).toFloat; i += 1 }
    out
  }

  /** Resize planning: aspect-preserving fit of each asset into a
    * (maxW, maxH) box — scale factor and target dimensions as a pure
    * projection on the metadata struct. The pixel work happens inside the
    * decoder at extract time; this is the Spark-side half every image
    * pipeline needs: know the output shape BEFORE paying the decode,
    * so batches can be packed by target size. */
  def resizePlan(mm: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("meta.width"),
      lit(maxH.toDouble) / col("meta.height"),
      lit(1.0)) // never upscale
    mm.select(
      col("asset_id"), col("meta.width").as("src_width"), col("meta.height").as("src_height"),
      round(scale, 6).as("scale"),
      floor(col("meta.width") * scale).cast("int").as("dst_width"),
      floor(col("meta.height") * scale).cast("int").as("dst_height"))
  }

  /** Frame-sampling plumbing for video-like payloads: deterministic frame
    * offsets from metadata, exploded to one row per sampled frame. */
  def sampleFrames(mm: DataFrame, nFrames: Int = 4): DataFrame =
    mm.select(
        col("asset_id"), col("meta"),
        posexplode(sequence(lit(0), lit(nFrames - 1))))
      .select(
        col("asset_id"),
        col("pos").as("frame_index"),
        (col("pos") * col("meta.n_bytes") / nFrames).cast("long").as("byte_offset"))

  // ---- audio ---------------------------------------------------------

  /** The four claimed sample rates; picked by `asset_id % 4` so the gate
    * oracle can replay the claim with portable integer arithmetic. */
  private[graft] val SampleRates = Array(8000, 16000, 22050, 44100)

  case class AudioMeta(mime: String, sample_rate: Int, channels: Int,
                       bits: Int, n_frames: Int, n_bytes: Int)
  case class AudioAsset(asset_id: Long, payload: Array[Byte], meta: AudioMeta)

  /** Encode interleaved PCM-16 frames as a real RIFF/WAVE payload: the
    * canonical 44-byte PCM header followed by little-endian samples.
    * Hand-rolled (not AudioSystem.write) so the byte layout is pinned —
    * total length is exactly `44 + 2*channels*frames`, which the replay
    * oracle recomputes from the claim. */
  private def renderWav(seed: Long, sampleRate: Int, channels: Int,
                        frames: Int): Array[Byte] = {
    val dataSize = 2 * channels * frames
    val out = new Array[Byte](44 + dataSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); le32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */); le16(22, channels)
    le32(24, sampleRate); le32(28, sampleRate * channels * 2)
    le16(32, channels * 2 /* block align */); le16(34, 16 /* bits */)
    tag(36, "data"); le32(40, dataSize)
    var x = seed
    var i = 44
    while (i < out.length) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 48).toByte      // LE low byte of a 16-bit sample
      out(i + 1) = (x >>> 56).toByte  // LE high byte
      i += 2
    }
    out
  }

  /** Ingest a text corpus as an AUDIO asset table: each doc becomes a real
    * RIFF/WAVE PCM-16 payload. The claimed parameters are derived
    * portably — sample rate by `id % 4` over [[SampleRates]], channel
    * count `1 + id % 2`, frame count `200 + utf8_len(text) % 800` — so a
    * second engine replays the whole metadata struct from (doc_id, text)
    * with integer arithmetic; only the PCM content itself (LCG from the
    * content hash) is JVM-side, and the golden stats gate covers it.
    * Render runs per-partition on executors, like the image path. */
  def asAudio(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val rate = SampleRates(posMod(id, 4))
          val channels = 1 + posMod(id, 2)
          val frames = 200 + posMod(text.getBytes("UTF-8").length.toLong, 800)
          val wav = renderWav(contentSeed(text), rate, channels, frames)
          AudioAsset(id, wav,
            AudioMeta("audio/wav", rate, channels, 16, frames, wav.length))
        }
      }
      .toDF()
  }

  case class AudioFeatures(asset_id: Long, n_bytes: Int,
                           decoded_rate: Int, decoded_channels: Int,
                           decoded_bits: Int, decoded_frames: Int,
                           duration_ms: Long, features: Array[Float])

  /** Batched per-partition audio feature extraction. The decode is REAL:
    * `javax.sound.sampled.AudioSystem` (public JDK) parses the WAV
    * container and reports the ACTUAL format — rate/channels/bits/frame
    * count come from the decoder, not the metadata claim — then the PCM
    * frames are read and summarized per channel: RMS, peak amplitude,
    * zero-crossing fraction, mean (all on the decoder's output, integer
    * accumulation, deterministic across JVMs). Feature layout:
    * `[c*4+0]=rms, [c*4+1]=peak, [c*4+2]=zcr, [c*4+3]=mean` for channel
    * `c` (mono payloads emit 4 slots). An unparsable payload fails
    * loudly, same contract as the image decoder. */
  def extractAudioFeatures(mm: DataFrame, batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val in = try {
              javax.sound.sampled.AudioSystem.getAudioInputStream(
                new ByteArrayInputStream(payload))
            } catch {
              case e: javax.sound.sampled.UnsupportedAudioFileException =>
                throw new IllegalArgumentException(
                  s"multimodal: undecodable audio payload for asset $id", e)
            }
            val fmt = in.getFormat
            val channels = fmt.getChannels
            val frames = in.getFrameLength.toInt
            val pcm = in.readAllBytes()
            in.close()
            val rate = math.round(fmt.getSampleRate)
            AudioFeatures(id, payload.length, rate, channels,
              fmt.getSampleSizeInBits, frames,
              frames.toLong * 1000L / rate, audioStats(pcm, channels, frames))
          }
        }
      }
  }

  // ---- video ---------------------------------------------------------

  case class VideoMeta(mime: String, width: Int, height: Int,
                       n_frames: Int, frame_ms: Int, n_bytes: Int)
  case class VideoAsset(asset_id: Long, payload: Array[Byte], meta: VideoMeta)

  /** 256-entry grayscale palette (r=g=b=index): the GIF color table that
    * makes the index stream a lossless pixel channel — GIF stores palette
    * indices verbatim (LZW is lossless), so a gray-palette frame
    * round-trips exact byte values, unlike a truecolor frame the encoder
    * would quantize. */
  private def grayPalette(): java.awt.image.IndexColorModel = {
    val g = new Array[Byte](256)
    var i = 0
    while (i < 256) { g(i) = i.toByte; i += 1 }
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Encode frames as a real animated GIF via ImageIO's sequence writer.
    * Two pinned details: (1) the default per-image metadata's
    * LocalColorTable node carries NO color entries, and `setFromTree`
    * with that empty node makes the writer drop the image palette and
    * remap every pixel — the node must be REMOVED so the palette is
    * derived from the frame itself; (2) delayTime lives in the
    * GraphicControlExtension in centiseconds, and the reader hands the
    * same node back on decode — the claimed-vs-decoded timing check
    * rides that round-trip. */
  private def renderGif(seed: Long, w: Int, h: Int, nFrames: Int,
                        delayCs: Int): Array[Byte] = {
    val icm = grayPalette()
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var x = seed
    var f = 0
    while (f < nFrames) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
      val data = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
      var i = 0
      while (i < data.length) {
        x = x * 6364136223846793005L + 1442695040888963407L
        data(i) = (x >>> 56).toByte
        i += 1
      }
      val meta = writer.getDefaultImageMetadata(
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), null)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      var gce: javax.imageio.metadata.IIOMetadataNode = null
      var lct: org.w3c.dom.Node = null
      var n = root.getFirstChild
      while (n != null) {
        if (n.getNodeName == "GraphicControlExtension")
          gce = n.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        if (n.getNodeName == "LocalColorTable") lct = n
        n = n.getNextSibling
      }
      if (lct != null) root.removeChild(lct)
      if (gce == null) {
        gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
        root.appendChild(gce)
      }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Ingest a text corpus as a VIDEO asset table: each doc becomes a real
    * multi-frame animated GIF. The claimed parameters are derived
    * portably — width `8 + id % 24`, height `8 + (id/5) % 24`, frame
    * count `2 + utf8_len(text) % 6`, frame interval `40·(1 + id % 3)` ms
    * — so a second engine replays the metadata struct from (doc_id,
    * text) with integer arithmetic; only the pixel content itself (LCG
    * from the content hash, continuing across frames) is JVM-side, and
    * the golden stats gate covers it. Render runs per-partition on
    * executors, like the image and audio paths. */
  def asVideo(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val w = 8 + posMod(id, 24)
          val h = 8 + posMod(id / 5, 24)
          val nFrames = 2 + posMod(text.getBytes("UTF-8").length.toLong, 6)
          val frameMs = 40 * (1 + posMod(id, 3))
          val gif = renderGif(contentSeed(text), w, h, nFrames, frameMs / 10)
          VideoAsset(id, gif,
            VideoMeta("image/gif", w, h, nFrames, frameMs, gif.length))
        }
      }
      .toDF()
  }

  case class VideoFrame(asset_id: Long, frame_index: Int,
                        decoded_frames: Int, decoded_width: Int,
                        decoded_height: Int, decoded_frame_ms: Int,
                        mean_gray: Float, min_gray: Int, max_gray: Int)

  /** Batched per-partition FRAME extraction over video payloads — the
    * real form of the byte-offset sampling in [[sampleFrames]]. The
    * decode is REAL: ImageIO's GIF reader parses the container, reports
    * the ACTUAL frame count/dimensions/per-frame delay (from the
    * GraphicControlExtension, centiseconds → ms), and every `stride`-th
    * frame is decoded to pixels and summarized (mean/min/max gray through
    * the decoded palette — integer accumulation, deterministic). One
    * output row per SAMPLED frame; `stride=1` decodes every frame, a
    * production sampler sets the stride to bound decode cost per asset.
    * An unparsable payload fails loudly, same contract as image/audio. */
  def extractVideoFrames(mm: DataFrame, stride: Int = 1,
                         batchSize: Int = 64): Dataset[VideoFrame] = {
    require(stride >= 1, "stride must be >= 1")
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, payload) =>
            val reader = ImageIO.getImageReadersByFormatName("gif").next()
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new ByteArrayInputStream(payload))
            try {
              reader.setInput(iis, false)
              val nFrames =
                try reader.getNumImages(true)
                catch {
                  case e: java.io.IOException =>
                    throw new IllegalArgumentException(
                      s"multimodal: undecodable video payload for asset $id", e)
                }
              if (nFrames <= 0)
                throw new IllegalArgumentException(
                  s"multimodal: undecodable video payload for asset $id")
              val delayMs = frameDelayMs(reader, 0)
              (0 until nFrames by stride).map { f =>
                val img = reader.read(f)
                val stats = grayStats(img)
                VideoFrame(id, f, nFrames, img.getWidth, img.getHeight,
                  delayMs, stats._1, stats._2, stats._3)
              }
            } finally { reader.dispose(); iis.close() }
          }
        }
      }
  }

  /** Per-frame delay from the GIF GraphicControlExtension, in ms. */
  private def frameDelayMs(reader: javax.imageio.ImageReader, frame: Int): Int = {
    val meta = reader.getImageMetadata(frame)
    val root = meta.getAsTree(meta.getNativeMetadataFormatName)
    var n = root.getFirstChild
    while (n != null) {
      if (n.getNodeName == "GraphicControlExtension")
        return n.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          .getAttribute("delayTime").toInt * 10
      n = n.getNextSibling
    }
    0
  }

  /** (mean, min, max) gray of a decoded frame, mapped through its color
    * model — exact integer accumulation, float only at the final mean. */
  private def grayStats(img: BufferedImage): (Float, Int, Int) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var minG = 255
    var maxG = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = img.getRGB(x, y) & 0xff // gray palette: r==g==b
        sum += g
        if (g < minG) minG = g
        if (g > maxG) maxG = g
        x += 1
      }
      y += 1
    }
    ((sum.toDouble / (w.toLong * h)).toFloat, minG, maxG)
  }

  // ---- perceptual-hash image dedup -----------------------------------

  /** 64-bit difference hash (dHash — the standard perceptual image hash:
    * bucket the image into a coarse luma grid, emit the sign of each
    * horizontal neighbor difference) over the DECODED pixels, in exact
    * integer arithmetic: cell values are raw luma SUMS and each
    * comparison is cross-multiplied by the neighbor's pixel count
    * (`S_l * A_r > S_r * A_l` ⇔ mean_l > mean_r, no division, no float)
    * — the gopher-rules float-free discipline, so the hash of a pixel
    * array is a pure integer function replayable anywhere. Grid is 8 rows
    * × 9 cols → 8 comparisons × 8 rows = 64 bits, bit (r*8+c) set when
    * cell (r,c) outshines cell (r,c+1). Container-invariant by
    * construction (PNG vs BMP of the same raster hash identically — the
    * re-encoded-copy case byte hashing misses) and stable under
    * area-mean resize of smooth images (box-downsampling commutes with
    * the cell sums up to sub-luma rounding). Luma is the integer Rec.601
    * form pixelStats uses. Overflow-safe (ANSI mode throws on long
    * overflow): S*A ≤ 255·(w·h)² needs w·h < ~1.9e8 — any real image. */
  def dHash64(img: BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    require(w >= 9 && h >= 8, s"dHash64 needs at least a 9x8 image, got ${w}x$h")
    val sums = new Array[Long](72)  // 8 rows x 9 cols, row-major
    val areas = new Array[Long](72)
    var y = 0
    while (y < h) {
      val r = ((y.toLong * 8) / h).toInt
      var x = 0
      while (x < w) {
        val c = ((x.toLong * 9) / w).toInt
        val rgb = img.getRGB(x, y)
        val l = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff)
          + 29 * (rgb & 0xff)) >> 8
        sums(r * 9 + c) += l
        areas(r * 9 + c) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val i = r * 9 + c
        if (sums(i) * areas(i + 1) > sums(i + 1) * areas(i))
          bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  case class AssetHash(asset_id: Long, phash: Long)

  /** Perceptual hash per asset: batched per-partition REAL decode (the
    * [[extractFeatures]] unit-of-work shape) → [[dHash64]] over the
    * raster. An undecodable payload fails loudly, same contract as the
    * feature extractors. */
  def imagePhash(mm: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val img = ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
              new ByteArrayInputStream(payload)))
            if (img == null)
              throw new IllegalArgumentException(
                s"multimodal: undecodable image payload for asset $id")
            AssetHash(id, dHash64(img))
          }
        }
      }
      .toDF()
  }

  /** Banded near-dup pairs over a phash column — [[Dedup.bandedHammingPairs]]
    * on image hashes (ONE banding body for the simhash and dHash tiers —
    * the shared-fragment discipline). bandBits=16 (4 bands, total recall
    * to hamming 3, 65536-value buckets) is the at-scale default; 8 buys
    * recall to 7 bits at 256-value buckets, a moderate-n high-recall tier.
    * The hot-bucket guard caps e.g. a monochrome-asset cluster (all-zero
    * hashes). The shared body also persists the hashed frame across the
    * self-join legs — for images that's a corpus of REAL decodes that must
    * not run twice. */
  def phashNearDups(hashed: DataFrame, idCol: String = "asset_id",
                    hashCol: String = "phash", maxHamming: Int = 3,
                    bandBits: Int = 16,
                    maxBucket: Int = 100000): DataFrame =
    Dedup.bandedHammingPairs(hashed, idCol, hashCol, maxHamming,
      bandBits, maxBucket, requireTotalRecall = true)

  /** Prebuilt two-tier image novelty index — the deployed-artifact side of
    * the crawl-ingest image gate ([[probePhashNovelty]] / E-row
    * stream_phash_novelty): `exact` is the DISTINCT md5 set of corpus
    * payload bytes (tier 1 — a re-crawl of the same file), `banded` the
    * DISTINCT (band, band_val, cphash) form of the corpus dHashes (tier 2
    * — re-encodes/resizes of indexed pixels). Distinctness is the scale
    * contract, not a convenience: novelty is an EXISTENCE verdict, so a
    * million-member boilerplate cluster (identical fingerprints — the
    * bucket the pair tier must cap or fail on) collapses to ONE index row
    * per band, bounding probe-join fan-out by distinct hashes per bucket
    * while losing nothing. Both frames persist (tracked); build once per
    * deployed corpus, probe per arriving wave. */
  case class PhashIndex(exact: DataFrame, banded: DataFrame,
                        bandBits: Int, maxHamming: Int)

  /** Build a [[PhashIndex]] over a corpus of (asset_id, payload) rows.
    * Total recall to hamming `bands-1` holds by the pigeonhole bound with
    * NO hot-bucket cap needed — see the distinctness argument on
    * [[PhashIndex]]. */
  def buildPhashIndex(corpus: DataFrame, bandBits: Int = 16,
                      maxHamming: Int = 3): PhashIndex = {
    require(maxHamming <= 64 / bandBits - 1,
      s"banding with ${64 / bandBits} bands only guarantees recall to " +
        s"hamming ${64 / bandBits - 1}")
    val exact = Dedup.persistTracked(
      corpus.select(md5(col("payload")).as("byte_hash")).distinct())
    val banded = Dedup.persistTracked(
      Dedup.banded64(imagePhash(corpus).toDF(), "asset_id", "phash", bandBits)
        .select(col("band"), col("band_val"), col("h").as("cphash"))
        .distinct())
    PhashIndex(exact, banded, bandBits, maxHamming)
  }

  /** Judge one arriving wave of (asset_id, payload) rows against a
    * prebuilt [[PhashIndex]]: ONE decode pass per arrival (md5 + dHash
    * from the same frame), exact tier first, banded-hamming probe join
    * second (the D15b two-tier novelty pattern on image content).
    * Verdicts are per-asset functions of (payload, index) — independent
    * of wave/batch split, which is what makes the streaming drain equal
    * the batch run. Returns (asset_id, method ∈ exact|phash|novel,
    * is_novel). */
  def probePhashNovelty(batch: DataFrame, index: PhashIndex): DataFrame =
    probeHashedNovelty(Dedup.persistTracked(hashAssets(batch)), index)

  /** One decode pass over a wave of (asset_id, payload) rows → (asset_id,
    * phash, byte_hash). The caller persists (the frame feeds three joins
    * in [[probeHashedNovelty]] and real decodes must not run per leg) and
    * OWNS the release: the batch form goes through persistTracked (the
    * harness sweep); the streaming wrapper unpersists per micro-batch
    * after its sink write materializes the verdicts — a continuous
    * deployment must not accumulate one cached batch frame per wave
    * (review catch, r20). */
  private[graft] def hashAssets(batch: DataFrame): DataFrame =
    imagePhash(batch).toDF().join(
      batch.select(col("asset_id"), md5(col("payload")).as("byte_hash")),
      "asset_id")

  private[graft] def probeHashedNovelty(hashed: DataFrame,
                                        index: PhashIndex): DataFrame = {
    val exactHit = hashed
      .join(index.exact, Seq("byte_hash"), "left_semi")
      .select(col("asset_id"), lit(true).as("__ex"))
    val phashHit = Dedup.banded64(hashed, "asset_id", "phash", index.bandBits)
      .join(index.banded, Seq("band", "band_val"))
      .filter(bit_count(col("h").bitwiseXOR(col("cphash"))) <= index.maxHamming)
      .select(col("id").as("asset_id")).distinct()
      .withColumn("__ph", lit(true))
    hashed.select(col("asset_id"))
      .join(exactHit, Seq("asset_id"), "left")
      .join(phashHit, Seq("asset_id"), "left")
      .select(col("asset_id"),
        when(coalesce(col("__ex"), lit(false)), "exact")
          .when(coalesce(col("__ph"), lit(false)), "phash")
          .otherwise("novel").as("method"),
        (!coalesce(col("__ex"), lit(false)) &&
          !coalesce(col("__ph"), lit(false))).as("is_novel"))
  }

  /** Exact byte-level asset dedup: md5 over the PAYLOAD bytes (the
    * exactByHash discipline on binary content), one (canonical_id,
    * asset_id) pair per NON-canonical member of each duplicate group —
    * canonical = min asset id, the keep-first rule every dedup tier
    * uses. A hash groupBy, no pairwise term at any scale. */
  def exactAssetPairs(mm: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__bh").orderBy(col("asset_id").asc)
    mm.select(col("asset_id"), md5(col("payload")).as("__bh"))
      .withColumn("__canon", first(col("asset_id")).over(w))
      .filter(col("asset_id") =!= col("__canon"))
      .select(col("__canon").as("id_a"), col("asset_id").as("id_b"))
  }

  /** Plant-id bases for [[plantedAssets]] — far above any real doc_id at
    * any SF (sf100 tops out around 6e6). */
  val ExactCopyBase = 1000000000L
  val ReencodeBase = 2000000000L
  val SmoothBase = 3000000000L
  val ResizedBase = 3500000000L

  /** Deterministic smooth grayscale image for the resize-robustness
    * plants: a 2D sinusoid (StrictMath — bit-identical across JVMs) whose
    * frequency pair/phase vary per seed, so different seeds produce
    * DISTANT dHashes (the horizontal-derivative sign pattern follows the
    * frequency) while each image is smooth enough that an area-mean
    * half-resize preserves its hash to within a couple of bits. The LCG
    * noise the corpus renders is the pathological anti-case for
    * perceptual hashing (no structure to preserve), so the resize plants
    * are structured on purpose — exactly the images pHash is for. */
  private[graft] def smoothImage(g: Int, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val fx = 1 + g % 3          // 1..3 horizontal periods
    val fy = 1 + (g / 3) % 3    // varies per seed
    val phase = 0.37 * g
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // the linear tilt (+~2 luma per grid cell left-to-right) breaks
        // the near-ties at the sinusoid's horizontal extrema, where the
        // cell-mean difference would otherwise sit inside the resize's
        // sub-luma rounding band and flip hash bits; a linear term
        // commutes exactly with the 2x2 box mean, so it stabilizes the
        // comparison without costing any resize invariance
        val v = 112 + 24 * x / w + (96 * StrictMath.sin(
          2 * StrictMath.PI * (fx.toDouble * x / w + fy.toDouble * y / h) + phase)).toInt
        val p = (v << 16) | (v << 8) | v
        img.setRGB(x, y, p)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Exact 2x2 box-mean half-resize (floor division — integer-exact):
    * the "resized copy" plant transform. Requires even dimensions so the
    * blocks tile exactly and the downsample commutes with [[dHash64]]'s
    * area sums up to sub-luma rounding. */
  private[graft] def boxHalf(img: BufferedImage): BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    require(w % 2 == 0 && h % 2 == 0, s"boxHalf needs even dims, got ${w}x$h")
    val out = new BufferedImage(w / 2, h / 2, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h / 2) {
      var x = 0
      while (x < w / 2) {
        var (r, g, b) = (0, 0, 0)
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val rgb = img.getRGB(2 * x + dx, 2 * y + dy)
            r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
            dx += 1
          }
          dy += 1
        }
        out.setRGB(x, y, ((r / 4) << 16) | ((g / 4) << 8) | (b / 4))
        x += 1
      }
      y += 1
    }
    out
  }

  private def encodeImg(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    ImageIO.write(img, format, ios)
    ios.close()
    bos.toByteArray
  }

  /** The planted asset corpus for the image-dedup gate: the full corpus
    * render, plus per doc < nPlants an EXACT byte copy (same PNG bytes —
    * the byte-hash tier's catch) and a lossless BMP RE-ENCODE (identical
    * pixels, different container bytes — invisible to byte hashing,
    * hamming 0 to pHash), plus nPlants smooth synthetic images each with
    * an exact half-size box-mean RESIZE (different pixels AND bytes —
    * only a perceptual hash recovers these). Copies derive from the
    * rendered payloads per-partition on executors; the smooth family is
    * rendered through spark.range, so nothing touches the driver. */
  def plantedAssets(docs: DataFrame, idCol: String, textCol: String,
                    nPlants: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = asMultimodal(docs, idCol, textCol)
    val copies = base.filter(col("asset_id") < nPlants)
      .select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, png) =>
          val img = ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(png)))
          val bmp = encodeImg(img, "bmp")
          Iterator(
            Asset(id + ExactCopyBase, png,
              AssetMeta("image/png", img.getWidth, img.getHeight, png.length)),
            Asset(id + ReencodeBase, bmp,
              AssetMeta("image/bmp", img.getWidth, img.getHeight, bmp.length)))
        }
      }.toDF()
    val smooth = spark.range(nPlants).as[Long]
      .mapPartitions { gs =>
        gs.flatMap { gl =>
          val g = gl.toInt
          // dims ≡ 0 mod (18, 16), varied per seed: the 9x8 dHash grid
          // then tiles both the full and the halved image EXACTLY (every
          // cell boundary c*w/9 / r*h/8 is an even integer), so halving
          // commutes with the grid sums and the only resize perturbation
          // left is the 2x2 box mean's sub-luma floor — measured hamming
          // 0 for every plant (spec-pinned). With misaligned boundaries
          // (the first cut used 60+4g x 44+6g) the
          // boundary rows/columns shift by a pixel and
          // high-frequency seeds drifted 6 bits.
          val (w, h) = (54 + 18 * g, 48 + 16 * g)
          val full = smoothImage(g, w, h)
          val half = boxHalf(full)
          val fullPng = encodeImg(full, "png")
          val halfPng = encodeImg(half, "png")
          Iterator(
            Asset(SmoothBase + g, fullPng, AssetMeta("image/png", w, h, fullPng.length)),
            Asset(ResizedBase + g, halfPng, AssetMeta("image/png", w / 2, h / 2, halfPng.length)))
        }
      }.toDF()
    base.unionByName(copies).unionByName(smooth)
  }

  private def audioStats(pcm: Array[Byte], channels: Int, frames: Int): Array[Float] = {
    val sumSq = new Array[Long](channels)
    val sum = new Array[Long](channels)
    val peak = new Array[Int](channels)
    val crossings = new Array[Int](channels)
    val prev = new Array[Int](channels)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val off = (f * channels + c) * 2
        // little-endian signed 16-bit
        val s = ((pcm(off) & 0xff) | (pcm(off + 1) << 8)).toShort.toInt
        sumSq(c) += s.toLong * s
        sum(c) += s
        val a = math.abs(s)
        if (a > peak(c)) peak(c) = a
        if (f > 0 && ((s ^ prev(c)) < 0)) crossings(c) += 1
        prev(c) = s
        c += 1
      }
      f += 1
    }
    val out = new Array[Float](channels * 4)
    var c = 0
    while (c < channels) {
      out(c * 4) = math.sqrt(sumSq(c).toDouble / frames).toFloat
      out(c * 4 + 1) = peak(c).toFloat
      out(c * 4 + 2) = (crossings(c).toDouble / math.max(frames - 1, 1)).toFloat
      out(c * 4 + 3) = (sum(c).toDouble / frames).toFloat
      c += 1
    }
    out
  }
}
