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
    ImageIO.write(img, "png", bos)
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
            val img = ImageIO.read(new ByteArrayInputStream(payload))
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
}
