package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct, and
  * feature extraction runs as a batched per-partition transform — the
  * Scala analogue of `mapInPandas` (iterator-of-batches, fixed output
  * schema, no driver collect).
  *
  * The DECODE step is a deterministic stub (`fakeDecode`) because no
  * image/audio codecs ship in this environment; the Spark-side contract —
  * schema, batching, partition flow — is real and tested. Swap
  * `fakeDecode` for a codec call to productionize.
  */
object Multimodal {

  /** Wrap a text corpus as a multimodal table: payload bytes + typed
    * metadata (the shape an image/audio ingest produces). */
  def asMultimodal(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image/png").as("mime"),
        (pmod(xxhash64(col(textCol)), lit(1024L)) + 64L).cast("int").as("width"),
        (pmod(xxhash64(col(textCol), lit(1)), lit(1024L)) + 64L).cast("int").as("height"),
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes")).as("meta"))

  /** Deterministic stand-in for a real decoder: hashes payload bytes into a
    * fixed-length feature vector. Replace with a codec for production. */
  private def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
      i += 1
    }
    out
  }

  case class AssetFeatures(asset_id: Long, n_bytes: Int, features: Array[Float])

  /** Batched per-partition feature extraction over the binary payloads —
    * iterator in, iterator out (never materializes a partition), grouping
    * rows into `batchSize` chunks exactly like a vectorized-UDF runner
    * would hand them to a native decoder. */
  def extractFeatures(mm: DataFrame, dim: Int = 16, batchSize: Int = 64): Dataset[AssetFeatures] = {
    val spark = mm.sparkSession
    import spark.implicits._
    mm.select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real decoder would run vectorized
          batch.iterator.map { case (id, payload) =>
            AssetFeatures(id, payload.length, fakeDecode(payload, dim))
          }
        }
      }
  }

  /** Resize planning: aspect-preserving fit of each asset into a
    * (maxW, maxH) box — scale factor and target dimensions as a pure
    * projection on the metadata struct. The pixel work happens inside the
    * (stubbed) decoder at extract time; this is the Spark-side half every
    * image pipeline needs: know the output shape BEFORE paying the decode,
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
