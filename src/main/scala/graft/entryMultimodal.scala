package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.ml.FatalityModel
import graft.operators._
import graft.sources.{Jsonl, Sink, Tables}
import graft.streaming.{EventStream, IncrementalStream}

import EntryOps._

/** Multimodal (image/audio/video) metadata, decode, and
  * feature-extraction plumbing over binary columns.
  *
  * Registration slice of the [[SparkEntry]] driver contract — query
  * lambdas and their DuckDB oracle replays, split per tier (r15) so the
  * contract file stops being the single merge bottleneck. Entry text is
  * unchanged from the monolithic registration. */
private[graft] object MultimodalEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> ((s, d) => {
      val mm = Multimodal.asMultimodal(Tables.documents(s, d), "doc_id", "text")
      // REAL decode: every payload is a rendered PNG, parsed back by
      // ImageIO — decoded dims/bands come from the pixels, not the
      // metadata claim. Gate output is scalars only (the driver's pandas
      // compare can't hash array cells): the feature vector is summarized
      // by a stable hash.
      Multimodal.extractFeatures(mm, dim = 16).toDF()
        .select(
          col("asset_id"), col("n_bytes"),
          col("decoded_width"), col("decoded_height"), col("channels"),
          xxhash64(col("features").cast("string")).as("feature_hash"))
    }),
    "multimodal_frames" -> ((s, d) => {
      // Frame-sampling plumbing under a FULL oracle (unlike the
      // hash-bearing meta/feature gates, the offsets are pure metadata
      // arithmetic DuckDB replays exactly): n evenly-spaced byte offsets
      // per asset, one row per sampled frame. Runs on the byte-stream
      // (video-shaped) wrapper — octet_length arithmetic is portable to
      // the replay, a PNG container length is not.
      val mm = Multimodal.asByteStream(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleFrames(mm, nFrames = 4)
    }),
    "multimodal_golden" -> ((s, d) => {
      // Oracle-checkable slice of the multimodal plumbing: metadata
      // struct, REAL ImageIO decode (claimed vs decoded dims + band
      // count + pixel-stat feature hash), and resize plan for docs 0-9,
      // all fully deterministic. The hash-derived fields have no DuckDB
      // mirror, so the oracle pins GOLDEN rows (computed once from the
      // seed=42 corpus at the sf0.01 gate SF, like fingerprint's) — any
      // drift in the PNG render, the decode, pixel statistics, batching,
      // or resize arithmetic breaks the hash compare.
      val mm = Multimodal.asMultimodal(
        Tables.documents(s, d).filter(col("doc_id") < 10), "doc_id", "text")
      val feats = Multimodal.extractFeatures(mm, dim = 16).toDF()
        .select(col("asset_id"), col("n_bytes"),
          col("decoded_width"), col("decoded_height"), col("channels"),
          xxhash64(col("features").cast("string")).as("feature_hash"))
      mm.select(col("asset_id"), col("meta.mime").as("mime"),
          col("meta.width").as("width"), col("meta.height").as("height"))
        .join(feats, "asset_id")
        .join(Multimodal.resizePlan(mm, 64, 64)
          .select(col("asset_id"), col("scale"),
            col("dst_width"), col("dst_height")), "asset_id")
    }),
    "multimodal_audio" -> ((s, d) => {
      // REAL audio decode under a FULL oracle: every payload is a rendered
      // RIFF/WAVE PCM-16 asset whose CLAIMED parameters (rate by id%4,
      // channels by id%2, frames from the UTF-8 byte length) are portable
      // integer arithmetic, and javax.sound.sampled decodes the bytes
      // back — the DECODED rate/channels/bits/frames and the duration
      // must land on the very values DuckDB recomputes from (doc_id,
      // text), so a drift anywhere in the WAV writer or the decoder
      // flips the row red. The asset frame is persisted so the render
      // runs once across the claim/decode branches of the join.
      val au = Dedup.persistTracked(
        Multimodal.asAudio(Tables.documents(s, d), "doc_id", "text"),
        Multimodal.persistLevel(s))
      au.select(col("asset_id"), col("meta.mime").as("mime"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.bits").as("bits"), col("meta.n_frames").as("n_frames"))
        .join(Multimodal.extractAudioFeatures(au).toDF()
          .select(col("asset_id"), col("n_bytes"), col("decoded_rate"),
            col("decoded_channels"), col("decoded_bits"),
            col("decoded_frames"), col("duration_ms")), "asset_id")
    }),
    "multimodal_audio_golden" -> ((s, d) => {
      // The PCM content itself (LCG stream) has no DuckDB mirror, so its
      // per-channel statistics — RMS, peak, zero-crossing fraction, mean,
      // computed off the DECODER's output — are pinned as golden rows for
      // docs 0-9, like the image path's pixel-stat hash.
      val au = Dedup.persistTracked(Multimodal.asAudio(
        Tables.documents(s, d).filter(col("doc_id") < 10), "doc_id", "text"),
        Multimodal.persistLevel(s))
      au.select(col("asset_id"), col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"), col("meta.n_frames").as("n_frames"))
        .join(Multimodal.extractAudioFeatures(au).toDF()
          .select(col("asset_id"), col("n_bytes"), col("decoded_frames"),
            col("duration_ms"),
            xxhash64(col("features").cast("string")).as("feature_hash")),
          "asset_id")
    }),
    "multimodal_video" -> ((s, d) => {
      // REAL video-frame decode under a FULL oracle: every payload is a
      // rendered multi-frame animated GIF whose CLAIMED parameters
      // (width/height by id arithmetic, frame count from the UTF-8 byte
      // length, frame interval by id%3) are portable integer arithmetic,
      // and ImageIO's GIF reader decodes the container back — the
      // DECODED frame count, dimensions, and per-frame delay (from the
      // GraphicControlExtension) must land on the very values DuckDB
      // recomputes from (doc_id, text), and the per-frame sample count
      // must equal the claimed frame count (stride=1 decodes every
      // frame). The asset frame is persisted so the render runs once
      // across the claim/decode branches of the join.
      val vd = Dedup.persistTracked(
        Multimodal.asVideo(Tables.documents(s, d), "doc_id", "text"),
        Multimodal.persistLevel(s))
      vd.select(col("asset_id"), col("meta.mime").as("mime"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_frames").as("n_frames"),
          col("meta.frame_ms").as("frame_ms"))
        .join(Multimodal.extractVideoFrames(vd).toDF()
          .groupBy("asset_id")
          .agg(max("decoded_frames").as("decoded_frames"),
            count(lit(1)).cast("int").as("sampled_frames"),
            max("decoded_width").as("decoded_width"),
            max("decoded_height").as("decoded_height"),
            max("decoded_frame_ms").as("decoded_frame_ms")), "asset_id")
    }),
    "image_phash_dedup" -> ((s, d) => {
      // Perceptual-hash image dedup over DECODED pixels — the tier byte
      // hashing cannot reach: the planted corpus carries, per doc 0-4, an
      // EXACT byte copy (caught by the md5 tier), a lossless BMP
      // re-encode (same raster, different container — only the dHash
      // sees it), and a smooth synthetic image with an exact half-size
      // box-mean resize (different pixels AND bytes — the perceptual
      // case proper). Ledger = exact pairs + the phash pairs byte
      // hashing missed (left_anti on the exact set). Banding is the
      // production dial: 4 bands x 16 bits (total recall to hamming 3,
      // 65536-value buckets — the at-scale shape), hot-bucket guard on.
      // The oracle's bite is structural: every planted pair must appear
      // with hamming 0 AND no accidental pair may survive anywhere in
      // the full rendered corpus (the row-count compare fails on any
      // false positive).
      val corpus = Dedup.persistTracked(
        Multimodal.plantedAssets(Tables.documents(s, d), "doc_id", "text"),
        Multimodal.persistLevel(s))
      val exact = Multimodal.exactAssetPairs(corpus)
      val phashOnly = Multimodal.phashNearDups(Multimodal.imagePhash(corpus))
        .join(exact, Seq("id_a", "id_b"), "left_anti")
      exact.select(col("id_a"), col("id_b"),
          lit("exact").as("method"), lit(0).as("hamming"))
        .unionByName(phashOnly.select(col("id_a"), col("id_b"),
          lit("phash").as("method"), col("hamming").cast("int").as("hamming")))
    }),
    "multimodal_video_golden" -> ((s, d) => {
      // The pixel content itself (LCG stream continuing across frames)
      // has no DuckDB mirror, so the per-frame decoded statistics —
      // mean/min/max gray through the decoded palette — are pinned as a
      // stat hash per SAMPLED FRAME for docs 0-9, the video analogue of
      // the image pixel-stat and audio PCM-stat goldens. One row per
      // frame proves real frame-granular decode, not container metadata.
      val vd = Dedup.persistTracked(Multimodal.asVideo(
        Tables.documents(s, d).filter(col("doc_id") < 10), "doc_id", "text"),
        Multimodal.persistLevel(s))
      Multimodal.extractVideoFrames(vd).toDF()
        .join(vd.select(col("asset_id"),
          col("meta.n_frames").as("n_frames"),
          col("meta.n_bytes").as("n_bytes")), "asset_id")
        .select(col("asset_id"), col("frame_index"), col("n_frames"),
          col("n_bytes"), col("decoded_width"), col("decoded_height"),
          col("decoded_frame_ms"),
          xxhash64(concat_ws(",", col("mean_gray").cast("string"),
            col("min_gray").cast("string"),
            col("max_gray").cast("string"))).as("stat_hash"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "image_phash_dedup" ->
      // structural replay, not pinned goldens: the planted families FORCE
      // the ledger — exact copies pair under the byte tier; BMP
      // re-encodes and grid-aligned half-resizes land at hamming 0 by the
      // dHash construction (the spec measures 0 for every plant); and the
      // LCG noise corpus admits no accidental pair (P(hamming<=3) ~ 2^-44
      // per pair), so ANY extra row or wrong hamming fails the compare
      """SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           method, CAST(hamming AS INTEGER) AS hamming
         FROM (
           SELECT doc_id AS id_a, doc_id + 1000000000 AS id_b,
                  'exact' AS method, 0 AS hamming
             FROM documents WHERE doc_id < 5
           UNION ALL
           SELECT doc_id, doc_id + 2000000000, 'phash', 0
             FROM documents WHERE doc_id < 5
           UNION ALL
           SELECT doc_id + 1000000000, doc_id + 2000000000, 'phash', 0
             FROM documents WHERE doc_id < 5
           UNION ALL
           SELECT 3000000000 + range, 3500000000 + range, 'phash', 0
             FROM range(0, 5)
         ) t""",
    "multimodal_frames" ->
      // full replay: UTF-8 byte length and the evenly-spaced offset
      // arithmetic are engine-portable (encode → BLOB octet_length)
      """SELECT doc_id AS asset_id,
           CAST(i AS INTEGER) AS frame_index,
           CAST(floor(i * octet_length(encode(text)) / 4.0) AS BIGINT)
             AS byte_offset
         FROM documents CROSS JOIN (SELECT range AS i FROM range(0, 4)) t""",
    "multimodal_golden" ->
      // golden rows: REAL PNG render + ImageIO decode — claimed dims,
      // decoded dims, band count, pixel-stat feature hash, and resize
      // plan are pure deterministic functions of the corpus; the
      // hash/decoder pieces have no DuckDB mirror to recompute against
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(asset_id AS BIGINT) AS asset_id, mime,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(decoded_width AS INTEGER) AS decoded_width,
           CAST(decoded_height AS INTEGER) AS decoded_height,
           CAST(channels AS INTEGER) AS channels,
           CAST(feature_hash AS BIGINT) AS feature_hash,
           CAST(scale AS DOUBLE) AS scale,
           CAST(dst_width AS INTEGER) AS dst_width,
           CAST(dst_height AS INTEGER) AS dst_height
         FROM (VALUES
           (0, 'image/png', 89, 80, 21513, 89, 80, 3,  8111064614580237344, 0.719101, 64, 57),
           (1, 'image/png', 34, 93,  9647, 34, 93, 3, -4711019057112965275, 0.688172, 23, 64),
           (2, 'image/png', 57, 35,  6088, 57, 35, 3, -1581139355009805544, 1.0,      57, 35),
           (3, 'image/png', 94, 57, 16199, 94, 57, 3,  2281525233769789840, 0.680851, 64, 38),
           (4, 'image/png', 62, 23,  4369, 62, 23, 3,  4443404239234293832, 1.0,      62, 23),
           (5, 'image/png', 48, 47,  6883, 48, 47, 3, -8241910020716912126, 1.0,      48, 47),
           (6, 'image/png', 72, 81, 17650, 72, 81, 3,  8414626735775590888, 0.790123, 56, 64),
           (7, 'image/png', 60, 57, 10385, 60, 57, 3,  8998926091928995417, 1.0,      60, 57),
           (8, 'image/png', 94, 40, 11388, 94, 40, 3,  7250246917149063029, 0.680851, 64, 27),
           (9, 'image/png', 73, 90, 19873, 73, 90, 3, -2293091748645264245, 0.711111, 51, 64))
           t(asset_id, mime, width, height, n_bytes, decoded_width,
             decoded_height, channels, feature_hash, scale, dst_width,
             dst_height)""",
    "multimodal_audio" ->
      // full replay: the WAV claim is portable integer arithmetic (rate
      // by id%4, channels by id%2, frames from the UTF-8 byte length,
      // container size 44 + 2*ch*frames) and the Spark side emits the
      // DECODED values — so the decoder must land on exactly what this
      // SQL recomputes from (doc_id, text)
      """SELECT CAST(doc_id AS BIGINT) AS asset_id,
           'audio/wav' AS mime,
           CAST(CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 8000 WHEN 1 THEN 16000
             WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
           CAST(1 + doc_id % 2 AS INTEGER) AS channels,
           CAST(16 AS INTEGER) AS bits,
           CAST(200 + octet_length(encode(text)) % 800 AS INTEGER) AS n_frames,
           CAST(44 + 2 * (1 + doc_id % 2)
             * (200 + octet_length(encode(text)) % 800) AS INTEGER) AS n_bytes,
           CAST(CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 8000 WHEN 1 THEN 16000
             WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS decoded_rate,
           CAST(1 + doc_id % 2 AS INTEGER) AS decoded_channels,
           CAST(16 AS INTEGER) AS decoded_bits,
           CAST(200 + octet_length(encode(text)) % 800 AS INTEGER) AS decoded_frames,
           CAST(floor((200 + octet_length(encode(text)) % 800) * 1000.0
             / (CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 22050 ELSE 44100 END)) AS BIGINT) AS duration_ms
         FROM documents""",
    "multimodal_audio_golden" ->
      // golden rows: the PCM content (LCG stream from the content hash)
      // has no DuckDB mirror, so its per-channel decoded statistics —
      // RMS, peak, zero-crossing fraction, mean — are pinned as a stat
      // hash for docs 0-9, like the image path's pixel-stat hash
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(asset_id AS BIGINT) AS asset_id,
           CAST(sample_rate AS INTEGER) AS sample_rate,
           CAST(channels AS INTEGER) AS channels,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(decoded_frames AS INTEGER) AS decoded_frames,
           CAST(duration_ms AS BIGINT) AS duration_ms,
           CAST(feature_hash AS BIGINT) AS feature_hash
         FROM (VALUES
           (0,  8000, 1, 357,  758, 357, 44,   815121319884340546),
           (1, 16000, 2, 606, 2468, 606, 37, -3148908133331053719),
           (2, 22050, 1, 446,  936, 446, 20, -5293170672678635246),
           (3, 44100, 2, 347, 1432, 347,  7,  8559689264207827434),
           (4,  8000, 1, 450,  944, 450, 56,  -400488883237690492),
           (5, 16000, 2, 514, 2100, 514, 32, -5795136047979769872),
           (6, 22050, 1, 278,  600, 278, 12,  3927127478119751467),
           (7, 44100, 2, 602, 2452, 602, 13,  6416014312636385517),
           (8,  8000, 1, 670, 1384, 670, 83,  3341146344092371091),
           (9, 16000, 2, 591, 2408, 591, 36,  1440306457218818036))
           t(asset_id, sample_rate, channels, n_frames, n_bytes,
             decoded_frames, duration_ms, feature_hash)""",
    "multimodal_video" ->
      // full replay: the GIF claim is portable integer arithmetic
      // (width/height from the id, frame count from the UTF-8 byte
      // length, frame interval by id%3) and the Spark side emits the
      // DECODED values plus the stride-1 sample count — so the GIF
      // writer, the reader, and the GraphicControlExtension delay
      // round-trip must all land on exactly what this SQL recomputes
      // from (doc_id, text)
      """SELECT CAST(doc_id AS BIGINT) AS asset_id,
           'image/gif' AS mime,
           CAST(8 + doc_id % 24 AS INTEGER) AS width,
           CAST(8 + (doc_id // 5) % 24 AS INTEGER) AS height,
           CAST(2 + octet_length(encode(text)) % 6 AS INTEGER) AS n_frames,
           CAST(40 * (1 + doc_id % 3) AS INTEGER) AS frame_ms,
           CAST(2 + octet_length(encode(text)) % 6 AS INTEGER) AS decoded_frames,
           CAST(2 + octet_length(encode(text)) % 6 AS INTEGER) AS sampled_frames,
           CAST(8 + doc_id % 24 AS INTEGER) AS decoded_width,
           CAST(8 + (doc_id // 5) % 24 AS INTEGER) AS decoded_height,
           CAST(40 * (1 + doc_id % 3) AS INTEGER) AS decoded_frame_ms
         FROM documents""",
    "multimodal_video_golden" ->
      // golden rows: the frame pixel content (LCG stream) has no DuckDB
      // mirror, so the per-frame decoded gray statistics are pinned as a
      // stat hash per sampled frame for docs 0-9
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      """SELECT CAST(asset_id AS BIGINT) AS asset_id,
           CAST(frame_index AS INTEGER) AS frame_index,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           CAST(decoded_width AS INTEGER) AS decoded_width,
           CAST(decoded_height AS INTEGER) AS decoded_height,
           CAST(decoded_frame_ms AS INTEGER) AS decoded_frame_ms,
           CAST(stat_hash AS BIGINT) AS stat_hash
         FROM (VALUES
           (0, 0, 3, 1070, 8, 8, 40, -1159167218004833632),
           (0, 1, 3, 1070, 8, 8, 40, -1546492509488213353),
           (0, 2, 3, 1070, 8, 8, 40, -2010878157879447441),
           (1, 0, 6, 1410, 9, 8, 80, -795829864584883893),
           (1, 1, 6, 1410, 9, 8, 80, -866852766321976470),
           (1, 2, 6, 1410, 9, 8, 80, 8413007321690067687),
           (1, 3, 6, 1410, 9, 8, 80, -6344610664508507367),
           (1, 4, 6, 1410, 9, 8, 80, -1240898395721868525),
           (1, 5, 6, 1410, 9, 8, 80, -6213456460328992647),
           (2, 0, 2, 1010, 10, 8, 120, -6633046815221518015),
           (2, 1, 2, 1010, 10, 8, 120, 438822179085019751),
           (3, 0, 5, 1397, 11, 8, 40, 5336018104013120779),
           (3, 1, 5, 1397, 11, 8, 40, 5078118319221794239),
           (3, 2, 5, 1397, 11, 8, 40, -6272666110155757850),
           (3, 3, 5, 1397, 11, 8, 40, -2241848540913760882),
           (3, 4, 5, 1397, 11, 8, 40, -835631986725216175),
           (4, 0, 6, 1574, 12, 8, 80, 3476966573548996982),
           (4, 1, 6, 1574, 12, 8, 80, -4703820412808631804),
           (4, 2, 6, 1574, 12, 8, 80, -7469215199507856537),
           (4, 3, 6, 1574, 12, 8, 80, -6277602869820142155),
           (4, 4, 6, 1574, 12, 8, 80, 6081024030547605380),
           (4, 5, 6, 1574, 12, 8, 80, -466405748612098353),
           (5, 0, 4, 1402, 13, 9, 120, 3110912669842711912),
           (5, 1, 4, 1402, 13, 9, 120, -9121203659895500952),
           (5, 2, 4, 1402, 13, 9, 120, -6187311024440860274),
           (5, 3, 4, 1402, 13, 9, 120, -1483987272763522223),
           (6, 0, 2, 1112, 14, 9, 40, 8094966525662891366),
           (6, 1, 2, 1112, 14, 9, 40, 8507218394217963570),
           (7, 0, 2, 1134, 15, 9, 80, -4095237251491965018),
           (7, 1, 2, 1134, 15, 9, 80, 4607388956285829518),
           (8, 0, 4, 1525, 16, 9, 120, 7425530904890031179),
           (8, 1, 4, 1525, 16, 9, 120, -4066688147968010318),
           (8, 2, 4, 1525, 16, 9, 120, -7510166789537521340),
           (8, 3, 4, 1525, 16, 9, 120, -1592461599722943787),
           (9, 0, 3, 1370, 17, 9, 40, -604011673506681429),
           (9, 1, 3, 1370, 17, 9, 40, -2152566729713050997),
           (9, 2, 3, 1370, 17, 9, 40, -8073999650034763562))
           t(asset_id, frame_index, n_frames, n_bytes, decoded_width,
             decoded_height, decoded_frame_ms, stat_hash)"""
  )
}
