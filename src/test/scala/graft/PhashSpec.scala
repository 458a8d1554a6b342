package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Perceptual-hash image dedup tier: dHash64's integer grid arithmetic,
  * container-invariance (PNG vs BMP), resize robustness on structured
  * images, banded pair recovery, the hot-bucket guard, and the exact
  * byte-hash tier. Reference behavior anchor: the asset-artifact tier the
  * reference publishes (io_manager.py:127) never dedups assets — this is
  * the dedup-mandate extension over decoded multimodal columns. */
class PhashSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._


  private def decode(b: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(b)))

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private lazy val docs = Seq(
    (0L, "first planted doc with enough text to render"),
    (1L, "second doc, distinct content entirely"),
    (2L, "third doc is also its own image"),
    (3L, "fourth doc for the plant families"),
    (4L, "fifth and final plant seed document"),
    (5L, "a non-planted corpus document"),
    (6L, "another non-planted corpus document")
  ).toDF("doc_id", "text")

  test("dHash64: container-invariant — BMP re-encode of the same raster hashes identically") {
    val mm = Multimodal.asMultimodal(docs, "doc_id", "text")
    mm.select(col("payload")).as[Array[Byte]].collect().foreach { png =>
      val img = decode(png)
      val viaBmp = {
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        javax.imageio.ImageIO.write(img, "bmp", ios)
        ios.close(); decode(bos.toByteArray)
      }
      assert(Multimodal.dHash64(img) === Multimodal.dHash64(viaBmp))
    }
  }

  test("dHash64: smooth plants survive a half-resize within hamming 3; distinct seeds stay far") {
    val hashes = (0 until 5).map { g =>
      val full = Multimodal.smoothImage(g, 54 + 18 * g, 48 + 16 * g)
      val half = Multimodal.boxHalf(full)
      val (hf, hh) = (Multimodal.dHash64(full), Multimodal.dHash64(half))
      info(f"smooth g=$g resize hamming=${hamming(hf, hh)}")
      assert(hamming(hf, hh) <= 3,
        s"resize plant g=$g drifted ${hamming(hf, hh)} bits")
      hf
    }
    for (i <- hashes.indices; j <- hashes.indices if i < j) {
      info(f"smooth pair ($i,$j) hamming=${hamming(hashes(i), hashes(j))}")
      assert(hamming(hashes(i), hashes(j)) > 7,
        s"smooth seeds $i/$j landed within the near-dup band of each other")
    }
  }

  test("dHash64: distinct noise images are far apart (no accidental near-dups)") {
    val hs = Multimodal.imagePhash(Multimodal.asMultimodal(docs, "doc_id", "text"))
      .orderBy("asset_id").as[(Long, Long)].collect()
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(hamming(hs(i)._2, hs(j)._2) > 7,
        s"noise docs ${hs(i)._1}/${hs(j)._1} collided perceptually")
  }

  test("phashNearDups: recovers all pairs within the banding guarantee, at both band widths") {
    // constructive: flip exactly maxHamming bits spread across bands
    val base = 0x5A5A5A5A5A5A5A5AL
    val within3 = base ^ ((1L << 0) | (1L << 20) | (1L << 40))
    val within7 = base ^ 0x7FL // 7 flips, all inside band 0
    val far = ~base
    val df = Seq((1L, base), (2L, within3), (3L, within7), (4L, far))
      .toDF("asset_id", "phash")
    val p16 = Multimodal.phashNearDups(df, maxHamming = 3, bandBits = 16)
      .as[(Long, Long, Int)].collect().toSet
    assert(p16 === Set((1L, 2L, 3)))
    val p8 = Multimodal.phashNearDups(df, maxHamming = 7, bandBits = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(p8.contains((1L, 3L, 7)) && p8.contains((1L, 2L, 3)) && !p8.exists(p => p._2 == 4L))
  }

  test("phashNearDups: hot-bucket guard drops oversize buckets; banding require rejects bad dials") {
    // 5 identical hashes: every (band, value) bucket holds all 5; with
    // maxBucket=4 every bucket is dropped, so no pairs emerge (the
    // simhash guard semantics: trade a boilerplate cluster for a bound)
    val clones = (1L to 5L).map((_, 0x1234567812345678L)).toDF("asset_id", "phash")
    assert(Multimodal.phashNearDups(clones, maxBucket = 4).count() === 0)
    assert(Multimodal.phashNearDups(clones).count() === 10) // default cap keeps them
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDups(clones, maxHamming = 4, bandBits = 16)
    }
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDups(clones, bandBits = 32)
    }
  }

  test("plantedAssets + exactAssetPairs: byte tier catches exact copies only; phash adds re-encodes and resizes") {
    val corpus = Multimodal.plantedAssets(docs, "doc_id", "text", nPlants = 3)
    // 7 originals + 3x(exact, bmp) + 3x(smooth, resized) = 19 assets
    assert(corpus.count() === 19)
    val exact = Multimodal.exactAssetPairs(corpus).as[(Long, Long)].collect().toSet
    assert(exact === (0 until 3).map(d =>
      (d.toLong, d + Multimodal.ExactCopyBase)).toSet)
    val pairs = Multimodal.phashNearDups(
      Multimodal.imagePhash(corpus), maxHamming = 3, bandBits = 16)
      .as[(Long, Long, Int)].collect()
    val byKey = pairs.map(p => (p._1, p._2) -> p._3).toMap
    (0 until 3).foreach { d =>
      // noise family: original, exact copy, bmp re-encode — all hamming 0
      assert(byKey((d.toLong, d + Multimodal.ExactCopyBase)) === 0)
      assert(byKey((d.toLong, d + Multimodal.ReencodeBase)) === 0)
      assert(byKey((d + Multimodal.ExactCopyBase, d + Multimodal.ReencodeBase)) === 0)
      // smooth family: the resized copy is recovered
      assert(byKey.contains((Multimodal.SmoothBase + d, Multimodal.ResizedBase + d)))
    }
    // ...and nothing else pairs: 3 families x 3 pairs + 3 resize pairs
    assert(pairs.length === 12)
  }
}
