package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Report

class ReportSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("shadeOf: integer floor math, white at zero, black at max") {
    assert(Report.shadeOf(0L, 100L) === 255)
    assert(Report.shadeOf(100L, 100L) === 0)
    assert(Report.shadeOf(50L, 100L) === 128) // 255 - 127
    assert(Report.shadeOf(1L, 3L) === 255 - 85)
    assert(Report.shadeOf(5L, 0L) === 255 - 1275, "maxCount guard divides by 1, never 0")
  }

  test("renderHeatmap: deterministic bytes, decodable, cell-accurate") {
    val grid = Seq((0, 10L), (1, 40L), (2, 25L), (3, 0L))
    val a = Report.renderHeatmap(grid, cell = 8)
    val b = Report.renderHeatmap(grid.reverse, cell = 8) // order-insensitive
    assert(java.util.Arrays.equals(a, b), "same grid (any order) → same PNG bytes")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    assert(img.getWidth === 32 && img.getHeight === 8)
    // PNG is lossless: each cell center must carry exactly its shade
    grid.foreach { case (r, n) =>
      val got = img.getRGB(r * 8 + 4, 4) & 0xff
      assert(got === Report.shadeOf(n, 40L), s"region $r shade mismatch")
    }
  }

  test("heatmapArtifact: publish + decode-back round trip on a real frame") {
    val events = Seq(
      (1L, 3L, 5.0), (2L, 13L, 1.0), (3L, 3L, 2.0), (4L, 7L, 9.0), (5L, 3L, 4.0)
    ).toDF("event_id", "user_id", "value")
    val path = java.nio.file.Files.createTempDirectory("graft_report").toString + "/hm.png"
    val out = Report.heatmapArtifact(spark, events, path, cell = 4)
      .orderBy("region").collect()
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path)), "artifact published")
    // regions present: 3 (users 3, 13, 3, 3 → count 4, the max), 7 (count 1)
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((3, 4L), (7, 1L)))
    out.foreach { r =>
      assert(r.getInt(2) === r.getInt(3),
        s"region ${r.getInt(0)}: claimed shade ${r.getInt(2)} != decoded ${r.getInt(3)}")
    }
  }
}
