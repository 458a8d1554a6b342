package graft.operators

import java.awt.image.BufferedImage

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Report-artifact export: the reference's regional heatmap asset
  * (report.py:553-624 `acled_ua_heatmap`) renders a per-region event-count
  * map for a bounded window and publishes the image through a dedicated IO
  * manager (io_manager.py:127 `ReportsS3IOManager`). Re-expressed
  * Spark-first:
  *
  *   - the GRID is a distributed aggregation (map-side-combined count per
  *     region over a pushdown-bounded window) — the only part that touches
  *     the 100 TB table;
  *   - the RENDER collects exactly the tiny grid (one row per region — a
  *     bounded metadata collect, same class as the IVF centroid collect)
  *     and rasterizes it with the public JDK imaging stack;
  *   - the PUBLISH writes the PNG to the artifact path, and the returned
  *     verification frame DECODES THE PUBLISHED BYTES BACK, so the
  *     correctness gate covers render → publish → read-back end to end,
  *     not just the aggregation.
  *
  * The shade arithmetic is pure integer math (`255 - count*255 // max`) so
  * an external engine can replay grid AND pixel values exactly.
  */
object Report {

  /** Per-region event counts — the heatmap's data query
    * (report.py:578-586). The testdata's region key is `user_id % 10`
    * (region_fanout's proxy). One hash aggregate with partial (map-side)
    * combine; output cardinality = #regions, so the exchange ships a few
    * dozen rows per task no matter the input SF. */
  def regionCounts(events: DataFrame): DataFrame =
    events.groupBy(pmod(col("user_id"), lit(10L)).cast("int").as("region"))
      .agg(count(lit(1)).as("event_count"))

  /** Engine-portable shade: white (255) at zero events, black (0) at the
    * hottest region; pure integer floor division. */
  def shadeOf(count: Long, maxCount: Long): Int =
    255 - (count * 255L / math.max(1L, maxCount)).toInt

  /** The single source of the raster layout: regions ordered by id (cell
    * index = position in this order) and the max count the shade scale is
    * normalized to. Render and decode-verify both derive from HERE, so
    * the cell-index↔region mapping cannot drift between them. */
  private def layout(grid: Seq[(Int, Long)]): (Seq[(Int, Long)], Long) =
    (grid.sortBy(_._1), grid.map(_._2).foldLeft(1L)(math.max))

  /** Rasterize a (region → count) grid as a horizontal strip of gray
    * cells, one `cell`×`cell` square per region ordered by region id.
    * Deterministic bytes for a given grid (PNG encode of a fixed raster). */
  private[graft] def renderHeatmap(
      grid: Seq[(Int, Long)], cell: Int): Array[Byte] = {
    val (ordered, maxCount) = layout(grid)
    val img = new BufferedImage(cell * ordered.size, cell, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      ordered.zipWithIndex.foreach { case ((_, n), i) =>
        val s = shadeOf(n, maxCount)
        g.setColor(new java.awt.Color(s, s, s))
        g.fillRect(i * cell, 0, cell, cell)
      }
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Compute the grid, render it, publish the PNG to `path`, then decode
    * the PUBLISHED file back and return one row per region:
    * `(region, event_count, shade, decoded_shade)` — `decoded_shade` is
    * sampled from the written image at the region's cell center, so any
    * corruption anywhere in the render/publish/read chain breaks the
    * `shade = decoded_shade` equality the oracle asserts. An empty window
    * returns the empty frame and publishes nothing (a zero-width raster
    * is not a representable PNG). */
  def heatmapArtifact(spark: SparkSession, events: DataFrame, path: String,
      cell: Int = 32): DataFrame = {
    import spark.implicits._
    val grid = regionCounts(events)
      .collect() // bounded: one row per region
      .map(r => (r.getInt(0), r.getLong(1)))
      .toSeq
    if (grid.isEmpty) {
      // drop any previously-published PNG: a stale artifact must not
      // outlive the (empty) verification frame that supersedes it
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
      return Seq.empty[(Int, Long, Int, Int)]
        .toDF("region", "event_count", "shade", "decoded_shade")
    }
    val png = renderHeatmap(grid, cell)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, png)

    val published = ImageIO.read(new java.io.ByteArrayInputStream(
      java.nio.file.Files.readAllBytes(p)))
    val (ordered, maxCount) = layout(grid)
    val rows = ordered.zipWithIndex.map { case ((region, n), i) =>
      val decoded = published.getRGB(i * cell + cell / 2, cell / 2) & 0xff
      (region, n, shadeOf(n, maxCount), decoded)
    }
    rows.toDF("region", "event_count", "shade", "decoded_shade")
  }
}
