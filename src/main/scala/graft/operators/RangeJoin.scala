package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows whose `valueCol` falls inside a
  * right-side interval [lo, hi] — enrichment against tier tables, price
  * bands, IP ranges, geo bands.
  *
  * Spark's native plan for `l JOIN r ON v BETWEEN lo AND hi` is a
  * broadcast nested-loop (fine for a literal tier table, |left|×|right|
  * otherwise). This operator makes the join an EQUI-join on a grid cell:
  * each interval is exploded to the cells it overlaps, each value maps to
  * exactly one cell, the join key is the cell id, and the exact BETWEEN is
  * a post-filter. With `grid` chosen near the typical interval width the
  * blowup is ~1 cell per interval and the shuffle is hash-partitioned —
  * the standard large-scale interval-join shape.
  */
object RangeJoin {

  /** Inclusive-inclusive interval join (SQL BETWEEN semantics). A value
    * lands in one grid cell, so no pair is produced twice. */
  def rangeJoin(left: DataFrame, valueCol: String,
                right: DataFrame, loCol: String, hiCol: String,
                grid: Double): DataFrame = {
    require(grid > 0, "grid must be positive")
    val cellOf: Column => Column = c => floor(c / grid).cast("long")
    val l = left.withColumn("__cell", cellOf(col(valueCol)))
    val r = right.withColumn("__cell",
      explode(sequence(cellOf(col(loCol)), cellOf(col(hiCol)))))
    l.join(r, Seq("__cell"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__cell")
  }
}
