package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the payload of the
  * latest right row with `rightTime <= leftTime` on the same key — the
  * "state of the world when the event happened" lookup (e.g. each event
  * joined to the most recent prior risk score, price, or model version).
  *
  * Spark has no native as-of join; the naive encodings are a range
  * cross-join (|left|×|right| per key — dead at scale) or a per-key
  * collect. This one is a single hash shuffle on the key: both sides are
  * tagged and unioned, one window pass ordered by (time, side) propagates
  * the last-seen right payload onto every left row via
  * `last(ignoreNulls)` — O(n log n) per key for the sort, no pair blowup.
  */
object AsOf {

  /** Left as-of join. `payload` names the right-side columns to attach
    * (prefixed `asof_`); every left column is preserved. Right rows tie
    * with left rows at equal time as "at or before" (right wins). If the
    * right side can hold several rows per (key, time), pre-aggregate it —
    * otherwise which payload lands is order-dependent. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    require(keys.forall(lCols.contains), s"keys $keys must exist on the left side")
    val nullOf: (DataFrame, String) => Column =
      (df, c) => lit(null).cast(df.schema(c).dataType)
    // The payload travels as ONE struct column: last(ignoreNulls) then takes
    // a right row's payload tuple ATOMICALLY — the struct is non-null for
    // every right row even when individual fields are NULL, so the latest
    // right row's NULL field is attached as NULL (never an older row's
    // value), and a multi-column payload can never stitch fields from
    // different right rows.
    val pType = org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c)))
    // side 0 = right, side 1 = left: at equal timestamps the right row sorts
    // first, so its payload is visible to the left row (<= semantics)
    val l = left.select(
      (col(leftTime).as("__t") +: lit(1).as("__side") +: lCols.map(col)) :+
        lit(null).cast(pType).as("__p"): _*)
    val r = right.select(
      (col(rightTime).as("__t") +: lit(0).as("__side") +:
        lCols.map(c => if (keys.contains(c)) col(c) else nullOf(left, c).as(c))) :+
        struct(payload.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(
        (lCols.map(col) :+ col("__side")) :+
          last(col("__p"), ignoreNulls = true).over(w).as("__p"): _*)
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++
        payload.map(c => col("__p").getField(c).as(s"asof_$c")): _*)
  }
}
