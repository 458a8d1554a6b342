package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (one country/event-type dominating the
  * feed — the reference's distribution check exists precisely because ACLED
  * data skews hard toward a few regions, acled_checks.py:886).
  *
  * AQE's skew-join handling only splits sort-merge join partitions at
  * runtime; these operators are the plan-level tools for the cases AQE
  * doesn't cover: hash aggregation whose reduce side would see one giant
  * key, and shuffle joins where one fact key floods a single task.
  */
object Skew {

  /** Deterministic row-spread salt in [0, n) over the given columns: a hot
    * key's rows scatter across n reduce buckets with no runtime randomness
    * AND no dependence on task/partition assignment —
    * `monotonically_increasing_id` would reassign ids on a mid-stage task
    * retry, re-shuffling a hot key differently across attempts. Content
    * hashing is stable under retries; rows identical on the salt columns
    * share a bucket, so prefer a high-cardinality stable column (a row id)
    * when one exists. Package-visible so SkewSpec asserts on the REAL
    * formula rather than an inlined copy. */
  private[graft] def saltCol(n: Int, rowCols: Seq[Column]): Column =
    pmod(xxhash64(rowCols: _*), lit(n.toLong)).cast("int")

  /** Spark's hash expressions reject MapType (unordered — no well-defined
    * hash), so the whole-row default salt must skip any column that
    * contains a map at any nesting depth. */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType    => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType  => containsMap(a.elementType)
      case _             => false
    }
  }

  /** The salt source: caller-named columns if given (the cheap, preferred
    * path — one stable high-cardinality column beats hashing the row), else
    * every hash-compatible column of the frame. A frame with NO hashable
    * column degenerates to a single bucket (salting disabled) rather than
    * failing the query. */
  private def saltSource(df: DataFrame, saltOn: Seq[Column]): Seq[Column] =
    if (saltOn.nonEmpty) saltOn
    else {
      val hashable = df.schema.fields.filterNot(f => containsMap(f.dataType))
      if (hashable.isEmpty) Seq(lit(0L)) else hashable.toSeq.map(f => col(f.name))
    }

  /** Two-phase salted stats aggregation: phase 1 aggregates (key, salt) —
    * a hot key's rows land on up to `salt` different reducers — phase 2
    * combines the per-salt partials into final count/sum/avg/min/max.
    * Results are identical to a direct groupBy (avg recombined as
    * sum/count, not averaged averages). Pass `saltOn` (e.g. the table's
    * unique id) to salt on a named stable column instead of the whole row —
    * cheaper per row, and immune to duplicate-row collapse. */
  def saltedStats(df: DataFrame, keyCol: Column, keyName: String,
                  valueCol: String, salt: Int = 16,
                  saltOn: Seq[Column] = Nil): DataFrame = {
    val partial = df
      .groupBy(keyCol.as(keyName), saltCol(salt, saltSource(df, saltOn)).as("__salt"))
      .agg(
        count(lit(1)).as("__cnt"), sum(valueCol).as("__sum"),
        min(valueCol).as("__min"), max(valueCol).as("__max"))
    partial.groupBy(keyName)
      .agg(
        sum("__cnt").as("event_count"),
        sum("__sum").as("total_value"),
        (sum("__sum") / sum("__cnt")).as("avg_value"),
        min("__min").as("min_value"),
        max("__max").as("max_value"))
  }

  /** Salted inner equi-join for a skewed fact side: the fact gets a salt in
    * [0, salt), the (small but not broadcast-small) build side is replicated
    * `salt`× with an exploded salt index, and the join key becomes
    * (key, salt) — a hot fact key now spreads over `salt` tasks instead of
    * flooding one. Build-side cost is `salt`× its row count; pick salt so
    * replicated-build still fits the shuffle comfortably. */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
                 salt: Int = 16, saltOn: Seq[Column] = Nil): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(salt, saltSource(fact, saltOn)))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
