package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) corpus interchange — the de-facto wire
  * format for LLM training corpora (the reference's fetch path likewise
  * lands JSON pages before columnarizing, base_assets.py:96-118). Parquet
  * stays the lake format; this is the boundary where third-party corpora
  * arrive, so the read side must survive the garbage real feeds contain.
  *
  * Scale shape: a JSONL read is a line-splittable text scan — Spark
  * parallelizes by byte ranges, so one 10 TB dump still fans out across
  * the cluster. Parsing is Jackson inside codegen'd `from_json`
  * machinery; corrupt lines are QUARANTINED per row (PERMISSIVE +
  * `_corrupt_record`), never a job failure — at corpus scale a feed with
  * one broken line in a billion must not kill the ingest, and silently
  * dropping it (DROPMALFORMED) loses the audit trail. The explicit
  * schema is non-negotiable: schema inference is a second full scan AND
  * a correctness hazard (a rare-typed field inferred from the first
  * sample misparses the tail).
  */
object Jsonl {

  /** Write a frame as JSONL text: one `to_json(struct(...))` line per row.
    * Plain codegen'd projection + text sink, no shuffle. */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** Read JSONL with an explicit contract schema and per-row corrupt
    * quarantine: returns the schema's columns plus `_corrupt_record`
    * (null for clean rows, the raw line for quarantined ones).
    *
    * Deliberately text-scan + `from_json`, NOT `spark.read.json`: the JSON
    * file source forbids any plan whose pruned schema is only the corrupt
    * column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which
    * is exactly what a quarantine audit ("count the bad lines") prunes to
    * — the documented workaround is caching the corpus, an anti-pattern at
    * scale. A text source has one fully-read column, so the restriction
    * never applies; `from_json` is codegen'd and Catalyst still prunes the
    * PARSED fields to what the query references (OptimizeJsonExprs). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", StringType)
    spark.read.text(path)
      .select(from_json(col("value"), withCorrupt, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__r"))
      .select(col("__r.*"))
  }

  /** Streaming variant of [[read]]: a file-source stream over a JSONL
    * landing prefix with the same explicit-schema + per-row quarantine
    * parse. `maxFilesPerTrigger` bounds per-micro-batch work — the knob
    * that keeps a catch-up drain over a month of backlog from becoming
    * one giant batch. The parse is the SAME `from_json` expression as the
    * batch path, so batch and stream cannot drift semantically. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 maxFilesPerTrigger: Int = 16): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", StringType)
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(path)
      .select(from_json(col("value"), withCorrupt, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__r"))
      .select(col("__r.*"))
  }

  /** Ingest profile over a quarantined read: per-group valid counts plus
    * one corrupt row — the check-result a JSONL load publishes before
    * the lake accepts the batch. One conditional-counter aggregate.
    *
    * The corrupt bucket is carried as an explicit `is_corrupt` FLAG
    * column, not a sentinel value in the group column: a sentinel (e.g.
    * the string "__corrupt") would silently merge any VALID row whose
    * group value happens to equal it into the quarantine row, corrupting
    * the telemetry. With the flag, the group value is nulled on corrupt
    * rows (the parser couldn't trust any parsed field on them anyway)
    * and no data value can collide with the quarantine bucket. */
  def ingestProfile(parsed: DataFrame, groupCol: String,
                    charsCol: String): DataFrame = {
    val corrupt = col("_corrupt_record").isNotNull
    parsed
      .groupBy(
        when(!corrupt, col(groupCol)).as(groupCol),
        corrupt.as("is_corrupt"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(!corrupt, col(charsCol))).as("total_chars"))
  }
}
