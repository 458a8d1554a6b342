package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Snapshot

class SnapshotSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val prev = Seq(
    (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, null: String)
  ).toDF("doc_id", "text")
  private val curr = Seq(
    (2L, "bravo"), (3L, "charlie EDITED"), (4L, null: String), (5L, "echo")
  ).toDF("doc_id", "text")

  test("diff: added/removed/changed classified; unchanged rows never materialize") {
    val got = Snapshot.diff(prev, curr, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 3L -> "changed", 5L -> "added"))
  }

  test("diff: a NULL-content doc present on both sides is unchanged, not added/removed") {
    // md5(NULL) = NULL — presence must come from the row, not the hash
    val got = Snapshot.diff(prev, curr, "doc_id", "text")
      .select("doc_id").as[Long].collect()
    assert(!got.contains(4L))
    // …and a null→content edit is CHANGED (null-safe comparison)
    val curr2 = curr.withColumn("text",
      org.apache.spark.sql.functions.coalesce($"text",
        org.apache.spark.sql.functions.lit("now filled")))
    val got2 = Snapshot.diff(prev, curr2, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got2(4L) === "changed")
  }

  test("diffSummary counts agree with the row-level diff plus the unchanged remainder") {
    val s = Snapshot.diffSummary(prev, curr, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().head
    assert(s === ((1L, 1L, 1L, 2L))) // added=5; removed=1; changed=3; unchanged=2,4
  }

  test("diff of identical snapshots is empty") {
    assert(Snapshot.diff(prev, prev, "doc_id", "text").count() === 0L)
  }

  test("diff over id-bucketed lakes: the full-outer join plans with no Exchange") {
    // the Snapshot scale claim, proven at the plan level: with both
    // versions bucketed by id (Sink.writeBucketed), the hash-projection
    // full-outer join inherits the bucket partitioning through the
    // (doc_id → id, md5 projection) alias and the one shuffle per side
    // disappears — at 100 TB the diff is then a zip of co-located files
    val bigPrev = (0L until 2000L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val bigCurr = (100L until 2100L).map(i =>
      (i, if (i % 50 == 0) s"doc $i body v2" else s"doc $i body")).toDF("doc_id", "text")
    graft.sources.Sink.writeBucketed(bigPrev, "snap_prev", Seq("doc_id"), buckets = 8)
    graft.sources.Sink.writeBucketed(bigCurr, "snap_curr", Seq("doc_id"), buckets = 8)
    val diff = Snapshot.diff(
      spark.table("snap_prev"), spark.table("snap_curr"), "doc_id", "text")
    val plan = diff.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed snapshot diff must be exchange-free:\n$plan")
    // and the answer is the unbucketed one
    val want = Snapshot.diff(bigPrev, bigCurr, "doc_id", "text")
      .select("doc_id", "status").as[(Long, String)].collect().toSet
    val got = diff.select("doc_id", "status").as[(Long, String)].collect().toSet
    assert(got === want && got.nonEmpty)
  }
}
