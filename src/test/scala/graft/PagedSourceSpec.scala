package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame

class PagedSourceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def read(pages: Int = 4, pageSize: Int = 100): DataFrame =
    spark.read.format("graft.sources.paged.PagedSource")
      .option("pages", pages).option("pageSize", pageSize).load()

  test("one input partition per page; all pages delivered") {
    val df = read(pages = 5, pageSize = 50)
    assert(df.rdd.getNumPartitions === 5, "pages must map 1:1 to input partitions")
    assert(df.count() === 250)
    assert(df.select("page").distinct().as[Int].collect().sorted === (0 until 5).toArray)
  }

  test("event ids are globally unique and contiguous across pages") {
    val ids = read(pages = 3, pageSize = 10).select("event_id").as[Long].collect().sorted
    assert(ids === (0L until 30L).toArray)
  }

  test("deterministic: two reads produce identical rows") {
    val a = read().collect().map(_.toString).sorted
    val b = read().collect().map(_.toString).sorted
    assert(a === b)
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val plan = read().select("event_id", "value").queryExecution.executedPlan.toString
    assert(plan.contains("event_id") && !plan.contains("event_type"),
      s"pruned scan should not mention unused columns:\n$plan")
  }

  test("page filters prune input partitions (whole pages never fetched)") {
    val df = read(pages = 8, pageSize = 10)
    import org.apache.spark.sql.functions.col
    assert(df.filter(col("page") === 3).rdd.getNumPartitions === 1)
    assert(df.filter(col("page") >= 5).rdd.getNumPartitions === 3)
    assert(df.filter(col("page") >= 5).count() === 30)
    // row-level residual still applies on non-page columns
    assert(df.filter(col("page") >= 5 && col("event_id") % 2 === 0).count() === 15)
  }

  test("schema types round-trip (timestamp is a real TimestampType)") {
    val row = read(pages = 1, pageSize = 1).select("ts").collect().head
    assert(row.get(0).isInstanceOf[java.sql.Timestamp])
  }
}
