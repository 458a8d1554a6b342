package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sample

class DomainCapSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // zipfian-ish domains: one mega-domain (the skew case the two-phase
  // ranking exists for), a mid one, and one under the cap
  private lazy val docs = ((1 to 3000).map(i => (i.toLong, "mega")) ++
    (3001 to 3200).map(i => (i.toLong, "mid")) ++
    (3201 to 3205).map(i => (i.toLong, "tiny")))
    .toDF("doc_id", "source").cache()

  test("domainCap: exact cap per domain; equals the single-window answer") {
    val got = Sample.domainCap(docs, "doc_id", "source", cap = 25, salts = 8)
    val perDomain = got.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perDomain("mega") === 25L)
    assert(perDomain("mid") === 25L)
    assert(perDomain("tiny") === 5L) // under the cap: everything kept
    // the two-phase salted form must equal the naive single window
    val pri = md5(concat_ws(":", col("source"), col("doc_id").cast("string")))
    val naive = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(pri.asc, col("doc_id").asc)))
      .filter(col("rk") <= 25)
    assert(got.select("doc_id", "source", "rk").exceptAll(naive).isEmpty &&
      naive.exceptAll(got.select("doc_id", "source", "rk")).isEmpty)
  }

  test("domainCap: deterministic under repartitioning and salt count") {
    val a = Sample.domainCap(docs, "doc_id", "source", 25, salts = 8)
      .select("doc_id", "rk").as[(Long, Int)].collect().toSet
    val b = Sample.domainCap(docs.repartition(13), "doc_id", "source", 25, salts = 3)
      .select("doc_id", "rk").as[(Long, Int)].collect().toSet
    assert(a === b)
  }

  test("domainCapStats: holdings vs kept, capped flag") {
    val stats = Sample.domainCapStats(docs, "doc_id", "source", cap = 25)
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(stats("mega") === (("mega", 3000L, 25L, true)))
    assert(stats("mid") === (("mid", 200L, 25L, true)))
    assert(stats("tiny") === (("tiny", 5L, 5L, false)))
  }
}
