package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class DiversitySampleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // four well-separated modes on the axes of R^4, 12 members each, jittered
  // deterministically; plus a zero vector that must never enter. With
  // nlist=4 the md5-drawn centroids may land several-per-mode, but the
  // invariants below hold for ANY centroid draw — that is the point.
  private def modes: org.apache.spark.sql.DataFrame = {
    val rows = for {
      m <- 0 until 4
      j <- 0 until 12
    } yield {
      val base = Array.fill(4)(0.05f * ((m * 12 + j) % 3))
      base(m) = 1.0f + 0.01f * j
      ((m * 12 + j).toLong, base.toSeq)
    }
    (rows :+ (99L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
  }

  test("diversitySample: quota-bounded, round-robin prefix, zero vectors excluded") {
    val got = Similarity.diversitySample(modes, "vec_id", "embedding",
        k = 10, nlist = 4)
      .as[(Int, Long, Int, Int, Double)].collect()
    assert(got.map(_._1).sorted.toSeq === (1 to 10), "pick_order contiguous")
    assert(!got.map(_._2).contains(99L), "zero vector never enters")
    // quota = ceil(10/4) = 3: no cluster contributes more
    got.groupBy(_._3).foreach { case (c, rows) =>
      assert(rows.length <= 3, s"cluster $c over quota")
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).toSeq,
        s"cluster $c ranks not a 1..q prefix")
    }
    // the pick order interleaves: all rank-1 representatives precede any
    // rank-2 row, so every prefix of the output is itself balanced
    val firstRound = got.filter(_._4 == 1).map(_._1)
    val later = got.filter(_._4 > 1).map(_._1)
    assert(later.isEmpty || firstRound.max < later.min)
  }

  test("diversitySample: deterministic under repartitioning") {
    def run(parts: Int) = Similarity.diversitySample(
        modes.repartition(parts), "vec_id", "embedding", k = 10, nlist = 4)
      .as[(Int, Long, Int, Int, Double)].collect().sortBy(_._1).toSeq
    assert(run(2) === run(9))
  }

  test("diversitySample: in-cluster rank filter plans as a map-side WindowGroupLimit") {
    // the 100 TB guard: without InferWindowGroupLimit the per-cluster
    // window would ship whole clusters (corpus-sized partitions, nlist
    // tasks); with it each map partition ships <= quota rows per cluster
    val plan = Similarity.diversitySample(modes.repartition(5), "vec_id",
        "embedding", k = 10, nlist = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected a WindowGroupLimit node in:\n$plan")
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      "expected BOTH partial (below exchange) and final group-limits:\n" + plan)
  }

  test("diversitySample: k beyond the population returns every non-zero doc once") {
    val got = Similarity.diversitySample(modes, "vec_id", "embedding",
        k = 500, nlist = 4)
      .as[(Int, Long, Int, Int, Double)].collect()
    assert(got.map(_._2).sorted.toSeq === (0L until 48L).toSeq)
    assert(got.map(_._1).sorted.toSeq === (1 to 48))
  }
}
