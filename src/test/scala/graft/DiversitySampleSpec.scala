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

  // ----- trained form (diversity_sample_trained): Lloyd centroids -----

  // one deliberately DENSE mode: mode 0 has 36 members, modes 1-3 have 12
  // — the exact skew a uniform draw over-represents (36/72 = 50% of the
  // corpus) and cluster-balanced selection exists to defuse
  private def skewedModes: org.apache.spark.sql.DataFrame = {
    val rows = for {
      m <- 0 until 4
      j <- 0 until (if (m == 0) 36 else 12)
    } yield {
      val base = Array.fill(4)(0.05f * (j % 3))
      base(m) = 1.0f + 0.01f * j
      ((m * 100 + j).toLong, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("trained: lloydCentroids deterministic under repartitioning") {
    def fit(parts: Int): Seq[Seq[Double]] =
      Similarity.lloydCentroids(skewedModes.repartition(parts), "vec_id",
        "embedding", nlist = 4)
    // bit-identical, not approximately equal: the hash-ordered training
    // sample and fixed-iteration pure-double kernel admit no layout noise
    assert(fit(2) === fit(9))
  }

  test("trained: dense cluster cannot over-draw; every prefix stays balanced") {
    val cents = Similarity.lloydCentroids(skewedModes, "vec_id", "embedding",
      nlist = 4)
    val got = Similarity.diversitySample(skewedModes, "vec_id", "embedding",
        k = 12, centroids = Some(cents))
      .as[(Int, Long, Int, Int, Double)].collect()
    assert(got.map(_._1).sorted.toSeq === (1 to 12), "pick_order contiguous")
    // quota = ceil(12/4) = 3: the dense mode holds 50% of the corpus but
    // NO cluster — dense or not — contributes more than quota rows
    got.groupBy(_._3).foreach { case (c, rows) =>
      assert(rows.length <= 3, s"cluster $c over quota")
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).toSeq,
        s"cluster $c ranks not a 1..q prefix")
    }
    // balanced selection caps the dense mode's share at quota × (centers
    // Lloyd placed on it) — NOT its 50% corpus share, and never the whole
    // budget a prototypicality top-k would hand it. (Lloyd may legally
    // split the dense mode across several centers; the cap is per-cluster.)
    val denseCenters = cents.count(c => c.indexOf(c.max) == 0)
    assert(denseCenters < 4, "degenerate fit: every center on the dense mode")
    val denseModePicks = got.count(_._2 < 100L)
    assert(denseModePicks <= 3 * denseCenters,
      s"dense mode drew $denseModePicks > quota×$denseCenters centers")
    // prefix balance: all rank-r rows precede any rank-(r+1) row
    val byRank = got.groupBy(_._4).view.mapValues(_.map(_._1)).toMap
    byRank.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(byRank(a).max < byRank(b).min,
        s"rank-$a rows do not all precede rank-$b rows")
      case _ => ()
    }
  }

  test("trained: end-to-end fit+select deterministic under repartitioning") {
    def run(parts: Int): Seq[(Int, Long, Int, Int, Double)] = {
      val df = skewedModes.repartition(parts)
      val cents = Similarity.lloydCentroids(df, "vec_id", "embedding",
        nlist = 4)
      Similarity.diversitySample(df, "vec_id", "embedding", k = 12,
          centroids = Some(cents))
        .as[(Int, Long, Int, Int, Double)].collect().sortBy(_._1).toSeq
    }
    assert(run(2) === run(9))
  }

  // golden re-derivation helper for the diversity_sample_trained VALUES
  // oracle in SparkEntry.oracleSql — run on gate-corpus (SF) change:
  //   sbt "Test/testOnly graft.DiversitySampleSpec -- -n golden" won't run
  //   ignored tests; temporarily flip `ignore` to `test` and run the suite.
  ignore("printGolden: re-derive the diversity_sample_trained oracle rows") {
    val df = SparkEntry.queries("diversity_sample_trained")(
      spark, "/root/testdata/sf0.01")
    val rows = df.orderBy("pick_order").collect()
    rows.foreach(r => println(
      s"(${r.getInt(0)},${r.getLong(1)},${r.getInt(2)},${r.getInt(3)}),"))
    println(s"n=${rows.length}")
  }
}
