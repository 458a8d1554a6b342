package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecOps

class VecOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("matvecCol: matches a plain Scala mat-vec") {
    val mat = Seq(Seq(1.0, 2.0, 3.0), Seq(0.5, -1.0, 4.0))
    val vecs = Seq((1L, Seq(2.0, 0.0, 1.0)), (2L, Seq(-1.0, 3.0, 0.25)))
    val got = vecs.toDF("id", "v")
      .select(col("id"), VecOps.matvecCol(col("v"), mat).as("r"))
      .as[(Long, Seq[Double])].collect().toMap
    def ref(v: Seq[Double]): Seq[Double] =
      mat.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    assert(got(1L) === ref(vecs(0)._2))
    assert(got(2L) === ref(vecs(1)._2))
  }

  test("matvecCol: ragged or empty matrices are rejected at plan-build time") {
    intercept[IllegalArgumentException] {
      VecOps.matvecCol(col("v"), Seq(Seq(1.0, 2.0), Seq(3.0)))
    }
    intercept[IllegalArgumentException] {
      VecOps.matvecCol(col("v"), Seq.empty)
    }
  }

  test("matvec kernel: a vector narrower than the matrix width fails loudly") {
    val df = Seq((1L, Seq(1.0))).toDF("id", "v") // width-2 matrix below
    val ex = intercept[Throwable] {
      df.select(VecOps.matvecCol(col("v"), Seq(Seq(1.0, 2.0)))).collect()
    }
    // the require message must survive Spark's task-failure wrapping
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("matvec")), s"got: ${messages(ex)}")
  }

  test("matvec kernel: a vector WIDER than the matrix width fails loudly too") {
    // prefix-truncation would silently return plausible numbers from a
    // dimension mismatch — both directions must reject
    val df = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v") // width-2 matrix below
    val ex = intercept[Throwable] {
      df.select(VecOps.matvecCol(col("v"), Seq(Seq(1.0, 2.0)))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("matvec")), s"got: ${messages(ex)}")
  }
}
