package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** One shared tuned session across all suites (sbt runs suites in a single
  * forked JVM; re-creating SparkContexts per suite dominates test time). */
trait SparkSpec { self: Suite =>
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("graft-test", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
