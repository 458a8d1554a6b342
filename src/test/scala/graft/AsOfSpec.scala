package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right row at or before each left time, per key") {
    val quotes = Seq( // (key, time, price)
      ("a", ts("2024-01-01 10:00:00"), 1.0),
      ("a", ts("2024-01-01 12:00:00"), 2.0),
      ("b", ts("2024-01-01 11:00:00"), 9.0)
    ).toDF("k", "qts", "price")
    val trades = Seq( // (key, time, qty)
      ("a", ts("2024-01-01 09:00:00"), 10L), // before any quote → null
      ("a", ts("2024-01-01 10:00:00"), 11L), // equal time → quote 1.0
      ("a", ts("2024-01-01 11:59:59"), 12L), // between → still 1.0
      ("a", ts("2024-01-01 13:00:00"), 13L), // after 12:00 → 2.0
      ("b", ts("2024-01-01 12:00:00"), 14L), // b's only quote
      ("c", ts("2024-01-01 12:00:00"), 15L)  // key with no quotes → null
    ).toDF("k", "tts", "qty")
    val got = AsOf.asofJoin(trades, quotes, Seq("k"), "tts", "qts", Seq("price"))
      .select("k", "qty", "asof_price")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    assert(got === Array(
      ("a", 10L, None), ("a", 11L, Some(1.0)), ("a", 12L, Some(1.0)),
      ("a", 13L, Some(2.0)), ("b", 14L, Some(9.0)), ("c", 15L, None)))
  }

  test("asofJoin preserves every left row and column") {
    val right = Seq(("a", ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "rts", "v")
    val left = Seq(("a", ts("2024-01-02 00:00:00"), "x", 42),
                   ("a", ts("2023-12-31 00:00:00"), "y", 43)).toDF("k", "lts", "tag", "n")
    val got = AsOf.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("v"))
    assert(got.columns.toSeq === Seq("k", "lts", "tag", "n", "asof_v"))
    assert(got.count() === 2)
  }

  test("asofJoin: multi-column payload is atomic; latest row's NULL field is kept") {
    // regression for the struct-payload fix: with per-column max_by the
    // latest row's NULL p1 would resurrect the older row's 1.0, stitching
    // fields from two different right rows
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), Option(1.0), Option("x")),
      ("a", ts("2024-01-01 11:00:00"), Option.empty[Double], Option("y"))
    ).toDF("k", "rts", "p1", "p2")
    val left = Seq(("a", ts("2024-01-01 12:00:00"), 1L)).toDF("k", "lts", "id")
    val got = AsOf.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("p1", "p2"))
      .select("id", "asof_p1", "asof_p2")
      .as[(Long, Option[Double], Option[String])].collect()
    assert(got === Array((1L, None, Some("y"))))
  }

  test("asofJoin matches a brute-force range join on random data") {
    val rnd = new scala.util.Random(7)
    val rights = (1 to 200).map(_ =>
      (rnd.nextInt(5).toString, new Timestamp(rnd.nextInt(100000) * 1000L), rnd.nextDouble()))
      .distinct.toDF("k", "rts", "v")
    val lefts = (1 to 300).map(i =>
      (rnd.nextInt(6).toString, new Timestamp(rnd.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "lts", "id")
    val got = AsOf.asofJoin(lefts, rights, Seq("k"), "lts", "rts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    // oracle: windowed max-by over the inequality join (fine at test scale)
    val want = lefts.as[(String, Timestamp, Long)].collect().map { case (k, lts, id) =>
      val cand = rights.as[(String, Timestamp, Double)].collect()
        .filter(r => r._1 == k && !r._2.after(lts))
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got === want)
  }
}
