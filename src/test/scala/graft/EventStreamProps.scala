package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.streaming.EventStream

/** ScalaCheck properties for the declarative session windows: the engine's
  * merge semantics must equal a brute-force gaps-and-islands reference on
  * arbitrary event sets — the same adversarial guarantee the span/para
  * dedup property tests give their operators, and an independent re-proof
  * of the boundary rule the DuckDB oracle encodes (touching windows
  * merge; only a gap STRICTLY greater than the session gap breaks). */
object EventStreamProps extends Properties("EventStream") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val gapMinutes = 30L

  // minute offsets chosen so exact-boundary gaps (== 30 min) occur often
  private val eventGen: Gen[(Long, Long)] =
    Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 16L).map(_ * 15L))

  private def referenceSessions(evs: Seq[(Long, Long, Double)])
      : Set[(Long, Long, Long, Long, Double)] =
    evs.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (acc @ cur :: rest, ev) =>
          if (ev._1 - cur.head._1 > gapMinutes) List(ev) :: acc
          else (ev :: cur) :: rest
        case (Nil, ev) => List(List(ev))
      }
      sessions.map { s =>
        val ts = s.map(_._1)
        (uid, ts.min, ts.max + gapMinutes, s.size.toLong, s.map(_._2).sum)
      }
    }.toSet

  property("sessionWindows equals brute-force gaps-and-islands on arbitrary events") =
    forAll(Gen.nonEmptyListOf(eventGen).map(_.take(24))) { raw =>
      import spark.implicits._
      val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
      // duplicate (uid, minute) pairs are legal — same-instant events join
      // the same session; value tags make the sums discriminating
      val evs = raw.zipWithIndex.map { case ((uid, min), i) =>
        (uid, min, 1.0 + i * 0.5)
      }
      val df = evs.zipWithIndex.map { case ((uid, min, v), i) =>
        Ev(i.toLong, new Timestamp(base + min * 60000L), uid, "click", v, "{}")
      }.toDF()
      val got = EventStream.sessionWindows(df, gap = s"$gapMinutes minutes")
        .as[(Timestamp, Timestamp, Long, Long, Double)].collect()
        .map { case (s, e, uid, n, v) =>
          (uid, (s.getTime - base) / 60000L, (e.getTime - base) / 60000L, n,
            math.rint(v * 1e6) / 1e6)
        }.toSet
      val want = referenceSessions(evs).map { case (uid, s, e, n, v) =>
        (uid, s, e, n, math.rint(v * 1e6) / 1e6)
      }
      got == want
    }
}
