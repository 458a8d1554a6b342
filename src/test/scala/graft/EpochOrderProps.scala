package graft

import java.security.MessageDigest

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Sample

/** ScalaCheck properties for the epoch-order permutation: the Spark
  * kernel is replayed by an INDEPENDENT driver-side implementation of
  * the same md5 arithmetic (java.security.MessageDigest, not Spark's
  * md5), so a drift in the key format, the shard prefix width, or the
  * in-shard ordering breaks equality on arbitrary id sets — not just
  * the dense 0..n ranges the spec uses. */
object EpochOrderProps extends Properties("EpochOrder") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The naive model: same key, same prefix-mod shard, same
    * (key, id) in-shard order, 1-based positions. */
  private def model(ids: Seq[Long], epoch: Int,
                    shards: Int): Seq[(Int, Int, Long)] = {
    val keyed = ids.map(id => (id, md5hex(s"ep:$epoch:$id")))
    keyed.groupBy { case (_, k) =>
      (java.lang.Long.parseLong(k.take(4), 16) % shards).toInt
    }.toSeq.flatMap { case (shard, members) =>
      members.sortBy { case (id, k) => (k, id) }.zipWithIndex
        .map { case ((id, _), i) => (shard, i + 1, id) }
    }.sortBy(r => (r._1, r._2))
  }

  private val idsGen: Gen[List[Long]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 5000000L)).map(_.distinct))

  property("epochOrder equals an independent MessageDigest replay") =
    forAll(idsGen, Gen.chooseNum(0, 5), Gen.chooseNum(1, 9)) {
      (ids, epoch, shards) =>
        import spark.implicits._
        val got = Sample.epochOrder(ids.toDF("doc_id"), "doc_id",
            epoch, shards)
          .as[(Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
        got == model(ids, epoch, shards)
    }

  property("slots are a bijection: every id exactly once, pos dense per shard") =
    forAll(idsGen, Gen.chooseNum(0, 3), Gen.chooseNum(1, 5)) {
      (ids, epoch, shards) =>
        import spark.implicits._
        val got = Sample.epochOrder(ids.toDF("doc_id"), "doc_id",
            epoch, shards)
          .as[(Int, Int, Long)].collect()
        got.map(_._3).sorted.toSeq == ids.sorted &&
          got.groupBy(_._1).forall { case (_, rows) =>
            rows.map(_._2).sorted.toSeq == (1 to rows.length)
          }
    }
}
