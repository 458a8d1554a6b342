package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.NgramLm

/** ScalaCheck properties for the bigram-LM family: model arithmetic
  * internal consistency, probability-mass sanity, self-scoring
  * degeneracy, and token conservation — over random small corpora drawn
  * from a collision-heavy word pool (so bigram counts > 1 occur). */
object NgramLmProps extends Properties("NgramLm") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private val wordPool: Seq[String] = (1 to 8).map(i => s"w$i")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(wordPool)).map(_.mkString(" ")))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, docGen))

  private def toDf(texts: List[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  property("model: margins equal the bigram-count row sums; logp exact") =
    forAll(corpusGen) { texts =>
      val m = NgramLm.model(toDf(texts), "doc_id", "text")
        .select("w1", "w2", "c12", "c1", "v", "logp")
        .as[(String, String, Long, Long, Long, Double)](
          org.apache.spark.sql.Encoders.product).collect()
      val sums = m.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      m.forall { case (w1, _, c12, c1, v, logp) =>
        c1 == sums(w1) &&
          math.abs(logp - math.log((c12 + 1.0) / (c1 + 1.0 * v))) < 1e-12
      }
    }

  property("model: observed smoothed probability mass per w1 stays under 1") =
    forAll(corpusGen) { texts =>
      val m = NgramLm.model(toDf(texts), "doc_id", "text")
        .select("w1", "c12", "c1", "v")
        .as[(String, Long, Long, Long)](org.apache.spark.sql.Encoders.product)
        .collect()
      m.groupBy(_._1).forall { case (_, rows) =>
        val mass = rows.map(r => (r._2 + 1.0) / (r._3 + 1.0 * r._4)).sum
        mass <= 1.0 + 1e-9 // unseen-vocab smoothing mass stays reserved
      }
    }

  property("scoreAgainst(c, c) degenerates to score(c): zero OOV, equal rows") =
    forAll(corpusGen) { texts =>
      val df = toDf(texts)
      val cross = NgramLm.scoreAgainst(df, df, "doc_id", "text")
        .orderBy("doc_id").collect()
      val self = NgramLm.score(df, "doc_id", "text").orderBy("doc_id").collect()
      cross.forall(_.getLong(2) == 0L) &&
        cross.map(r => (r.getLong(0), r.getLong(1), r.get(3), r.get(4), r.get(5),
          r.getBoolean(6))).toSeq ==
        self.map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3), r.get(4),
          r.getBoolean(5))).toSeq
    }

  property("score: bigram counts conserve tokens; every doc classified") =
    forAll(corpusGen) { texts =>
      val got = NgramLm.score(toDf(texts), "doc_id", "text")
        .select("doc_id", "n_bigrams")
        .as[(Long, Long)](org.apache.spark.sql.Encoders.product).collect().toMap
      val want = texts.zipWithIndex.map { case (t, i) =>
        val n = t.trim.toLowerCase.split("\\s+").count(_.nonEmpty)
        i.toLong -> math.max(n - 1, 0).toLong
      }.toMap
      got == want
    }
}
