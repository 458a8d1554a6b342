package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangIdModel

class LangIdModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Fresh paragraphs NOT in the seed corpus — the actual generalization
  // check. One per class, everyday prose.
  private val fresh = Seq(
    (1L, "en", "After dinner they sat outside and talked about the trip " +
      "they wanted to take in the spring, watching the light fade over the hills."),
    (2L, "de", "Nach dem Abendessen saßen sie draußen und sprachen über die " +
      "Reise, die sie im Frühling machen wollten, während das Licht verschwand."),
    (3L, "es", "Después de la cena se sentaron afuera y hablaron sobre el " +
      "viaje que querían hacer en primavera, mirando cómo se apagaba la luz."),
    (4L, "fr", "Après le dîner, ils se sont assis dehors et ont parlé du " +
      "voyage qu'ils voulaient faire au printemps, en regardant la lumière baisser."),
    (5L, "zh", "晚饭后他们坐在外面，谈论着春天想要去的旅行，看着远处山上的光慢慢消失。"))

  test("trained model classifies fresh text in all five languages, with margin") {
    val df = fresh.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text")
    val got = LangIdModel.scored(df, "doc_id", "text")
      .select("doc_id", "lang", "route", "margin")
      .as[(Long, String, String, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    fresh.foreach { case (id, want, _) =>
      val (_, lang, route, margin) = got(id)
      assert(lang === want, s"doc $id misclassified: got $lang want $want")
      assert(route === want, s"doc $id routed to $route (margin $margin)")
      assert(margin.exists(_ >= LangIdModel.minMargin),
        s"doc $id margin $margin below confidence gate")
    }
  }

  test("every seed sentence self-classifies (training sanity)") {
    val rows = for {
      (lang, li) <- LangIdModel.langs.zipWithIndex
      (s, j) <- seedsOf(lang).zipWithIndex
    } yield ((li * 100 + j).toLong, lang, s)
    val df = rows.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text")
    val got = LangIdModel.scored(df, "doc_id", "text")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    rows.foreach { case (id, want, s) =>
      assert(got(id) === want, s"seed misclassified ($want): $s")
    }
  }

  private def seedsOf(lang: String): Seq[String] = LangIdModel.seedsFor(lang)

  test("short, empty, and numeric docs route to und") {
    val df = Seq(
      (10L, ""), (11L, "ok"), (12L, "1234 5678 90 42 7 77 001 3.14"),
      (13L, "zz")).toDF("doc_id", "text")
    val got = LangIdModel.scored(df, "doc_id", "text")
      .select("doc_id", "route").as[(Long, String)].collect().toMap
    Seq(10L, 11L, 13L).foreach(id => assert(got(id) === "und", s"doc $id"))
    // the numeric doc has enough trigrams but no language signal: it must
    // not come out confidently labeled — either und or a sub-gate margin
    assert(got(12L) === "und", "numeric salad routed confidently")
  }

  test("empty doc: zero scores, null margin, n_grams 0") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val r = LangIdModel.scored(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_grams") === 0L)
    LangIdModel.langs.foreach(l => assert(r.getAs[Long](s"s_$l") === 0L))
    assert(r.isNullAt(r.fieldIndex("margin")))
    assert(r.getAs[String]("route") === "und")
  }

  test("JVM kernel replay: Spark scores equal a MessageDigest-side rescore") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(40)
    val sparkSide = LangIdModel.scored(docs, "doc_id", "text")
      .select(col("doc_id") +: col("n_grams") +:
        LangIdModel.langs.map(l => col(s"s_$l")): _*)
      .collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.select("doc_id", "text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val tris = LangIdModel.gramsJvm(LangIdModel.normalizeJvm(text))
        val row = sparkSide(id)
        assert(row.getLong(1) === tris.length.toLong, s"n_grams doc $id")
        LangIdModel.langs.zipWithIndex.foreach { case (l, i) =>
          val w = LangIdModel.weights(l)
          val want = tris.map(t => w(LangIdModel.bucketJvm(t))).sum
          assert(row.getLong(2 + i) === want, s"s_$l doc $id")
        }
    }
  }

  test("deterministic across repartitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val a = LangIdModel.scored(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = LangIdModel.scored(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("model check frame is internally consistent with the weights") {
    val rows = LangIdModel.modelCheck(spark)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet === LangIdModel.langs.toSet)
    LangIdModel.langs.foreach { l =>
      val w = LangIdModel.weights(l)
      val (_, nz, sum, chk) = rows(l)
      assert(nz === w.count(_ != 0L).toLong)
      assert(sum === w.sum)
      val want = w.zipWithIndex.map { case (v, b) =>
        val t = ((b + 1).toLong * v) % 1000000007L
        if (t < 0) t + 1000000007L else t
      }.sum % 1000000007L
      assert(chk === want)
    }
  }
}
