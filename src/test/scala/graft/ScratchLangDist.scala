package graft
import org.apache.spark.sql.functions._
import graft.operators.LangIdModel
object ScratchLangDist {
  def main(args: Array[String]): Unit = {
    // driver-side quick eval: seed self-classification + fresh margins
    def classify(text: String): (String, Double) = {
      val gs = LangIdModel.gramsJvm(LangIdModel.normalizeJvm(text))
      val scores = LangIdModel.langs.map { l =>
        val w = LangIdModel.weights(l)
        l -> gs.map(t => w(LangIdModel.bucketJvm(t))).sum
      }
      val sorted = scores.sortBy { case (l, s) => (-s, l) }
      val margin = if (gs.isEmpty) 0.0
        else (sorted(0)._2 - sorted(1)._2).toDouble / (gs.length * 1e6)
      (sorted(0)._1, margin)
    }
    var bad = 0
    LangIdModel.langs.foreach { lang =>
      LangIdModel.seedsFor(lang).foreach { s =>
        val (got, m) = classify(s)
        if (got != lang) { bad += 1; println(f"SEED-MISS $lang got=$got m=$m%.4f: ${s.take(40)}") }
      }
    }
    println(s"seed misses: $bad")
    val fresh = Seq(
      "en" -> "After dinner they sat outside and talked about the trip they wanted to take in the spring, watching the light fade over the hills.",
      "de" -> "Nach dem Abendessen saßen sie draußen und sprachen über die Reise, die sie im Frühling machen wollten, während das Licht verschwand.",
      "es" -> "Después de la cena se sentaron afuera y hablaron sobre el viaje que querían hacer en primavera, mirando cómo se apagaba la luz.",
      "fr" -> "Après le dîner, ils se sont assis dehors et ont parlé du voyage qu'ils voulaient faire au printemps, en regardant la lumière baisser.",
      "zh" -> "晚饭后他们坐在外面，谈论着春天想要去的旅行，看着远处山上的光慢慢消失。")
    fresh.foreach { case (want, t) =>
      val (got, m) = classify(t)
      println(f"FRESH $want -> $got m=$m%.4f ${if (got != want) "MISS" else ""}")
    }
    val junk = Seq("1234 5678 90 42 7 77 001 3.14", "xk jq zv wq pf gt hy", "(((((( )))))) []{}")
    junk.foreach { t => val (g, m) = classify(t); println(f"JUNK -> $g m=$m%.4f") }
    // corpus dist via Spark
    val spark = GraftSession.builder("scratch", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sc = LangIdModel.scored(docs, "doc_id", "text")
    sc.groupBy("lang", "route").count().orderBy(desc("count")).show(20)
    sc.agg(avg("margin"), expr("percentile(margin, 0.1)")).show()
    spark.stop()
  }
}
object ScratchLangGolden {
  def main(args: Array[String]): Unit = {
    graft.operators.LangIdModel.langs.foreach { l =>
      val w = graft.operators.LangIdModel.weights(l)
      val nz = w.count(_ != 0L).toLong
      val sum = w.sum
      val chk = w.zipWithIndex.map { case (v, b) =>
        val t = ((b + 1).toLong * v) % 1000000007L
        if (t < 0) t + 1000000007L else t
      }.sum % 1000000007L
      println(s"GOLDEN ('$l', ${nz}, ${sum}, ${chk}),")
    }
  }
}
