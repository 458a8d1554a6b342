package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Dsir

/** ScalaCheck properties for the DSIR family, over random small corpora
  * drawn from a collision-heavy word pool (so bucket counts > 1 occur)
  * with a random target slice. The strongest gate is the first: the
  * two-pass Spark kernel is replayed by an INDEPENDENT driver-side
  * naive implementation of the histogram arithmetic — same tokenize,
  * same md5-prefix buckets, same smoothing — so a regression in either
  * pass (marginals or scoring) breaks equality on arbitrary corpora,
  * not just the hand-built spec examples. */
object DsirProps extends Properties("Dsir") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private val B = 64

  private val wordPool: Seq[String] = (1 to 8).map(i => s"w$i")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(wordPool)).map(_.mkString(" ")))
  // (text, isTarget) — at least one target doc so T > 0 is typical, but
  // all-raw corpora are legal too (the arithmetic degrades gracefully)
  private val corpusGen: Gen[List[(String, Boolean)]] =
    Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.zip(docGen, Gen.oneOf(true, false))))

  private def toDf(docs: List[(String, Boolean)]) = {
    import spark.implicits._
    docs.zipWithIndex.map { case ((t, tgt), i) => (i.toLong, t, tgt) }
      .toDF("doc_id", "text", "tgt")
  }

  /** The naive reference: per-doc hashed-feature multiset via plain Scala
    * (MessageDigest md5, same first-4-hex-prefix bucket arithmetic),
    * histogram-form weight Σ n·logratio rounded at 4dp. */
  private def naiveWeights(docs: List[(String, Boolean)])
      : Map[Long, (Long, Option[Double])] = {
    def toks(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8")).take(2)
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % B
    }
    val feats: Map[Long, Seq[(Long, Boolean)]] = docs.zipWithIndex.map {
      case ((t, tgt), i) =>
        val ws = toks(t)
        val fs = ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
        i.toLong -> fs.map(f => (bucket(f), tgt))
    }.toMap
    val all = feats.values.flatten.toSeq
    val r = all.size.toDouble
    val t = all.count(_._2).toDouble
    val cr = all.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val ct = all.filter(_._2).groupBy(_._1).view
      .mapValues(_.size.toDouble).toMap
    def logratio(b: Long): Double =
      math.log((ct.getOrElse(b, 0.0) + 1.0) / (t + B)) -
        math.log((cr(b) + 1.0) / (r + B))
    docs.zipWithIndex.map { case (_, i) =>
      val fs = feats(i.toLong)
      val w =
        if (fs.isEmpty) None
        else Some(math.rint(fs.map(f => logratio(f._1)).sum * 1e4) / 1e4)
      i.toLong -> (fs.size.toLong, w)
    }.toMap
  }

  property("two-pass kernel equals an independent naive replay on random corpora") =
    forAll(corpusGen) { docs =>
      val got = Dsir.weights(toDf(docs), col("tgt"), "doc_id", "text",
          buckets = B).collect()
        .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_feats"),
          Option(r.get(r.fieldIndex("weight")))
            .map(_.asInstanceOf[Double]))).toMap
      got == naiveWeights(docs)
    }

  property("precomputed dense ratioTable scores identically to self-estimation") =
    forAll(corpusGen) { docs =>
      val df = toDf(docs)
      val rt = Dsir.ratioTable(df, col("tgt"), "doc_id", "text", buckets = B)
      val self = Dsir.weights(df, col("tgt"), "doc_id", "text", buckets = B)
        .collect().map(_.toSeq).toSet
      val pre = Dsir.weights(df, col("tgt"), "doc_id", "text", buckets = B,
        ratio = Some(rt)).collect().map(_.toSeq).toSet
      rt.size == B && self == pre
    }

  property("keep is exactly weight >= 0, false on unscoreable docs") =
    forAll(corpusGen) { docs =>
      Dsir.weights(toDf(docs), col("tgt"), "doc_id", "text", buckets = B)
        .collect().forall { r =>
          val w = Option(r.get(r.fieldIndex("weight")))
            .map(_.asInstanceOf[Double])
          r.getAs[Boolean]("keep") == w.exists(_ >= 0.0)
        }
    }

  property("mixShift census reconciles with per-doc weights per source") =
    forAll(corpusGen) { docs =>
      val df = toDf(docs).withColumn("source",
        when(col("doc_id") % 2 === 0, "even").otherwise("odd"))
      val w = df.select("doc_id", "source").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
      val perDoc = Dsir.weights(df, col("tgt"), "doc_id", "text",
          buckets = B).collect()
        .map(r => (w(r.getAs[Long]("doc_id")), r.getAs[Boolean]("keep"),
          Option(r.get(r.fieldIndex("weight"))).map(_.asInstanceOf[Double])))
      val census = Dsir.mixShift(df, col("tgt"), "doc_id", "text", "source",
        buckets = B).collect()
      census.forall { row =>
        val src = row.getAs[String]("source")
        val mine = perDoc.filter(_._1 == src)
        row.getAs[Long]("n_docs") == mine.size.toLong &&
          row.getAs[Long]("n_kept") == mine.count(_._2).toLong
      } && census.map(_.getAs[Long]("n_docs")).sum == docs.size.toLong
    }

  property("resample ranks are 1..min(k, scoreable) and members are scoreable docs") =
    forAll(corpusGen, Gen.chooseNum(1, 8)) { (docs, k) =>
      val df = toDf(docs)
      val scoreable = Dsir.weights(df, col("tgt"), "doc_id", "text",
          buckets = B).filter(col("weight").isNotNull)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val r = Dsir.resample(df, col("tgt"), "doc_id", "text", k = k,
        buckets = B).collect()
      r.length == math.min(k, scoreable.size) &&
        r.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to r.length) &&
        r.forall(row => scoreable.contains(row.getAs[Long]("doc_id")))
    }
}
