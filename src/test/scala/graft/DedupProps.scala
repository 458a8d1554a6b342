package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Dedup

/** ScalaCheck properties for the dedup family (run by sbt's native
  * ScalaCheck framework alongside the ScalaTest suites). Spark jobs per
  * case are small; minSuccessfulTests is trimmed accordingly. */
object DedupProps extends Properties("Dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val wordPool: Seq[String] = (1 to 60).map(i => s"w$i")
  private val docGen: Gen[String] =
    Gen.chooseNum(8, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf(wordPool)).map(_.mkString(" ")))

  property("exactByHash keeps exactly one row per distinct text, idempotently") =
    forAll(Gen.listOfN(12, docGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Dedup.exactByHash(df, "text", "doc_id").cache()
      val n1 = once.count()
      val n2 = Dedup.exactByHash(once, "text", "doc_id").count()
      once.unpersist()
      n1 == texts.distinct.size.toLong && n2 == n1
    }

  property("latestWins emits one row per key: the max-order row") =
    forAll(Gen.listOfN(15, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 100L)))) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((k, ord), i) => (i.toLong, k, ord) }
        .toDF("event_id", "key", "ord")
      val got = Dedup.latestWins(df, Seq("key"), "ord", "event_id")
        .select("key", "ord").as[(Long, Long)].collect().toMap
      val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      got == expected
    }

  property("connectedComponents: endpoints co-labeled; label is the cluster min") =
    forAll(Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L)))) { raw =>
      val pairs = raw.filter(p => p._1 != p._2)
      pairs.isEmpty || {
        import spark.implicits._
        val comp = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        val edgesJoined = pairs.forall { case (a, b) => comp(a) == comp(b) }
        val labelIsMin = comp.groupBy(_._2)
          .forall { case (label, members) => members.keys.min == label }
        edgesJoined && labelIsMin
      }
    }

  property("minhash signature agreement estimates shingle Jaccard (k=64)") =
    forAll(docGen, docGen) { (ta, tb) =>
      import spark.implicits._
      val df = Seq((1L, ta), (2L, tb)).toDF("id", "text")
        .select(col("id"),
          Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("id"), col("sh"), Dedup.minhashSignature(col("sh"), 64).as("sig"))
      val rows = df.orderBy("id").as[(Long, Seq[String], Seq[Long])].collect()
      val (shA, sigA) = (rows(0)._2.toSet, rows(0)._3)
      val (shB, sigB) = (rows(1)._2.toSet, rows(1)._3)
      val trueJ =
        if (shA.isEmpty && shB.isEmpty) 1.0
        else shA.intersect(shB).size.toDouble / shA.union(shB).size
      val est = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / 64
      // k=64 → sd <= 0.0625; 0.35 is a >5-sigma band (deterministic per seed)
      math.abs(est - trueJ) <= 0.35
    }

  property("paraDedup matches a brute-force reference on random corpora") =
    forAll(Gen.listOfN(6, docGen)) { texts =>
      import spark.implicits._
      val w = 3
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.paraDedup(df, "doc_id", "text", window = w, minDf = 2)
        .as[(Long, Long, Long, Double, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
      // O(n²) reference over non-overlapping stride-w windows
      val toks = texts.map(_.toLowerCase.trim.split("\\s+").toSeq)
      val wins = toks.zipWithIndex.flatMap { case (ts, d) =>
        val starts = 0 until math.max((ts.length + w - 1) / w, 1)
        starts.map(p => (d.toLong, p, ts.slice(p * w, p * w + w).mkString(" ")))
      }
      val freq = wins.groupBy(_._3).view.mapValues(_.size).toMap
      texts.indices.forall { d =>
        val mine = wins.filter(_._1 == d)
        val rep = mine.count(x => freq(x._3) >= 2)
        val clean = mine.filter(x => freq(x._3) < 2).sortBy(_._2).map(_._3).mkString(" ")
        got(d.toLong) == ((mine.size.toLong, rep.toLong, clean))
      }
    }

  property("spanDedup matches a brute-force reference on random corpora") =
    forAll(Gen.listOfN(6, docGen)) { texts =>
      import spark.implicits._
      val w = 3
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.spanDedup(df, "doc_id", "text", window = w, minDf = 2)
        .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      // O(n²) reference: count every stride-1 window across the corpus,
      // mark repeated starts, union the covered intervals per doc
      val toks = texts.map(_.toLowerCase.trim.split("\\s+").toSeq)
      val wins = toks.zipWithIndex.flatMap { case (ts, d) =>
        val starts = 0 until math.max(ts.length - (w - 1), 1)
        starts.map(s => (d.toLong, s, ts.slice(s, s + w).mkString(" ")))
      }
      val freq = wins.groupBy(_._3).view.mapValues(_.size).toMap
      texts.indices.forall { d =>
        val n = toks(d).length
        val mine = wins.filter(_._1 == d)
        val rep = mine.filter(x => freq(x._3) >= 2).map(_._2).sorted
        val covered = rep.flatMap(s => s to math.min(s + w - 1, n - 1)).distinct.size
        val spans = rep.foldLeft((List.empty[Int], -1)) { case ((acc, prevEnd), s) =>
          val end = math.min(s + w - 1, n - 1)
          if (s > prevEnd) (s :: acc, end) else (acc, math.max(prevEnd, end))
        }._1.size
        got(d.toLong) == ((n.toLong, mine.size.toLong, rep.size.toLong,
          spans.toLong, covered.toLong))
      }
    }

  // multi-line doc generator: 1-5 lines drawn from a small line pool
  // (collisions likely) plus occasional punct/digit variants of a pool
  // line (must normalize together) and blank lines (exempt from counting)
  private val linePool: Seq[String] =
    (1 to 8).map(i => s"line alpha $i common words")
  private val lineGen: Gen[String] = Gen.frequency(
    5 -> Gen.oneOf(linePool),
    2 -> Gen.oneOf(linePool).map(l => l.toUpperCase + "!!!"),
    2 -> Gen.chooseNum(1, 6).map(n => (1 to n).map(k => s"uniq$k$n").mkString(" ")),
    1 -> Gen.const(""))
  private val mlDocGen: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, lineGen).map(_.mkString("\n")))

  property("lineDedup: ledger conserves lines; cut lines are exactly the corpus-repeated norms") =
    forAll(Gen.listOfN(10, mlDocGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.lineDedup(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      // brute-force reference in plain Scala
      def norm(l: String) = l.toLowerCase.replaceAll("[^a-z0-9 ]", "")
        .replaceAll("[0-9]+", "0").replaceAll(" +", " ")
        .replaceAll("^ +| +$", "")
      val all = texts.zipWithIndex.flatMap { case (t, i) =>
        t.split("\n", -1).map(l => (i.toLong, l, norm(l))) }
      val counts = all.filter(_._3.nonEmpty).groupBy(_._3).map { case (k, v) => k -> v.size }
      texts.indices.forall { i =>
        val id = i.toLong
        val lines = texts(i).split("\n", -1).toSeq
        val kept = lines.filter(l => norm(l).isEmpty || counts.getOrElse(norm(l), 0) < 2)
        val (nl, nc, cleaned) = out(id)
        nl == lines.size && nc == lines.size - kept.size &&
          cleaned == kept.mkString("\n")
      }
    }

  property("lineDedupAgainst is idempotent: re-running cleaned docs against the same index cuts nothing") =
    forAll(Gen.listOfN(8, mlDocGen), Gen.listOfN(8, mlDocGen)) { (corpusTexts, freshTexts) =>
      import spark.implicits._
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val fresh = freshTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val index = Dedup.lineIndex(corpus, "doc_id", "text").cache()
      val once = Dedup.lineDedupAgainst(fresh, "doc_id", "text", index)
        .select(col("id").as("doc_id"), col("cleaned_text").as("text")).cache()
      val twice = Dedup.lineDedupAgainst(once, "doc_id", "text", index)
      val ok = twice.agg(sum("n_cut")).collect()(0).getLong(0) == 0L
      index.unpersist(); once.unpersist()
      ok
    }
}
