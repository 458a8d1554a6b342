package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("tokenCounts: whitespace and regex token counters") {
    val df = Seq((1L, "Hello world 42 foo-bar")).toDF("doc_id", "text")
    val got = TextOps.tokenCounts(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()(0)
    // ws: 4 tokens; regex [a-z]+|[0-9]+: ello, world, 42, foo, bar = 5
    assert(got === ((1L, 4L, 5L, 22L)))
  }

  test("tokenCounts matches a driver-side model on seeded random text") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 10).map { i =>
      val words = Seq.fill(1 + rnd.nextInt(12))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      (i.toLong, words.mkString(" "))
    }
    val got = TextOps.tokenCounts(cases.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    cases.zip(got).foreach { case ((_, text), (_, ws, _, chars)) =>
      assert(ws === text.trim.split("\\s+").length.toLong, s"text=<$text>")
      assert(chars === text.length.toLong)
    }
  }

  test("qualityScore: stopword ratio and composite score") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextOps.qualityScore(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_words") === 6L)
    assert(r.getAs[Long]("n_stopwords") === 2L)
    assert(r.getAs[Double]("stopword_ratio") === 0.3333)
    // 17 non-space chars / 6 words
    assert(r.getAs[Double]("avg_word_len") === 2.8333)
    // min(6/100,1) * (1-0.3333) = 0.06 * 0.6667
    assert(r.getAs[Double]("quality_score") === 0.04)
  }

  test("langId: detects each profiled language deterministically") {
    val df = Seq(
      (1L, "the cat is in the house and that is fine"),
      (2L, "der hund ist nicht in das haus und die katze"),
      (3L, "le chat est dans la maison et les chiens"),
      (4L, "el gato es una maravilla y los perros en la casa"),
      (5L, "我是他的朋友这是我的家他有一个好主意")
    ).toDF("doc_id", "text")
    val got = TextOps.langId(df, "doc_id", "text")
      .orderBy("doc_id").select("detected_lang").as[String].collect()
    assert(got === Array("en", "de", "fr", "es", "zh"))
  }

  test("tfIdfTopTerms: corpus-wide terms score zero, rare terms rank first") {
    val docs = Seq(
      (1L, "common alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma gamma gamma")
    ).toDF("doc_id", "text")
    val got = TextOps.tfIdfTopTerms(docs, "doc_id", "text", topN = 2)
      .select("doc_id", "term", "tfidf", "rank")
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // 'common' appears in all 3 docs → idf = ln(1) = 0 → never rank 1
    assert(got(1L).head._2 === "alpha")
    assert(got(2L).head._2 === "beta")
    assert(got(3L).head._2 === "gamma")
    // tfidf = tf * ln(3/1): alpha 2×, beta 1×, gamma 3×
    assert(math.abs(got(1L).head._3 - 2 * math.log(3.0)) < 1e-5)
    assert(math.abs(got(2L).head._3 - 1 * math.log(3.0)) < 1e-5)
    assert(math.abs(got(3L).head._3 - 3 * math.log(3.0)) < 1e-5)
    // rank-2 term is 'common' with score exactly 0 in every doc
    assert(got.values.forall(v => v(1)._2 == "common" && v(1)._3 == 0.0))
  }

  test("fingerprint: order-sensitive rolling hash, order-insensitive minhash") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val got = TextOps.fingerprint(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Int)].collect()
    assert(got(0)._2 === got(2)._2, "identical docs must share rolling hash")
    assert(got(0)._2 !== got(1)._2, "reordering must change rolling hash")
    assert(got(0)._3 === got(1)._3, "reordering must keep content minhash")
    assert(got.forall(_._4 === 3))
  }

  test("normalizeText: control chars stripped, whitespace collapsed, lowercased") {
    import org.apache.spark.sql.functions.col
    val got = Seq("  Hello\tWorld\r\n x\u0001y  ", "ONE  two", "")
      .toDF("t").select(TextOps.normalizeText(col("t")).as("n"))
      .as[String].collect()
    assert(got === Array("hello world xy", "one two", ""))
  }

  test("nfcNormalize: composes decomposed forms, leaves NFC text untouched") {
    import org.apache.spark.sql.functions.{col, length}
    val got = Seq(
        "e\u0301",            // decomposed -> U+00E9
        "\u212B",             // angstrom singleton -> U+00C5
        "\u1100\u1161\u11AB", // jamo -> U+AC04
        "plain ascii",        // fast path
        "\uFB03")             // NFC-invariant ligature
      .toDF("t")
      .select(TextOps.nfcNormalize(col("t")).as("n"), length(col("t")).as("l"))
      .as[(String, Int)].collect()
    assert(got.map(_._1) ===
      Array("\u00E9", "\u00C5", "\uAC04", "plain ascii", "\uFB03"))
    // raw lengths prove the inputs really were decomposed
    assert(got.map(_._2) === Array(2, 1, 3, 11, 1))
  }

  test("normalizeTextNfc: decomposed and precomposed variants dedup together") {
    import org.apache.spark.sql.functions.{col, md5}
    val hashes = Seq("Cafe\u0301  MENU", "Caf\u00E9 menu")
      .toDF("t").select(md5(TextOps.normalizeTextNfc(col("t"))).as("h"))
      .as[String].collect()
    assert(hashes(0) === hashes(1))
    // plain normalizeText alone would NOT unify them
    val plain = Seq("Cafe\u0301  MENU", "Caf\u00E9 menu")
      .toDF("t").select(md5(TextOps.normalizeText(col("t"))).as("h"))
      .as[String].collect()
    assert(plain(0) !== plain(1))
  }

  test("scrubPii: masks each family with its token, counts what was removed") {
    import org.apache.spark.sql.functions.col
    val dirty = "Reach me at jo.doe+x@mail.example.org or +1 (555) 123-4567. " +
      "Server 10.0.42.7 billed to 4111 1111 1111 1111 yesterday."
    val clean = "No personal data in this sentence at all."
    val got = TextOps.scrubPii(
        Seq((1L, dirty), (2L, clean)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    val s = got(0).getAs[String]("scrubbed")
    assert(s.contains("<EMAIL>") && s.contains("<PHONE>")
      && s.contains("<IP>") && s.contains("<CARD>"), s)
    assert(!s.contains("@") && !s.contains("4111"), s)
    assert(got(0).getAs[Long]("n_email") === 1L)
    assert(got(0).getAs[Long]("n_phone") === 1L)
    assert(got(0).getAs[Long]("n_ipv4") === 1L)
    assert(got(0).getAs[Long]("n_card") === 1L)
    assert(got(1).getAs[String]("scrubbed") === clean)
    assert(got(1).getAs[Long]("n_email") === 0L)
  }

  test("repetitionStats: duplicate lines and dominant 2-grams are flagged") {
    import org.apache.spark.sql.functions.col
    val boiler = Seq("home | products | about", "real content line one",
      "home | products | about", "home | products | about").mkString("\n")
    val stuffed = ("buy cheap " * 10) + "now"   // 'buy cheap'/'cheap buy' dominate
    val normal = "the quick brown fox jumps over the lazy dog entirely"
    val got = TextOps.repetitionStats(
        Seq((1L, boiler), (2L, stuffed), (3L, normal), (4L, "single"))
          .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    // 4 lines, 3 copies of one -> 2 of 4 are dups
    assert(got(0).getAs[Long]("n_lines") === 4L)
    assert(got(0).getAs[Double]("dup_line_ratio") === 0.5)
    // 'cheap buy' occurs 9 times of 20 2-grams
    assert(got(1).getAs[Double]("top_2gram_ratio") >= 0.45)
    assert(got(2).getAs[Double]("dup_line_ratio") === 0.0)
    assert(got(2).getAs[Double]("top_2gram_ratio") <= 0.25)
    // a one-token doc has zero 2-grams and must not divide by zero
    assert(got(3).getAs[Long]("n_2grams") === 0L)
    assert(got(3).getAs[Double]("top_2gram_ratio") === 0.0)
  }

  test("chunkDocs: overlapping windows cover every token, short docs stay whole") {
    import org.apache.spark.sql.functions.col
    val doc = (1 to 25).map(i => s"t$i").mkString(" ")    // 25 tokens
    val short = "just five little tokens here"
    val got = TextOps.chunkDocs(
        Seq((1L, doc), (2L, short)).toDF("doc_id", "text"),
        "doc_id", "text", maxTokens = 10, overlap = 4)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Long, String)].collect()
    val chunks = got.filter(_._1 == 1L)
    // starts 1, 7, 13, 19 (step 6, capped at 25 - 4 = 21)
    assert(chunks.map(_._2).toSeq === Seq(0, 1, 2, 3))
    assert(chunks.map(_._3).toSeq === Seq(10L, 10L, 10L, 7L))
    assert(chunks(0)._4.startsWith("t1 ") && chunks(1)._4.startsWith("t7 "))
    assert(chunks(3)._4.endsWith(" t25"), "last chunk must reach the last token")
    // consecutive chunks share exactly `overlap` tokens
    assert(chunks(0)._4.split(" ").takeRight(4).toSeq ===
      chunks(1)._4.split(" ").take(4).toSeq)
    val single = got.filter(_._1 == 2L)
    assert(single.length === 1 && single(0)._3 === 5L && single(0)._4 === short)
  }

  test("tokenBudgetSample: each stratum fills its token budget, overshoot <= 1 doc") {
    import org.apache.spark.sql.functions.col
    val docs = (1 to 60).map { i =>
      (i.toLong, if (i % 2 == 0) "en" else "de", 10L + (i % 7)) // ~10-16 tokens each
    }
    val df = docs.toDF("doc_id", "lang", "n_tokens")
    val budgets = Map("en" -> 100L, "de" -> 40L)
    val kept = graft.operators.Sample.tokenBudgetSample(
        df, col("lang"), col("doc_id"), col("n_tokens"), budgets)
      .as[(Long, String, Long)].collect()
    for ((lang, budget) <- budgets) {
      val toks = kept.filter(_._2 == lang).map(_._3)
      val total = toks.sum
      assert(total >= budget, s"$lang must reach its budget: $total < $budget")
      assert(total - toks.max < budget,
        s"$lang may overshoot by at most one doc: $total")
    }
    // deterministic: same call, same draw
    val again = graft.operators.Sample.tokenBudgetSample(
        df, col("lang"), col("doc_id"), col("n_tokens"), budgets)
      .as[(Long, String, Long)].collect()
    assert(kept.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("temperatureBudgets: τ flattens the mixture toward uniform, mass-exact at τ=1") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("en", 9000L), ("de", 900L), ("fr", 100L))
      .flatMap { case (l, m) => Seq((l, m)) } // one row per stratum, mass as tokens
      .toDF("lang", "n_tokens")
    val total = 10000L
    val natural = graft.operators.Sample.temperatureBudgets(
      df, col("lang"), col("n_tokens"), total, temperature = 1.0)
    // τ=1: budgets are the natural proportions (floor of exact shares)
    assert(natural("en") === 9000L && natural("de") === 900L && natural("fr") === 100L)
    val flat = graft.operators.Sample.temperatureBudgets(
      df, col("lang"), col("n_tokens"), total, temperature = 2.0)
    // τ=2: sqrt flattening — low-resource strata gain share, order preserved
    assert(flat("fr") > natural("fr") && flat("de") > natural("de"))
    assert(flat("en") < natural("en"))
    assert(flat("en") > flat("de") && flat("de") > flat("fr"), "ordering by mass survives")
    // exact sqrt allocation: weights 94.868/30/10, z=134.868
    assert(flat("en") === math.floor(total * math.sqrt(9000.0) /
      (math.sqrt(9000.0) + math.sqrt(900.0) + math.sqrt(100.0))).toLong)
    // total conservation within rounding: floors lose < #strata tokens
    assert(flat.values.sum > total - 3 && flat.values.sum <= total)
    // determinism
    assert(flat === graft.operators.Sample.temperatureBudgets(
      df, col("lang"), col("n_tokens"), total, temperature = 2.0))
  }

  test("corpusFilterRules: each rule fires on its designed pathology") {
    import org.apache.spark.sql.functions.col
    val ok = ("the quick brown fox jumps over the lazy dog and keeps going " * 3) + "done."
    val rows = Seq(
      (1L, ok),                                 // passes all rules
      (2L, "short."),                           // too_short
      (3L, ("12345 67890 11 " * 12) + "yes."),  // digit_heavy
      (4L, "a" * 120),                          // no terminal punct + word_len_outlier
      (5L, ("abcd " * 60) + "no punct")         // no_terminal_punct
    ).toDF("doc_id", "text")
    val tagged = graft.operators.Quality.quarantine(rows, TextOps.corpusFilterRules(col("text")))
    val byId = tagged.select("doc_id", "violations").as[(Long, Seq[String])].collect().toMap
    assert(byId(1L) === Seq())
    assert(byId(2L).contains("too_short"))
    assert(byId(3L).contains("digit_heavy"))
    assert(byId(4L) === Seq("no_terminal_punct", "word_len_outlier"))
    assert(byId(5L) === Seq("no_terminal_punct"))
  }

  test("gopherRules: each rule fires on its designed pathology") {
    // a clean doc: 60 normal words with function words
    val clean = ("the cat sat of mat and dogs that have ran with joy here " * 5).trim
    val rows = Seq(
      (1L, clean),
      (2L, "the of short"),                              // word_count (< 50)
      (3L, (("supercalifragilistic " * 60).trim + " the of")), // mean_word_len (> 10)
      (4L, (("# " * 30).trim + " " + clean)),            // symbol_ratio (30 hashes / 90 words)
      (5L, (1 to 10).map(i => s"- bullet $i the of").mkString("\n") +
        "\n" + clean.split(" ").take(5).mkString(" ")),  // bullet_lines (10/11 > 90%)
      (6L, (1 to 4).map(i => s"line $i the of trails...").mkString("\n") +
        "\n" + clean),                                   // ellipsis_lines (4/5 > 30%)
      (7L, (("123 456 789 000 111 " * 12).trim + " the of")), // alpha_words (< 80%)
      (8L, ("zebra quokka wombat lemur panda koala otter " * 9).trim), // stop_words (0 hits)
      (9L, null.asInstanceOf[String]))                   // NULL text ≡ '' (never passes)
      .toDF("doc_id", "text")
    val got = TextOps.gopherQualityRules(rows, "doc_id", "text")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // (word_count, mean_word_len, symbol_ratio, bullet, ellipsis, alpha, stop, pass_all)
    assert(got(1L)._9, "clean doc must pass all rules")
    assert(!got(2L)._2 && !got(2L)._9)
    assert(!got(3L)._3 && !got(3L)._9)
    assert(!got(4L)._4 && !got(4L)._9)
    assert(!got(5L)._5 && !got(5L)._9)
    assert(!got(6L)._6 && !got(6L)._9)
    assert(!got(7L)._7 && !got(7L)._9)
    assert(!got(8L)._8 && !got(8L)._9)
    // null text: word_count and stop_words fail, verdict false, no NULLs
    assert(!got(9L)._2 && !got(9L)._8 && !got(9L)._9)
  }

  test("charEntropy: hand-computed H; junk low, varied text high; null unscoreable") {
    val rows = Seq(
      (1L, "aab"),              // H = ln3 − (2·ln2)/3 = 0.6365
      (2L, "aaaaaaaa"),         // zero entropy: pure repetition
      (3L, "abcdefgh"),         // ln 8 = 2.0794 ≥ 2.0 → keep
      (4L, null.asInstanceOf[String]),
      (5L, ""),
      // trailing line terminators: Java's $ matches BEFORE a final \n,
      // so a (?!$) split would glue it to the last char ("aa\n" →
      // ["a","a\n"]) — the (?!\z) split counts all 3 code points, same
      // as the oracle's per-position substr ("aa\n" ≡ "aab" entropy)
      (6L, "aa\n"),
      (7L, "ab\r\n"),           // a, b, \r, \n all distinct → ln 4
      (8L, "😀😀")) // one astral code point ×2 → H 0
      .toDF("doc_id", "text")
    val got = TextOps.charEntropy(rows, "doc_id", "text")
      .as[(Long, Long, Long, Option[Double], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 2L, Some(0.6365), false)))
    assert(got(2L) === ((2L, 8L, 1L, Some(0.0), false)))
    assert(got(3L)._4.get === 2.0794 && got(3L)._5)
    assert(got(4L) === ((4L, 0L, 0L, None, false)))
    assert(got(5L) === ((5L, 0L, 0L, None, false)))
    assert(got(6L) === ((6L, 3L, 2L, Some(0.6365), false)))
    assert(got(7L) === ((7L, 4L, 4L, Some(1.3863), false)))
    assert(got(8L) === ((8L, 2L, 1L, Some(0.0), false)))
  }

  test("gopherRuleStats: roll-up counts reconcile with the bitmap") {
    val rows = Seq(
      (1L, ("the cat sat of mat and dogs that have ran with joy here " * 5).trim),
      (2L, "the of short"),
      (3L, ("zebra quokka wombat lemur panda koala otter " * 9).trim))
      .toDF("doc_id", "text")
    val stats = TextOps.gopherRuleStats(rows, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(stats("word_count") === ((2L, 1L)))
    assert(stats("stop_words") === ((2L, 1L)))
    assert(stats("pass_all") === ((1L, 2L)))
    assert(stats.size === 8)
    assert(stats.values.forall { case (p, f) => p + f === 3L })
  }

  test("htmlExtract: hand-checked extraction per removal class") {
    val docs = Seq(
      // subtree removal must EAT the tag-looking string inside the script
      // body and the raw '<' in its code — tag-stripping alone would leak
      (1L, "<script>var s = \"trap</div>\"; if (1 < 2) go();</script>" +
        "<p>kept text</p>"),
      // block closers separate; inline tags don't weld words
      (2L, "<div>one</div><div>two</div><p>a <b>bold</b> word</p>"),
      // entity decode order: &amp;lt; is literal '&lt;', never '<'
      (3L, "<p>1 &lt; 2 &amp; 3 &gt; 0 &amp;lt;keep&gt; &quot;q&quot;" +
        " &#39;s&#39;&nbsp;end</p>"),
      // comments, style, title vanish whole; <br/> separates
      (4L, "<title>Skip</title><style>p { x: 1; }</style>" +
        "<!-- note -->line1<br/>line2"),
      // plain text passes through with whitespace collapsed
      (5L, "no  markup\t here")
    ).toDF("doc_id", "html")
    val got = TextOps.htmlExtract(docs, "doc_id", "html")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 === "kept text")
    assert(got(2L)._2 === "one\ntwo\na bold word")
    assert(got(3L)._2 === "1 < 2 & 3 > 0 &lt;keep> \"q\" 's' end")
    assert(got(4L)._2 === "line1\nline2")
    assert(got(5L)._2 === "no markup here")
    assert(got(5L)._3 === 0L, "plain text has zero tags")
    // n_tags is a raw markup-density SIGNAL, not a parse: tag-shaped
    // spans inside the script string count too (script, the </div> in
    // the string literal, /script, p, /p)
    assert(got(1L)._3 === 5L)
    got.values.foreach(r => assert(r._4 === r._2.length.toLong))
  }

  test("htmlExtract plans as one shuffle-free codegen'd projection") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // the 100 TB guard: extraction must stay a pure map over the scan —
    // an Exchange or a codegen break here would tax every crawl byte
    // non-foldable input: a literal frame would constant-fold into a
    // LocalTableScan and prove nothing
    val plan = TextOps.htmlExtract(
        spark.range(4).select(col("id").as("doc_id"),
          concat(lit("<p>x"), col("id"), lit("</p>")).as("html")),
        "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("*("), s"codegen lost (no *(n) stage):\n$plan")
  }

  test("hashedTfidf: dense assembly matches sparse; weights are exact integers") {
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "alpha gamma"),
      (3L, "beta gamma delta")
    ).toDF("doc_id", "text")
    val sparse = TextOps.hashedTfidfSparse(docs, "doc_id", "text", dims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // alpha: tf 2 in doc 1, df 2 of N=3 -> idf = round(ln(4/3)*1000) = 288
    val idfAlpha = math.rint(StrictMath.log(4.0 / 3.0) * 1000).toLong
    val dimAlpha = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("alpha").take(4), 16) % 16
    assert(sparse((1L, dimAlpha)) === 2 * idfAlpha)
    // dense form re-expands to the same weights, zeros elsewhere
    val dense = TextOps.hashedTfidf(docs, "doc_id", "text", dims = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(dense(1L).length === 16)
    sparse.foreach { case ((id, dim), w) =>
      assert(dense(id)(dim.toInt) === w.toDouble, s"doc $id dim $dim") }
    assert(dense.values.flatten.sum ===
      sparse.values.sum.toDouble, "no weight invented or lost in assembly")
  }
}
