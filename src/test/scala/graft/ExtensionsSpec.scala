package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.TextHash

class ExtensionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("SQL functions agree with the Column API bit for bit") {
    GraftExtensions.register(spark)
    val docs = Seq("the quick brown fox", "a b", "").toDF("text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT simhash64(text) AS sh, shingle_hashes(text, 2) AS shh,
         minhash_sig(shingle_hashes(text, 2), 8, 42L) AS sig
         FROM ext_docs""").collect()
    val viaCol = docs.select(
      TextHash.simhash64Col(col("text")).as("sh"),
      TextHash.shingleHashesCol(col("text"), 2).as("shh"),
      TextHash.minhashSigCol(TextHash.shingleHashesCol(col("text"), 2), 8).as("sig"))
      .collect()
    assert(viaSql.map(_.toString) === viaCol.map(_.toString))
  }

  test("vec_dot and nfc_normalize SQL functions agree with the Column API") {
    GraftExtensions.register(spark)
    // float arrays: the SQL function must widen to double itself
    Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("ext_vecs")
    val d = spark.sql("SELECT vec_dot(a, b) AS d FROM ext_vecs")
      .as[Double].collect()
    assert(d === Array(4.0))
    // NFC: decomposed e + COMBINING ACUTE (U+0301) composes to U+00E9
    // (explicit escapes so source-file encoding cannot decide the test)
    val n = spark.sql("SELECT nfc_normalize('e\u0301') AS t")
      .as[String].collect()
    assert(n === Array("\u00e9"))
  }

  test("bpe_token_count SQL function agrees with the Column API") {
    GraftExtensions.register(spark)
    // byte-level: merges are hex byte symbols ('61 62' = bytes of "ab")
    val merges = Seq(("61", "62"), ("6162", "63"))
    val viaSql = spark.sql(
      "SELECT bpe_token_count('ABC abc xy', array('61 62', '6162 63')) AS n")
      .as[Long].collect()
    // no case folding at byte level: ABC stays A,B,C (3) + abc→ab→abc (1)
    // + x,y (2) = 6
    assert(viaSql === Array(6L))
    val viaCol = Seq(("ABC abc xy")).toDF("text")
      .select(graft.functions.Bpe.tokenCountCol(col("text"), merges).as("n"))
      .as[Long].collect()
    assert(viaCol === viaSql)
  }

  test("bpe_encode SQL function agrees with the Column API") {
    GraftExtensions.register(spark)
    val merges = Seq(("61", "62"), ("6162", "63"))
    val viaSql = spark.sql(
      "SELECT bpe_encode('abc xy', array('61 62', '6162 63')) AS ids")
      .as[Seq[Long]].collect().head
    // abc → ab,c → abc = merge rank 1 → id 257; x,y = bytes 0x78,0x79
    assert(viaSql === Seq(257L, 0x78L, 0x79L))
    val viaCol = Seq("abc xy").toDF("text")
      .select(graft.functions.Bpe.encodeCol(col("text"), merges).as("ids"))
      .as[Seq[Long]].collect().head
    assert(viaCol === viaSql)
  }

  test("vec_dot: a null array element is rejected, never silently read as 0.0") {
    GraftExtensions.register(spark)
    val ex = intercept[Throwable] {
      spark.sql("SELECT vec_dot(array(1.0, CAST(NULL AS DOUBLE)), array(2.0, 3.0))").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("vec_dot")), s"got: ${messages(ex)}")
    // a whole-null argument still propagates null (propagateNull contract)
    val r = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0)) AS d")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("vec_dot: a length mismatch is rejected, never read past the shorter array") {
    GraftExtensions.register(spark)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val ex = intercept[Throwable] {
      spark.sql("SELECT vec_dot(array(1.0, 2.0, 3.0), array(4.0, 5.0))").collect()
    }
    assert(messages(ex).exists(_.contains("dimension mismatch")), s"got: ${messages(ex)}")
  }

  test("bpe_decode SQL function inverts bpe_encode up to whitespace") {
    val got = spark.sql(
      "SELECT bpe_decode(bpe_encode('abc xy', array('61 62', '6162 63'))," +
        " array('61 62', '6162 63')) AS t")
      .collect().head.getString(0)
    assert(got === "abcxy")
  }

  test("bpe_token_count: malformed or null merge entries fail loudly, not with raw NPEs") {
    GraftExtensions.register(spark)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val noSpace = intercept[Throwable] {
      spark.sql("SELECT bpe_token_count('abc', array('6162'))").collect()
    }
    assert(messages(noSpace).exists(_.contains("not of the form")), s"got: ${messages(noSpace)}")
    // a second space must be rejected too — 'a b c' parsed at the first
    // space would silently become the never-matching pair ('a', 'b c')
    val twoSpaces = intercept[Throwable] {
      spark.sql("SELECT bpe_token_count('abc', array('61 62 63'))").collect()
    }
    assert(messages(twoSpaces).exists(_.contains("not of the form")), s"got: ${messages(twoSpaces)}")
    // non-hex symbols (the old char-level shape) fail loudly on the SQL
    // path as well, same as the Column form's build-time validation
    val notHex = intercept[Throwable] {
      spark.sql("SELECT bpe_token_count('abc', array('a b'))").collect()
    }
    assert(messages(notHex).exists(_.contains("hex alphabet")), s"got: ${messages(notHex)}")
    val nullEntry = intercept[Throwable] {
      spark.sql("SELECT bpe_token_count('abc', array('61 62', CAST(NULL AS STRING)))").collect()
    }
    assert(messages(nullEntry).exists(_.contains("null merge entry")), s"got: ${messages(nullEntry)}")
  }


  test("unigram_encode/decode SQL functions agree with the Column API") {
    GraftExtensions.register(spark)
    import graft.functions.Unigram
    import graft.functions.Unigram.Piece
    val model = Seq(Piece(257L, "ab", -3000000L), Piece(258L, "c", -5000000L))
    val rows = "array('ab\t257\t-3000000', 'c\t258\t-5000000')"
    // 'z' is uncovered: byte fallback id 1 + 0x7a = 123
    val viaSql = spark.sql(
      s"SELECT unigram_decode(unigram_encode('ab c zab', $rows), $rows) AS t, " +
      s"unigram_encode('ab c zab', $rows) AS ids").collect().head
    assert(viaSql.getString(0) === "abczab")
    assert(viaSql.getSeq[Long](1) === Seq(257L, 258L, 123L, 257L))
    val viaCol = Seq(("ab c zab"))
      .toDF("t")
      .select(Unigram.encodeCol(col("t"), model).as("ids"))
      .as[Seq[Long]].collect().head
    assert(viaSql.getSeq[Long](1) === viaCol)
  }

  test("wordpiece_encode/decode SQL functions agree with the Column API") {
    GraftExtensions.register(spark)
    import graft.functions.WordPiece
    import graft.functions.WordPiece.Piece
    val model = Seq(Piece(1L, "##b"), Piece(2L, "a"))
    val rows = "array('##b\t1', 'a\t2')"
    val viaSql = spark.sql(
      s"SELECT wordpiece_encode('ab zz ab', $rows) AS ids, " +
      s"wordpiece_decode(wordpiece_encode('ab zz ab', $rows), $rows) AS t")
      .collect().head
    // ab -> a + ##b; zz has no match -> whole-word [UNK] (id 0)
    assert(viaSql.getSeq[Long](0) === Seq(2L, 1L, 0L, 2L, 1L))
    assert(viaSql.getString(1) === "ab[UNK]ab")
    val viaCol = Seq(("ab zz ab")).toDF("t")
      .select(WordPiece.encodeCol(col("t"), model).as("ids"))
      .as[Seq[Long]].collect().head
    assert(viaSql.getSeq[Long](0) === viaCol)
  }

  test("malformed tokenizer model rows fail loudly by name at the SQL surface") {
    GraftExtensions.register(spark)
    def msgOf(sql: String): String = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    }
    // wrong arity, non-numeric id, and an id that would size a huge array
    assert(msgOf("SELECT wordpiece_encode('a', array('justapiece'))")
      .contains("wordpiece model"))
    assert(msgOf("SELECT unigram_encode('a', array('p\tNaN\t0'))")
      .contains("unigram model"))
    assert(msgOf("SELECT wordpiece_encode('a', array('p\t99999999999'))")
      .contains("wordpiece model"))
  }

  test("withExtensions wires the functions into a fresh session") {
    // getOrCreate() would return the shared session (and skip the
    // extensions), so the default session is cleared around creation
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
      .master("local[2]").withExtensions(new GraftExtensions).getOrCreate()
    finally {
      SparkSession.setDefaultSession(SparkSpec.session)
      SparkSession.setActiveSession(SparkSpec.session)
    }
    assert(s2 ne spark, "expected a fresh session, got the shared one")
    assert(s2.sql("SELECT simhash64('x y z') AS h").collect().head.getLong(0)
      === TextHash.simhash64(org.apache.spark.unsafe.types.UTF8String.fromString("x y z")))
  }

  test("registerTables publishes the lake as SQL views") {
    GraftExtensions.registerTables(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) AS c FROM events").as[Long].head() > 0)
    assert(spark.sql("SELECT count(*) AS c FROM lineitem").as[Long].head() > 0)
  }
}
