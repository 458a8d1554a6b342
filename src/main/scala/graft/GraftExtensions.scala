package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

import org.apache.spark.sql.catalyst.expressions.Cast

import graft.functions.{TextHash, UnicodeNorm, VecOps}

/** SQL surface for the engine: registers graft's native expressions as SQL
  * functions so `spark.sql("SELECT simhash64(text) …")` works — via
  * `spark.sql.extensions=graft.GraftExtensions` (cluster config), a
  * builder's `.withExtensions(new GraftExtensions)`, or imperatively with
  * [[GraftExtensions.register]] on a live session. The reference exposes
  * its data through SQL (Postgres); this is the Spark-native equivalent of
  * that contract, with [[GraftExtensions.registerTables]] publishing the
  * lake tables as views.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // BETWEEN theta-join → grid equi-join, gated on spark.graft.range.grid
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
  }
}

object GraftExtensions {

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(TextHash.getClass.getCanonicalName, name, usage),
      builder)

  /** The function descriptions injected by the extension (also usable with
    * `sessionState.functionRegistry` directly — see [[register]]). */
  val functions = Seq(
    fn("simhash64", "simhash64(text) — 64-bit SimHash of whitespace tokens") {
      args => StaticInvoke(TextHash.getClass, LongType, "simhash64",
        args, Seq(StringType), propagateNull = true, returnNullable = false)
    },
    fn("shingle_hashes", "shingle_hashes(text, width) — distinct hashed word shingles") {
      args => StaticInvoke(TextHash.getClass,
        ArrayType(LongType, containsNull = false), "shingleHashes",
        args, Seq(StringType, IntegerType), propagateNull = true, returnNullable = false)
    },
    fn("minhash_sig", "minhash_sig(hashes, k, seed) — k-permutation MinHash signature") {
      args => StaticInvoke(TextHash.getClass,
        ArrayType(LongType, containsNull = false), "minhashSig",
        args, Seq(ArrayType(LongType), IntegerType, LongType),
        propagateNull = true, returnNullable = false)
    },
    fn("nfc_normalize", "nfc_normalize(text) — Unicode NFC canonical composition") {
      args => StaticInvoke(UnicodeNorm.getClass, StringType, "nfc",
        args, Seq(StringType), propagateNull = true, returnNullable = false)
    },
    fn("vec_dot", "vec_dot(a, b) — double-precision dot product (ANN kernel)") {
      // explicit cast so float/int arrays from SQL work without a manual
      // CAST — same widening dotCol applies on the Column side
      args => StaticInvoke(VecOps.getClass, DoubleType, "dot",
        args.map(a => Cast(a, ArrayType(DoubleType))),
        Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
        propagateNull = true, returnNullable = false)
    },
    fn("bpe_token_count",
       "bpe_token_count(text, merges) — byte-level trained-merge BPE token count (merges as array of 'a b' hex-byte-symbol strings in rank order)") {
      // the SQL form takes the merge table as an argument (pass the
      // trained table as an array literal); byte-level BPE sees the raw
      // text — no case folding or stripping — and the kernel enforces the
      // same hex-pair merge alphabet the Column form validates at build
      args => StaticInvoke(graft.functions.Bpe.getClass, LongType, "tokenCount",
        Seq(args.head, Cast(args(1), ArrayType(StringType))),
        Seq(StringType, ArrayType(StringType)),
        propagateNull = true, returnNullable = false)
    },
    fn("bpe_encode",
       "bpe_encode(text, merges) — byte-level trained-merge BPE token-ID sequence (ids: bytes 0-255, merge rank r = 256+r)") {
      args => StaticInvoke(graft.functions.Bpe.getClass,
        ArrayType(LongType, containsNull = false), "encode",
        Seq(args.head, Cast(args(1), ArrayType(StringType))),
        Seq(StringType, ArrayType(StringType)),
        propagateNull = true, returnNullable = false)
    },
    fn("bpe_decode",
       "bpe_decode(ids, merges) — text of a BPE token-ID sequence (inverse of bpe_encode up to whitespace: no end-of-word marker)") {
      args => StaticInvoke(graft.functions.Bpe.getClass, StringType, "decode",
        Seq(Cast(args.head, ArrayType(LongType)),
          Cast(args(1), ArrayType(StringType))),
        Seq(ArrayType(LongType), ArrayType(StringType)),
        propagateNull = true, returnNullable = false)
    },
    // the other two tokenizer families get the same SQL surface as BPE —
    // the model ships as the argument (an array literal of the trained
    // rows; the per-thread parse memo makes repeated calls cheap)
    fn("unigram_encode",
       "unigram_encode(text, model) — unigram-LM (SentencePiece-family) piece-ID sequence; model rows as 'piece\\tid\\tlogp_scaled' strings (byte-fallback ids 1..256, trained ids from 257)") {
      args => StaticInvoke(graft.functions.Unigram.getClass,
        ArrayType(LongType, containsNull = false), "encode",
        Seq(args.head, Cast(args(1), ArrayType(StringType))),
        Seq(StringType, ArrayType(StringType)),
        propagateNull = true, returnNullable = false)
    },
    fn("unigram_decode",
       "unigram_decode(ids, model) — text of a unigram piece-ID sequence (total inverse: byte-fallback ids reassemble unseen scripts)") {
      args => StaticInvoke(graft.functions.Unigram.getClass, StringType, "decode",
        Seq(Cast(args.head, ArrayType(LongType)),
          Cast(args(1), ArrayType(StringType))),
        Seq(ArrayType(LongType), ArrayType(StringType)),
        propagateNull = true, returnNullable = false)
    },
    fn("wordpiece_encode",
       "wordpiece_encode(text, model) — WordPiece (BERT-family) piece-ID sequence via greedy longest-match; model rows as 'piece\\tid' strings (0 = [UNK], ## marks continuations); an unsegmentable word emits the single id 0") {
      args => StaticInvoke(graft.functions.WordPiece.getClass,
        ArrayType(LongType, containsNull = false), "encode",
        Seq(args.head, Cast(args(1), ArrayType(StringType))),
        Seq(StringType, ArrayType(StringType)),
        propagateNull = true, returnNullable = false)
    },
    fn("wordpiece_decode",
       "wordpiece_decode(ids, model) — text of a WordPiece piece-ID sequence (## markers stripped; id 0 renders as the literal [UNK] — the family's lossy OOV discipline)") {
      args => StaticInvoke(graft.functions.WordPiece.getClass, StringType, "decode",
        Seq(Cast(args.head, ArrayType(LongType)),
          Cast(args(1), ArrayType(StringType))),
        Seq(ArrayType(LongType), ArrayType(StringType)),
        propagateNull = true, returnNullable = false)
    })

  /** Imperative registration on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  /** Publish every testdata table as a temp view so plain `spark.sql`
    * queries run against the lake — the engine's SQL front door. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => graft.sources.Tables.load(spark, dir, t).createOrReplaceTempView(t))
    graft.sources.Tables.events(spark, dir).createOrReplaceTempView("events")
  }
}
