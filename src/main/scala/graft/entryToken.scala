package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, Unigram, WordPiece}
import graft.ml.FatalityModel
import graft.operators._
import graft.sources.{Jsonl, Sink, Tables}
import graft.streaming.{EventStream, IncrementalStream}

import EntryOps._

/** Tokenizer training/apply (byte-level BPE), sequence packing, and
  * the packed-token-stream export/roundtrip chain.
  *
  * Registration slice of the [[SparkEntry]] driver contract — query
  * lambdas and their DuckDB oracle replays, split per tier (r15) so the
  * contract file stops being the single merge bottleneck. Entry text is
  * unchanged from the monolithic registration. */
private[graft] object TokenEntries {

  /** [GOLDEN @ gate corpus: sf0.01 — re-derive on SF change by dumping
    * the Spark side] the trained WordPiece vocabulary as (id, piece)
    * VALUES rows: the 39 alphabet forms observed in the capped dict
    * (word-initial chars bare, continuation chars ##-marked) plus the 16
    * likelihood-ratio merges (##bl ##ch ##in ##sh ag agg bi big fi li
    * lin qu th wi win wind), ids = code-point lexicographic rank from 1
    * (0 is the implicit [UNK]). Shared by the four wordpiece oracles —
    * trainer drift anywhere (alphabet collection, ratio comparison,
    * tie-break, id ranking) flips every one of them red. */
  private val wpVocabValues: String =
    """(1,'##a'),(2,'##b'),(3,'##bl'),(4,'##c'),(5,'##ch'),(6,'##d'),
           (7,'##e'),(8,'##g'),(9,'##h'),(10,'##i'),(11,'##in'),(12,'##k'),
           (13,'##l'),(14,'##m'),(15,'##n'),(16,'##o'),(17,'##p'),(18,'##r'),
           (19,'##s'),(20,'##sh'),(21,'##t'),(22,'##u'),(23,'##w'),(24,'##y'),
           (25,'a'),(26,'ag'),(27,'agg'),(28,'b'),(29,'bi'),(30,'big'),
           (31,'c'),(32,'d'),(33,'f'),(34,'fi'),(35,'g'),(36,'h'),(37,'j'),
           (38,'k'),(39,'l'),(40,'li'),(41,'lin'),(42,'m'),(43,'o'),(44,'p'),
           (45,'q'),(46,'qu'),(47,'r'),(48,'s'),(49,'t'),(50,'th'),(51,'v'),
           (52,'w'),(53,'wi'),(54,'win'),(55,'wind')"""

  /** The WordPiece greedy longest-match-first walk replayed in DuckDB —
    * shared prefix of the encode/decode/fertility oracles. Per DISTINCT
    * word, a recursive CTE advances one matched piece per step: six
    * per-length vocab LEFT JOINs (lengths 6..1, the kernel's MaxPieceLen
    * cap) probe the remaining text — continuation positions (pos > 0)
    * probe with the '##' marker prepended, exactly the kernel's key — and
    * the CASE ladder takes the LONGEST hit (greedy, deliberately not the
    * unigram Viterbi). A step with NO hit marks the word failed and its
    * ids become [0]: the whole-word [UNK] rule (never a partial prefix).
    * `corpusCte` supplies the corpus rows (planted docs vary per query);
    * exposes wordpos(doc_id, widx, w) and wtok(w, ids, failed). */
  private def wpGreedyCtes(corpusCte: String): String =
    s"""WITH RECURSIVE
         vocab AS (SELECT * FROM (VALUES
           $wpVocabValues
         ) v(id, piece)),
         corpus AS ($corpusCte),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ws
                   FROM corpus) u0) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         greedy AS (
           SELECT w, length(w) AS len, CAST(0 AS BIGINT) AS pos,
             CAST([] AS BIGINT[]) AS ids, FALSE AS failed
           FROM dw
           UNION ALL
           SELECT r.w, r.len,
             CASE WHEN v6.id IS NOT NULL THEN r.pos + 6
                  WHEN v5.id IS NOT NULL THEN r.pos + 5
                  WHEN v4.id IS NOT NULL THEN r.pos + 4
                  WHEN v3.id IS NOT NULL THEN r.pos + 3
                  WHEN v2.id IS NOT NULL THEN r.pos + 2
                  WHEN v1.id IS NOT NULL THEN r.pos + 1
                  ELSE r.len END,
             CASE WHEN v6.id IS NOT NULL THEN list_append(r.ids, CAST(v6.id AS BIGINT))
                  WHEN v5.id IS NOT NULL THEN list_append(r.ids, CAST(v5.id AS BIGINT))
                  WHEN v4.id IS NOT NULL THEN list_append(r.ids, CAST(v4.id AS BIGINT))
                  WHEN v3.id IS NOT NULL THEN list_append(r.ids, CAST(v3.id AS BIGINT))
                  WHEN v2.id IS NOT NULL THEN list_append(r.ids, CAST(v2.id AS BIGINT))
                  WHEN v1.id IS NOT NULL THEN list_append(r.ids, CAST(v1.id AS BIGINT))
                  ELSE CAST([0] AS BIGINT[]) END,
             v6.id IS NULL AND v5.id IS NULL AND v4.id IS NULL
               AND v3.id IS NULL AND v2.id IS NULL AND v1.id IS NULL
           FROM greedy r
           LEFT JOIN vocab v6 ON r.len - r.pos >= 6 AND v6.piece =
             CASE WHEN r.pos = 0 THEN substr(r.w, 1, 6)
                  ELSE '##' || substr(r.w, r.pos + 1, 6) END
           LEFT JOIN vocab v5 ON r.len - r.pos >= 5 AND v5.piece =
             CASE WHEN r.pos = 0 THEN substr(r.w, 1, 5)
                  ELSE '##' || substr(r.w, r.pos + 1, 5) END
           LEFT JOIN vocab v4 ON r.len - r.pos >= 4 AND v4.piece =
             CASE WHEN r.pos = 0 THEN substr(r.w, 1, 4)
                  ELSE '##' || substr(r.w, r.pos + 1, 4) END
           LEFT JOIN vocab v3 ON r.len - r.pos >= 3 AND v3.piece =
             CASE WHEN r.pos = 0 THEN substr(r.w, 1, 3)
                  ELSE '##' || substr(r.w, r.pos + 1, 3) END
           LEFT JOIN vocab v2 ON r.len - r.pos >= 2 AND v2.piece =
             CASE WHEN r.pos = 0 THEN substr(r.w, 1, 2)
                  ELSE '##' || substr(r.w, r.pos + 1, 2) END
           LEFT JOIN vocab v1 ON v1.piece =
             CASE WHEN r.pos = 0 THEN substr(r.w, 1, 1)
                  ELSE '##' || substr(r.w, r.pos + 1, 1) END
           WHERE r.pos < r.len AND NOT r.failed),
         wtok AS (SELECT w, ids, failed FROM greedy WHERE pos = len)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_merges" -> ((s, d) => {
      // The trained byte-level BPE merge table itself, as rows: training
      // is deterministic (global word-freq dict, hash-capped sample,
      // lexicographic tie-break), so the gate pins the merges as golden
      // VALUES — the training half of the tokenizer-faithful token-count
      // story (bpe_token_count gates the application half). Symbols are
      // 2-hex-digit UTF-8 bytes, so the table is ASCII whatever the
      // corpus script.
      import s.implicits._
      trainedMerges(s, d, 16)
        .zipWithIndex
        .map { case ((a, b), r) => (r.toLong, s"$a $b") }
        .toDF("rank", "pair")
    }),
    "bpe_fertility" -> ((s, d) => {
      // Tokenizer FERTILITY per language — the standard tokenizer-eval
      // table (tokens/word and bytes/token by lang exposes a tokenizer
      // that fragments one language's text): per-lang sums of the native
      // kernel's BPE counts, whitespace words, and UTF-8 bytes, ratios
      // derived from the exact integer sums so both engines divide
      // identical doubles. Rides the memoized per-(session, dir) train;
      // one map-side-combined agg to O(|langs|) rows.
      val docs = Tables.documents(s, d)
      val merges = trainedMerges(s, d, 16)
      docs.select(col("lang"),
          Bpe.tokenCountCol(col("text"), merges).as("n_tok"),
          size(filter(split(col("text"), "\\s+"), w => w =!= ""))
            .cast("long").as("n_w"),
          octet_length(col("text")).cast("long").as("n_b"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_w")).as("n_words"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("n_b")).as("n_bytes"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
          col("n_bytes"),
          round(col("n_tokens") / when(col("n_words") =!= 0, col("n_words")), 4)
            .as("tokens_per_word"),
          round(col("n_bytes") / when(col("n_tokens") =!= 0, col("n_tokens")), 4)
            .as("bytes_per_token"))
    }),
    "unigram_fertility" -> ((s, d) => {
      // the same fertility table for the SECOND tokenizer family — the
      // bake-off dashboard a vocab decision reads side by side with
      // bpe_fertility (pieces/word and bytes/piece per lang expose which
      // family fragments which language): per-lang sums of the Viterbi
      // kernel's piece counts, whitespace words, UTF-8 bytes, ratios off
      // exact integer sums. Rides the memoized unigram train; one
      // map-side-combined agg to O(|langs|) rows.
      val docs = Tables.documents(s, d)
      val model = trainedUnigram(s, d, 64)
      docs.select(col("lang"),
          size(Unigram.encodeCol(col("text"), model)).cast("long").as("n_tok"),
          size(filter(split(col("text"), "\\s+"), w => w =!= ""))
            .cast("long").as("n_w"),
          octet_length(col("text")).cast("long").as("n_b"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_w")).as("n_words"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("n_b")).as("n_bytes"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
          col("n_bytes"),
          round(col("n_tokens") / when(col("n_words") =!= 0, col("n_words")), 4)
            .as("tokens_per_word"),
          round(col("n_bytes") / when(col("n_tokens") =!= 0, col("n_tokens")), 4)
            .as("bytes_per_token"))
    }),
    "bpe_token_count" -> ((s, d) => {
      // Tokenizer-faithful token counts: the 16-merge byte-level BPE
      // trained on this corpus, applied by the native kernel (merge table
      // as one plan literal). The corpus is augmented with PLANTED
      // non-ASCII docs (fr/de accents, CJK — built from \u escapes here
      // and chr() codepoints in the oracle, so no encoding channel can
      // skew either side) to prove counting is byte-faithful outside
      // [a-z]: every non-ASCII char counts as its UTF-8 bytes rather than
      // being stripped. The oracle replays APPLICATION in DuckDB — a
      // recursive first-occurrence-replace over comma-delimited
      // hex-byte-symbol strings with the same pinned merge table — so
      // both train (bpe_merges) and apply are second-engine-checked.
      import s.implicits._
      val docs = Tables.documents(s, d)
      val merges = trainedMerges(s, d, 16)
      val planted = Seq(
        (9000001L, "café déjà naïve entrée"),
        (9000002L, "über straße größer"),
        (9000003L, "模型 训练 数据"))
        .toDF("doc_id", "text")
      docs.select(col("doc_id"), col("text")).unionByName(planted)
        .select(col("doc_id"),
          Bpe.tokenCountCol(col("text"), merges).as("n_bpe_tokens"),
          size(filter(split(col("text"), "\\s+"), w => w =!= ""))
            .cast("long").as("n_words"))
    }),
    "bpe_encode" -> ((s, d) => {
      // The ENCODE half of the tokenizer story: actual token-ID sequences
      // (GPT-2 id convention — bytes 0-255, merge rank r mints 256+r),
      // not just counts. This is what a training-export writes; exploded
      // to (doc_id, pos, token_id) rows so the full sequence is
      // second-engine-checked: the oracle replays merge application per
      // distinct word (the bpe_token_count recursion), then maps final
      // symbols to ids (byte value, or 256+min producing rank) and
      // reassembles per-doc order. Same planted non-ASCII docs — CJK/
      // accented text must encode to its UTF-8 byte ids, not vanish.
      import s.implicits._
      val docs = Tables.documents(s, d)
      val merges = trainedMerges(s, d, 16)
      val planted = Seq(
        (9000001L, "café déjà naïve entrée"),
        (9000002L, "über straße größer"),
        (9000003L, "模型 训练 数据"))
        .toDF("doc_id", "text")
      docs.select(col("doc_id"), col("text")).unionByName(planted)
        .select(col("doc_id"),
          posexplode(Bpe.encodeCol(col("text"), merges)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("token_id"))
    }),
    "bpe_vocab" -> ((s, d) => {
      // The VOCABULARY artifact a tokenizer consumer ships beside the
      // merge table (the vocab.json half of the GPT-2 pair): one row per
      // mintable id — 0-255 the base bytes, 256+r for each merge rank
      // whose concatenation is a FIRST occurrence (a duplicate
      // concatenation never mints; encode resolves it to the min rank).
      // Derived deterministically from the trained merges, so the oracle
      // rebuilds it from the same pinned VALUES table bpe_merges gates.
      import s.implicits._
      val merges = trainedMerges(s, d, 16)
      val base = (0 until 256).map(b => (b.toLong, f"$b%02x"))
      val seen = scala.collection.mutable.HashSet.empty[String]
      val minted = merges.zipWithIndex.flatMap { case ((a, b), r) =>
        val sym = a + b
        if (seen.add(sym)) Some((256L + r, sym)) else None
      }
      (base ++ minted).toDF("token_id", "symbol_hex")
    }),
    "unigram_vocab" -> ((s, d) => {
      // The SECOND tokenizer family's trained artifact (Kudo 2018
      // unigram-LM, the SentencePiece recipe): 64 pieces selected by
      // integer-score hard-EM over the capped word dict — all training
      // chars (coverage) + the top multi-char pieces — with 1e6-scaled
      // StrictMath log-probs and lexicographic-rank ids from 257 (0 =
      // UNK, 1..256 the fixed byte-fallback pieces <0x00>..<0xFF>, the
      // SentencePiece byte_fallback layout; byte rows carry the
      // conventional 0 score — they never compete in the DP). Trained
      // rows pinned as golden VALUES (the bpe_merges convention):
      // trainer drift anywhere — seed pool, EM, pruning, scaling —
      // flips it red; byte rows are derived in both engines.
      import s.implicits._
      val bytes = (0 until 256).map(b => (1L + b, f"<0x$b%02X>", 0L))
      (bytes ++ trainedUnigram(s, d, 64).map(p => (p.id, p.piece, p.logp)))
        .toDF("piece_id", "piece", "logp_scaled")
    }),
    "unigram_encode" -> ((s, d) => {
      // Unigram SEGMENTATION as id sequences: integer-score Viterbi per
      // word (ties → longest final piece), exploded to (doc_id, pos,
      // piece_id) so the full sequence is second-engine-checked — the
      // oracle replays the DP itself in DuckDB (list-carried dp/bp
      // vectors in a recursive CTE over the pinned piece table) plus the
      // backtrack. Planted docs exercise the paths the corpus can't:
      // NOVEL words over seen characters (real multi-piece Viterbi, not
      // memorized whole words) and unseen-script characters that must
      // BYTE-FALLBACK — 2-byte Greek and a 4-byte supplementary-plane
      // emoji emit their UTF-8 bytes' fixed ids (1 + byte), never UNK,
      // with the oracle deriving the same expansion from code-point
      // arithmetic.
      import s.implicits._
      val model = trainedUnigram(s, d, 64)
      val planted = Seq(
        (9100001L, "hashrow streamjoin mergevalue"),
        (9100002L, "αβγ sort"),
        (9100003L, "🙂 data"))
        .toDF("doc_id", "text")
      Tables.documents(s, d).select("doc_id", "text").unionByName(planted)
        .select(col("doc_id"),
          posexplode(Unigram.encodeCol(col("text"), model)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("piece_id"))
    }),
    "unigram_decode" -> ((s, d) => {
      // the unigram roundtrip closed, and since byte-fallback TOTAL:
      // trained pieces are SUBSTRINGS and unseen chars ride their UTF-8
      // byte ids, so decode(encode(text)) must equal text with every
      // \s+ run deleted (the bpe_decode contract) for ARBITRARY input —
      // which the oracle computes with no tokenizer machinery at all.
      // Planted unseen-script docs (Greek, 4-byte emoji) make the
      // contract non-vacuous outside the covered corpus: pre-fallback
      // they would have decoded with chars DROPPED at UNK. Both halves
      // are StaticInvoke kernels, so the whole roundtrip is one
      // codegen'd map projection (the first cut's element_at-over-map
      // HOF broke whole-stage codegen).
      import s.implicits._
      val model = trainedUnigram(s, d, 64)
      val planted = Seq(
        (9100002L, "αβγ sort"),
        (9100003L, "🙂 data λx"))
        .toDF("doc_id", "text")
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(planted)
        .select(col("doc_id"),
          Unigram.decodeCol(Unigram.encodeCol(col("text"), model), model)
            .as("decoded"))
    }),
    "wordpiece_vocab" -> ((s, d) => {
      // The THIRD tokenizer family's trained artifact (Schuster &
      // Nakajima 2012; BERT's tokenizer): the observed alphabet
      // (word-initial chars bare, continuation chars ##-marked) plus 16
      // likelihood-ratio merges — score n_ab/(n_a·n_b), compared by
      // exact integer cross-multiplication, ties to the code-point-
      // smallest pair — with code-point-rank ids from 1 (0 = [UNK]).
      // Trained rows pinned as golden VALUES (the bpe_merges/
      // unigram_vocab convention): trainer drift anywhere flips it red.
      import s.implicits._
      ((0L, WordPiece.UnkPiece) +:
        trainedWordPiece(s, d, 16).map(p => (p.id, p.piece)))
        .toDF("piece_id", "piece")
    }),
    "wordpiece_encode" -> ((s, d) => {
      // WordPiece SEGMENTATION as id sequences: greedy longest-match-
      // first per word (continuation positions probe with '##'), whole
      // word → [UNK] when any position has no match — the production
      // BERT inference rule, deliberately NOT Viterbi. Exploded to
      // (doc_id, pos, piece_id); the oracle replays the greedy walk
      // itself (per-length vocab joins + a longest-hit CASE ladder in a
      // recursive CTE). Planted docs force the paths the covered corpus
      // can't: novel words over seen chars (real multi-piece greedy,
      // not memorized whole words), an unseen-script word (whole-word
      // [UNK]), and a word that matches a prefix then fails midway —
      // the partial match must be DISCARDED, not emitted.
      import s.implicits._
      val model = trainedWordPiece(s, d, 16)
      val planted = Seq(
        (9200001L, "bigwindow joinkey"),
        (9200002L, "αβγ big"),
        (9200003L, "bigπ scan"))
        .toDF("doc_id", "text")
      Tables.documents(s, d).select("doc_id", "text").unionByName(planted)
        .select(col("doc_id"),
          posexplode(WordPiece.encodeCol(col("text"), model)))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("piece_id"))
    }),
    "wordpiece_decode" -> ((s, d) => {
      // the WordPiece roundtrip — and the family's documented LOSSINESS:
      // pieces are substrings (markers stripped on decode), so a fully
      // covered word roundtrips exactly, but an UNK'd word comes back as
      // the literal '[UNK]' — the production detokenizer behavior, the
      // deliberate contrast with unigram's byte fallback (D26d) and
      // byte-level BPE's total coverage (D26b). Planted unseen-script
      // docs make the [UNK] arm non-vacuous; the oracle recomputes both
      // arms from the greedy walk, independent of the decode kernel.
      import s.implicits._
      val model = trainedWordPiece(s, d, 16)
      val planted = Seq(
        (9200002L, "αβγ big"),
        (9200003L, "bigπ scan"))
        .toDF("doc_id", "text")
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(planted)
        .select(col("doc_id"),
          WordPiece.decodeCol(
            WordPiece.encodeCol(col("text"), model), model)
            .as("decoded"))
    }),
    "wordpiece_fertility" -> ((s, d) => {
      // the fertility census for the THIRD family — the bake-off table
      // beside bpe_fertility and unigram_fertility, plus the column the
      // other two can't have: n_unk_words, the count of words the
      // tokenizer DESTROYED (WordPiece's lossy OOV discipline made
      // measurable). Planted Greek docs under a fresh lang make the UNK
      // column non-vacuous on the fully-covered gate corpus. Ratios off
      // exact integer sums; one map-side-combined agg to O(|langs|).
      import s.implicits._
      val model = trainedWordPiece(s, d, 16)
      val planted = Seq(
        (9200011L, "el", "αβγ δεζ big"),
        (9200012L, "el", "πλ table"))
        .toDF("doc_id", "lang", "text")
      Tables.documents(s, d).select("doc_id", "lang", "text")
        .unionByName(planted)
        .select(col("lang"),
          WordPiece.encodeCol(col("text"), model).as("ids"),
          size(filter(split(col("text"), "\\s+"), w => w =!= ""))
            .cast("long").as("n_w"))
        .select(col("lang"), size(col("ids")).cast("long").as("n_tok"),
          size(filter(col("ids"), x => x === 0L)).cast("long").as("n_unk"),
          col("n_w"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_w")).as("n_words"),
          sum(col("n_tok")).as("n_tokens"),
          sum(col("n_unk")).as("n_unk_words"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
          col("n_unk_words"),
          round(col("n_tokens") / when(col("n_words") =!= 0, col("n_words")), 4)
            .as("pieces_per_word"))
    }),
    "bpe_decode" -> ((s, d) => {
      // The DECODE half closing the tokenizer roundtrip: ids → UTF-8
      // bytes → text. encode keeps no end-of-word marker (documented
      // deviation), so the roundtrip contract is decode(encode(text)) ==
      // text with every \s+ run deleted, byte for byte — which is what
      // the oracle computes INDEPENDENTLY (regexp_replace over the raw
      // corpus, no BPE machinery at all): any byte lost or invented
      // anywhere in train→encode→decode breaks equality. Same planted
      // non-ASCII docs — multi-byte UTF-8 must survive the id roundtrip,
      // and the decoded CJK/accented STRINGS (not just ids) cross the
      // engine-vs-DuckDB hash compare.
      import s.implicits._
      val docs = Tables.documents(s, d)
      val merges = trainedMerges(s, d, 16)
      val planted = Seq(
        (9000001L, "café déjà naïve entrée"),
        (9000002L, "über straße größer"),
        (9000003L, "模型 训练 数据"))
        .toDF("doc_id", "text")
      docs.select(col("doc_id"), col("text")).unionByName(planted)
        .select(col("doc_id"),
          Bpe.decodeCol(Bpe.encodeCol(col("text"), merges), merges)
            .as("decoded"))
    }),
    "packed_token_stream" -> ((s, d) => {
      // The END-TO-END training last mile: documents → trained-BPE token
      // ids → greedy sequence packing (budget 512, 4 shards) → the packed
      // TOKEN STREAM (shard, seq_id, pos, token_id) a training job would
      // memory-map. Every stage is replayed in the oracle: encode via the
      // bpe_encode recursion, shard routing via md5-prefix arithmetic
      // (the replayable shardOn override), the greedy first-fit scan as a
      // row-by-row recursive CTE, and stream positions from the packing
      // offsets + per-doc token order. Scale shape: encode is map-only;
      // packing shuffles one skinny (id, n_tokens, shard) row per doc;
      // the stream rebuild pays one window over doc-level rows and one
      // broadcast-sized join back to the id arrays per shard — no stage
      // touches more than O(corpus tokens) rows once.
      packedStream(s, d)
    }),
    "packed_token_stream_eos" -> ((s, d) =>
      // D29 with document separators: every doc followed by the reserved
      // EOS id 272, packer budget charged one slot per doc — the stream
      // form a trainer actually memory-maps. The oracle extends the
      // recursive-CTE packer replay with the +1 overhead and the per-doc
      // separator rows.
      packedStreamEos(s, d)),
    "token_stream_export_eos" -> ((s, d) => {
      // the separator stream LANDED per shard (the F18 roundtrip gate):
      // the position-weighted checksum now also pins every EOS to its
      // slot — a dropped or shifted separator flips the manifest
      val path = sinkPath(d, "token_stream_eos")
      Sink.reset(path)
      Sink.exportTokenStream(s, packedStreamEos(s, d), path)
    }),
    "packed_stream_segments" -> ((s, d) =>
      // D29c: the EOS stream with the per-token SEGMENT id — the
      // document-boundary column a trainer's attention mask consumes
      // (tokens attend only within their own seg_id). A pure function of
      // the packing offsets the oracle already replays: one extra
      // row_number over the window the offset sum shuffles for.
      packedStreamEosSegs(s, d)),
    "token_stream_export_segments" -> ((s, d) => {
      // the segmented stream LANDED (manifest extension): seg_id rides
      // beside token_id in the shard files, and the manifest adds a
      // per-shard segment count + a position-weighted SEGMENT checksum —
      // a dropped or shifted document boundary flips the manifest even
      // when every token survived
      val path = sinkPath(d, "token_stream_segs")
      Sink.reset(path)
      Sink.exportTokenStream(s, packedStreamEosSegs(s, d), path)
    }),
    "packed_stream_roundtrip" -> ((s, d) => {
      // The CONSUMER gate closing the train-data chain end to end: a
      // trainer's data loader reads the landed stream, cuts it at the
      // EOS separators, and feeds segments — so this query does exactly
      // that (encode → pack(+EOS) → export → READ BACK → split on id 272
      // → decode) and emits each rebuilt segment's decoded text. The
      // oracle computes the expected text INDEPENDENTLY of all BPE and
      // packing machinery (the D26b contract: whitespace-deleted raw
      // text) and the segment coordinates from the packer replay — any
      // token dropped, shifted, or invented anywhere in the chain breaks
      // a per-document string equality, not just a checksum. Scale
      // shape: the segment rebuild groups ≤ budget+docs tokens per
      // (shard, seq), the EOS-count window runs inside those bounded
      // groups, and decode is one native kernel call per segment.
      import org.apache.spark.sql.expressions.Window
      val eosId = 272
      val merges = trainedMerges(s, d, 16)
      val path = sinkPath(d, "token_stream_eos_rt")
      Sink.reset(path)
      Sink.exportTokenStream(s, packedStreamEos(s, d), path)
        .queryExecution.toRdd.count(): Unit // land the stream
      val landed = s.read.parquet(path)
      // seg_idx = separators seen strictly before this pos + 1; stream
      // order within a sequence IS doc-id order (the packer's window)
      val wSeen = Window.partitionBy("shard", "seq_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      landed
        .select(col("shard").cast("long").as("shard"), col("seq_id"),
          col("pos"), col("token_id"))
        .withColumn("seg_idx",
          coalesce(sum(when(col("token_id") === eosId, 1L)).over(wSeen),
            lit(0L)) + 1L)
        .filter(col("token_id") =!= eosId)
        .groupBy("shard", "seq_id", "seg_idx")
        .agg(sort_array(collect_list(struct(col("pos"), col("token_id"))))
          .as("pt"))
        .select(col("shard"), col("seq_id"), col("seg_idx"),
          size(col("pt")).cast("long").as("n_tokens"),
          Bpe.decodeCol(transform(col("pt"), p => p.getField("token_id")),
            merges).as("decoded"))
    }),
    "token_stream_export" -> ((s, d) => {
      // The last seam in the training-export chain closed (VERDICT r12
      // #7b): the D29 packed stream LANDED as one parquet file per shard
      // in stream order (Sink.exportTokenStream), manifest recomputed
      // from the WRITTEN tree with a position-weighted token checksum —
      // Σ (pos+1)·token_id mod 1e9+7 pins every token to its stream
      // position, so the gate proves the write→read roundtrip preserved
      // the exact stream a training job would memory-map. The oracle
      // replays the whole chain (encode → shard → greedy pack → stream
      // positions) and aggregates the same manifest per shard.
      val path = sinkPath(d, "token_stream")
      Sink.reset(path)
      Sink.exportTokenStream(s, packedStream(s, d), path)
    }),
    "seq_packing" -> ((s, d) => {
      // Token-budget sequence packing over the corpus' whitespace token
      // counts: per-sequence fill statistics (greedy shard-local packing).
      val toks = TextOps.tokenCounts(Tables.documents(s, d), "doc_id", "text")
      Packing.packSequences(toks, "doc_id", "ws_tokens", budget = 1024, shards = 8)
        .groupBy("shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
    }),
    "seq_packing_bfd" -> ((s, d) => {
      // Best-fit-decreasing packing (D16b, Johnson 1973's BFD —
      // "sorted packing" in the training-data literature): largest-first
      // within each shard, each doc into the FULLEST open sequence it
      // fits (ties to the smallest seq_id). Unlike greedy seq_packing
      // (xxhash shards → rows-only), this one runs on the REPLAYABLE
      // md5-prefix shard routing so the full per-doc assignment is
      // second-engine-checked: the oracle re-runs the best-fit scan as a
      // recursive CTE carrying the open-bin load list, with
      // list_max∘list_filter picking the same fullest-that-fits bin and
      // list_position the same smallest-seq tie-break.
      val toks = TextOps.tokenCounts(Tables.documents(s, d), "doc_id", "text")
      val shardCol = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("long") % 4
      Packing.packBestFit(toks, "doc_id", "ws_tokens",
          budget = 128, shards = 4, shardOn = Some(shardCol))
        .select(col("id").as("doc_id"), col("n_tokens"),
          col("shard").cast("long").as("shard"), col("seq_id"))
    }),
    "packing_efficiency" -> ((s, d) => {
      // The padding-waste census every pretraining loader publishes —
      // the decision table for the packer choice: both packers run on
      // the SAME token counts, budget, and (replayable) shard routing,
      // and the census reports bins, padding slots (Σ per-bin
      // budget − used accounting slots), and utilization per strategy.
      // At the gate corpus BFD buys its textbook win over the id-order
      // greedy scan; the oracle replays BOTH packers end to end plus
      // the rollup, so a drift in either state machine flips the gate.
      // Utilization derives from the exact integer sums (both engines
      // divide identical numbers).
      val budget = 128L
      val toks = TextOps.tokenCounts(Tables.documents(s, d), "doc_id", "text")
      val shardCol = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("long") % 4
      def census(assigned: DataFrame, strategy: String): DataFrame =
        assigned
          .groupBy("shard", "seq_id")
          .agg(sum(least(col("n_tokens"), lit(budget))).as("used"),
            count(lit(1)).as("nd"), sum("n_tokens").as("nt"))
          .agg(count(lit(1)).as("n_seqs"), sum("nd").as("n_docs"),
            sum("nt").as("total_tokens"),
            (count(lit(1)) * lit(budget) - sum("used")).as("padding_tokens"))
          .select(lit(strategy).as("strategy"), col("n_seqs"), col("n_docs"),
            col("total_tokens"), col("padding_tokens"),
            round((col("n_seqs") * lit(budget) - col("padding_tokens")) /
              (col("n_seqs") * lit(budget) * lit(1.0)), 4).as("utilization"))
      census(Packing.packSequences(toks, "doc_id", "ws_tokens",
          budget, shards = 4, shardOn = Some(shardCol)), "greedy")
        .unionByName(census(Packing.packBestFit(toks, "doc_id", "ws_tokens",
          budget, shards = 4, shardOn = Some(shardCol)), "bfd"))
    }),
    "seq_packing_check" -> ((s, d) => {
      // Invariant oracle for the packer, second-engine-pinned where a
      // second engine CAN pin it: DuckDB independently recomputes the
      // corpus' exact whitespace-token sum (conservation — every token
      // lands in exactly one bin, nothing dropped or double-packed), and
      // the structural invariants are pinned TRUE: no multi-doc bin over
      // budget (an oversized single doc legitimately gets its own bin),
      // and the bin count inside the greedy first-fit bounds — at least
      // ceil(total/budget) (pigeonhole), at most total/(budget-maxdoc)
      // closed bins (a bin only closes when the next doc doesn't fit, so
      // every closed bin holds > budget-maxdoc tokens) plus one open bin
      // per shard.
      val budget = 1024L
      val shards = 8
      val toks = TextOps.tokenCounts(Tables.documents(s, d), "doc_id", "text")
      val bins = Packing.packSequences(toks, "doc_id", "ws_tokens", budget, shards)
        .groupBy("shard", "seq_id")
        .agg(sum("n_tokens").as("seq_tokens"), count(lit(1)).as("n_docs"),
          max("n_tokens").as("max_doc"))
      bins.agg(
          sum("seq_tokens").as("total_tokens"),
          count(lit(1)).as("__bins"),
          max("max_doc").as("__maxdoc"),
          min(when(col("seq_tokens") <= budget || col("n_docs") === 1, 1)
            .otherwise(0)).as("__budget_ok"))
        .select(col("total_tokens"),
          (col("__budget_ok") === 1).as("budget_ok"),
          (col("__bins") >= ceil(col("total_tokens") / lit(budget.toDouble)) &&
            (col("__maxdoc") >= budget ||
              col("__bins") <= ceil(col("total_tokens") /
                (lit(budget.toDouble) - col("__maxdoc"))) + lit(shards)))
            .as("bins_ok"))
    }),
    "chunk_docs" -> ((s, d) =>
      // Long-document → context-window preparation: ≤32-token chunks with
      // 8 tokens of overlap (small window so the gate corpus actually
      // chunks). One projection + one explode; DuckDB replays the chunk
      // boundaries and text token-for-token.
      TextOps.chunkDocs(Tables.documents(s, d), "doc_id", "text",
          maxTokens = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_hash")))
  )

  val oracleSql: Map[String, String] = Map(
    "seq_packing_check" ->
      // token conservation is recomputed EXACTLY by the second engine
      // (same whitespace tokenization as token_count); the structural
      // invariants (no multi-doc bin over budget, bin count inside the
      // greedy first-fit bounds) are pinned TRUE
      """SELECT CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS total_tokens,
           TRUE AS budget_ok, TRUE AS bins_ok
         FROM documents""",
    "seq_packing_bfd" ->
      // the best-fit-decreasing scan replayed END TO END via the shared
      // packBfdCtes fragment (EntryOps — ONE copy of the state machine
      // across every packing oracle, the wpGreedyCtes discipline): same
      // ws token counts, same md5-prefix routing, every per-doc
      // assignment crossing the engine hash.
      (s"""WITH RECURSIVE
         ${packToksCte(4)},
         ${packBfdCtes("bfd", 128)}
         SELECT doc_id, n AS n_tokens, CAST(shard AS BIGINT) AS shard,
           CAST(seq AS BIGINT) AS seq_id
         FROM bfd"""),
    "packing_efficiency" ->
      // BOTH packers replayed from the shared fragments (packGreedyCtes:
      // the id-order state machine with the raw-n overflow test;
      // packBfdCtes: the best-fit load-list recursion), then the same
      // integer census: bins, padding slots, utilization from the
      // identical division
      (s"""WITH RECURSIVE
         ${packToksCte(4)},
         ${packGreedyCtes("gpack", 128)},
         ${packBfdCtes("bfd", 128)},
         bins AS (
           SELECT 'greedy' AS strategy, shard, seq,
             sum(LEAST(n, 128)) AS used, count(*) AS nd, sum(n) AS nt
           FROM gpack GROUP BY 1, 2, 3
           UNION ALL
           SELECT 'bfd' AS strategy, shard, seq,
             sum(LEAST(n, 128)) AS used, count(*) AS nd, sum(n) AS nt
           FROM bfd GROUP BY 1, 2, 3),
         census AS (
           SELECT strategy, CAST(count(*) AS BIGINT) AS n_seqs,
             CAST(sum(nd) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS total_tokens,
             CAST(count(*) * 128 - sum(used) AS BIGINT) AS padding_tokens
           FROM bins GROUP BY 1)
         SELECT strategy, n_seqs, n_docs, total_tokens, padding_tokens,
           round((n_seqs * 128 - padding_tokens) / (1.0 * n_seqs * 128), 4)
             AS utilization
         FROM census"""),
    "chunk_docs" ->
      // same tokenization, same start sequence 1, 1+24, … capped at
      // n-overlap, same 32-token slices
      """WITH t AS (
           SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, toks,
             CAST(unnest(generate_series(1, greatest(len(toks) - 8, 1), 24))
               AS INT) AS st
           FROM t)
         SELECT doc_id, CAST((st - 1) / 24 AS INT) AS chunk_id,
           len(toks[st:st+31])::BIGINT AS n_tokens,
           md5(array_to_string(toks[st:st+31], ' ')) AS chunk_hash
         FROM c""",
    "bpe_merges" ->
      // [GOLDEN @ gate corpus: sf0.01, seed=42 — re-derive on SF change]
      // the 16 trained byte-level merges in rank order (deterministic
      // training: global word-freq dict, lexicographic tie-break);
      // symbols are 2-hex-digit UTF-8 bytes — on this pure-ASCII corpus
      // they are the hex rendering of the former char merges (e.g.
      // '65 72' = 'e r')
      """SELECT CAST(rank AS BIGINT) AS rank, pair FROM (VALUES
           (0,'65 72'),(1,'69 6e'),(2,'6f 77'),(3,'6f 72'),(4,'73 74'),
           (5,'6d 6572'),(6,'61 74'),(7,'6c 75'),(8,'61 72'),(9,'70 6172'),
           (10,'6a 6f'),(11,'6a6f 696e'),(12,'61 73'),(13,'6173 68'),
           (14,'68 617368'),(15,'72 6f77')) AS t(rank, pair)""",
    "bpe_fertility" ->
      // the bpe_token_count recursion (same pinned merge table) over the
      // plain corpus, rolled up per lang; ratios divide the exact integer
      // sums (identical doubles in any IEEE engine), zero-guard via nullif
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         words AS (
           SELECT doc_id, w, count(*) AS n_occ FROM (
             SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
             FROM documents) u WHERE w <> '' GROUP BY doc_id, w),
         dw AS (SELECT DISTINCT w FROM words),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         counts AS (
           SELECT w, len(string_split(s, ',')) - 2 AS n_tok
           FROM rec WHERE r = 16),
         perdoc AS (
           SELECT doc_id, sum(n_occ * n_tok) AS n_bpe, sum(n_occ) AS n_w
           FROM words JOIN counts USING (w) GROUP BY doc_id),
         perlang AS (
           SELECT d.lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(coalesce(p.n_w, 0)) AS BIGINT) AS n_words,
             CAST(sum(coalesce(p.n_bpe, 0)) AS BIGINT) AS n_tokens,
             CAST(sum(octet_length(encode(d.text))) AS BIGINT) AS n_bytes
           FROM documents d LEFT JOIN perdoc p USING (doc_id)
           GROUP BY 1)
         SELECT lang, n_docs, n_words, n_tokens, n_bytes,
           round(n_tokens / (1.0 * nullif(n_words, 0)), 4) AS tokens_per_word,
           round(n_bytes / (1.0 * nullif(n_tokens, 0)), 4) AS bytes_per_token
         FROM perlang""",
    "bpe_token_count" ->
      // full second-engine replay of byte-level BPE APPLICATION: the same
      // pinned merge table (gated by bpe_merges), applied as a recursive
      // first-occurrence replace over comma-delimited hex-byte-symbol
      // strings (regexp_extract_all over lower(hex(w)) = the word's UTF-8
      // bytes) — one recursion step merges one occurrence of the current
      // rank's pair, advancing rank when none remain; rank-monotone
      // application equals the min-rank loop because merging never
      // re-creates a consumed symbol. The corpus is documents plus the
      // PLANTED non-ASCII docs (chr() codepoints — byte-for-byte the
      // engine's \u literals) proving non-[a-z] text is counted, not
      // stripped. The final LEFT JOIN keeps a (doc_id, 0, 0) row for a
      // doc with zero words — matching the engine, which projects over
      // every doc
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9000001, 'caf' || chr(233) || ' d' || chr(233) || 'j' ||
                       chr(224) || ' na' || chr(239) || 've entr' ||
                       chr(233) || 'e'),
             (9000002, chr(252) || 'ber stra' || chr(223) || 'e gr' ||
                       chr(246) || chr(223) || 'er'),
             (9000003, chr(27169) || chr(22411) || ' ' || chr(35757) ||
                       chr(32451) || ' ' || chr(25968) || chr(25454))
           ) AS t(doc_id, text)),
         words AS (
           SELECT doc_id, w, count(*) AS n_occ FROM (
             SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
             FROM corpus) u WHERE w <> '' GROUP BY doc_id, w),
         dw AS (SELECT DISTINCT w FROM words),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         counts AS (
           SELECT w, len(string_split(s, ',')) - 2 AS n_tok
           FROM rec WHERE r = 16),
         perdoc AS (
           SELECT doc_id, sum(n_occ * n_tok) AS n_bpe, sum(n_occ) AS n_w
           FROM words JOIN counts USING (w) GROUP BY doc_id)
         SELECT c.doc_id,
           CAST(coalesce(p.n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
           CAST(coalesce(p.n_w, 0) AS BIGINT) AS n_words
         FROM corpus c LEFT JOIN perdoc p USING (doc_id)""",
    "bpe_encode" ->
      // full second-engine replay of byte-level BPE ENCODING: the
      // bpe_token_count recursion produces each distinct word's final
      // symbol string; symbols then map to ids — a 2-hex-digit symbol is
      // its byte value (char-position arithmetic, no hex-cast dependence),
      // a merged symbol is 256 + the smallest rank whose concatenation
      // matches (the engine's idMap rule). generate_subscripts+unnest
      // expand in lockstep, and per-doc positions rebuild from
      // (word index, symbol index) — so the COMPLETE id sequence of every
      // doc, planted non-ASCII included, is checked token for token
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9000001, 'caf' || chr(233) || ' d' || chr(233) || 'j' ||
                       chr(224) || ' na' || chr(239) || 've entr' ||
                       chr(233) || 'e'),
             (9000002, chr(252) || 'ber stra' || chr(223) || 'e gr' ||
                       chr(246) || chr(223) || 'er'),
             (9000003, chr(27169) || chr(22411) || ' ' || chr(35757) ||
                       chr(32451) || ' ' || chr(25968) || chr(25454))
           ) AS t(doc_id, text)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM corpus),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows)
         SELECT doc_id,
           row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
             AS pos,
           CAST(token_id AS BIGINT) AS token_id
         FROM wordpos JOIN ids USING (w)""",
    "unigram_vocab" ->
      // [GOLDEN @ gate corpus: sf0.01 — re-derive on SF change by
      // dumping the Spark side] the trained unigram-LM piece table in
      // lexicographic-id order from 257: 24 coverage chars + the 31
      // whole words the hard-EM converged on (this corpus' words recur
      // enough that they beat their own char decompositions), 1e6-scaled
      // StrictMath log-probs — trainer drift anywhere (seed pool, EM,
      // pruning, scaling) flips this red. Ids 1..256 are the fixed
      // byte-fallback pieces, derived (not pinned) in both engines; the
      // VALUES rows keep their rank and shift by the 256 reserved ids
      // in SQL.
      """SELECT CAST(i + 1 AS BIGINT) AS piece_id,
           '<0x' || upper(printf('%02x', i)) || '>' AS piece,
           CAST(0 AS BIGINT) AS logp_scaled
         FROM range(0, 256) t(i)
         UNION ALL
         SELECT CAST(piece_id + 256 AS BIGINT) AS piece_id, piece,
           CAST(logp_scaled AS BIGINT) AS logp_scaled
         FROM (VALUES
           (1,'a',-3464386),(2,'agg',-3440802),(3,'b',-10244307),
           (4,'batch',-3401624),(5,'big',-3468941),(6,'c',-10244307),
           (7,'column',-3404831),(8,'custom',-3404831),(9,'d',-10244307),
           (10,'data',-3433063),(11,'dup',-6986211),(12,'e',-10244307),
           (13,'er',-3404831),(14,'f',-10244307),(15,'fast',-3494376),
           (16,'filter',-3405902),(17,'g',-10244307),(18,'group',-3466661),
           (19,'h',-10244307),(20,'hash',-3391008),(21,'i',-10244307),
           (22,'j',-10244307),(23,'join',-3373216),(24,'k',-10244307),
           (25,'key',-3446367),(26,'l',-10244307),(27,'line',-3430863),
           (28,'m',-10244307),(29,'merge',-3422110),(30,'n',-10244307),
           (31,'o',-10244307),(32,'order',-3428667),(33,'p',-10244307),
           (34,'part',-3466661),(35,'q',-10244307),(36,'query',-3474665),
           (37,'r',-10244307),(38,'row',-3395241),(39,'s',-10244307),
           (40,'scan',-3402692),(41,'slow',-3422110),(42,'small',-3411276),
           (43,'sort',-3473518),(44,'spark',-3464386),(45,'stream',-3455336),
           (46,'t',-10244307),(47,'table',-3433063),(48,'the',-3510906),
           (49,'u',-10244307),(50,'v',-10244307),(51,'value',-3445252),
           (52,'vector',-3428667),(53,'w',-10244307),(54,'window',-3457591),
           (55,'y',-10244307)
         ) AS t(piece_id, piece, logp_scaled)""",
    "unigram_fertility" ->
      // the Viterbi DP again (same pinned piece table, same list-DP
      // recursion — only the PIECE COUNT per word is consumed: the bp
      // backtrack walk counts steps), rolled up per lang exactly like
      // bpe_fertility; ratios divide the same exact integer sums. Step
      // count == emitted-id count here because the gate corpus is fully
      // covered (an unseen char would emit one id per UTF-8 byte); the
      // vocab CTE's ids are never consumed, only piece + lp
      """WITH RECURSIVE
         vocab AS (SELECT * FROM (VALUES
           (1,'a',-3464386),(2,'agg',-3440802),(3,'b',-10244307),
           (4,'batch',-3401624),(5,'big',-3468941),(6,'c',-10244307),
           (7,'column',-3404831),(8,'custom',-3404831),(9,'d',-10244307),
           (10,'data',-3433063),(11,'dup',-6986211),(12,'e',-10244307),
           (13,'er',-3404831),(14,'f',-10244307),(15,'fast',-3494376),
           (16,'filter',-3405902),(17,'g',-10244307),(18,'group',-3466661),
           (19,'h',-10244307),(20,'hash',-3391008),(21,'i',-10244307),
           (22,'j',-10244307),(23,'join',-3373216),(24,'k',-10244307),
           (25,'key',-3446367),(26,'l',-10244307),(27,'line',-3430863),
           (28,'m',-10244307),(29,'merge',-3422110),(30,'n',-10244307),
           (31,'o',-10244307),(32,'order',-3428667),(33,'p',-10244307),
           (34,'part',-3466661),(35,'q',-10244307),(36,'query',-3474665),
           (37,'r',-10244307),(38,'row',-3395241),(39,'s',-10244307),
           (40,'scan',-3402692),(41,'slow',-3422110),(42,'small',-3411276),
           (43,'sort',-3473518),(44,'spark',-3464386),(45,'stream',-3455336),
           (46,'t',-10244307),(47,'table',-3433063),(48,'the',-3510906),
           (49,'u',-10244307),(50,'v',-10244307),(51,'value',-3445252),
           (52,'vector',-3428667),(53,'w',-10244307),(54,'window',-3457591),
           (55,'y',-10244307)
         ) v(id, piece, lp)),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM (SELECT doc_id, string_split_regex(text, '\s+') AS ws
                   FROM documents) u0) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         dprec AS (
           SELECT w, length(w) AS len, 0 AS pos,
             [CAST(0 AS BIGINT)] AS dp, [CAST(0 AS INT)] AS bp
           FROM dw
           UNION ALL
           SELECT r.w, r.len, r.pos + 1,
             list_append(r.dp, greatest(
               coalesce((r.dp[r.pos + 1] + coalesce(v1.lp, -20000000)), -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 2 THEN (r.dp[r.pos + 0] + v2.lp) END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 3 THEN (r.dp[r.pos - 1] + v3.lp) END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 4 THEN (r.dp[r.pos - 2] + v4.lp) END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 5 THEN (r.dp[r.pos - 3] + v5.lp) END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 6 THEN (r.dp[r.pos - 4] + v6.lp) END, -4611686018427387904))),
             list_append(r.bp, CAST(((greatest(
               coalesce((r.dp[r.pos + 1] + coalesce(v1.lp, -20000000)) * 8 + 1, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 2 THEN (r.dp[r.pos + 0] + v2.lp) * 8 + 2 END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 3 THEN (r.dp[r.pos - 1] + v3.lp) * 8 + 3 END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 4 THEN (r.dp[r.pos - 2] + v4.lp) * 8 + 4 END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 5 THEN (r.dp[r.pos - 3] + v5.lp) * 8 + 5 END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 6 THEN (r.dp[r.pos - 4] + v6.lp) * 8 + 6 END, -4611686018427387904)) % 8) + 8) % 8 AS INT))
           FROM dprec r
           LEFT JOIN vocab v1 ON v1.piece = substr(r.w, r.pos + 1, 1)
           LEFT JOIN vocab v2 ON r.pos + 1 >= 2 AND v2.piece = substr(r.w, r.pos + 0, 2)
           LEFT JOIN vocab v3 ON r.pos + 1 >= 3 AND v3.piece = substr(r.w, r.pos - 1, 3)
           LEFT JOIN vocab v4 ON r.pos + 1 >= 4 AND v4.piece = substr(r.w, r.pos - 2, 4)
           LEFT JOIN vocab v5 ON r.pos + 1 >= 5 AND v5.piece = substr(r.w, r.pos - 3, 5)
           LEFT JOIN vocab v6 ON r.pos + 1 >= 6 AND v6.piece = substr(r.w, r.pos - 4, 6)
           WHERE r.pos < r.len),
         walk AS (
           SELECT w, bp, len AS pos, CAST(0 AS BIGINT) AS n_tok
           FROM dprec WHERE pos = len
           UNION ALL
           SELECT w, bp, pos - bp[pos + 1], n_tok + 1
           FROM walk WHERE pos > 0),
         wtok AS (SELECT w, n_tok FROM walk WHERE pos = 0),
         perdoc AS (
           SELECT wp.doc_id, CAST(sum(t.n_tok) AS BIGINT) AS n_tok,
             CAST(count(*) AS BIGINT) AS n_w
           FROM wordpos wp JOIN wtok t USING (w) GROUP BY 1),
         perlang AS (
           SELECT d.lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(coalesce(p.n_w, 0)) AS BIGINT) AS n_words,
             CAST(sum(coalesce(p.n_tok, 0)) AS BIGINT) AS n_tokens,
             CAST(sum(octet_length(encode(d.text))) AS BIGINT) AS n_bytes
           FROM documents d LEFT JOIN perdoc p USING (doc_id)
           GROUP BY 1)
         SELECT lang, n_docs, n_words, n_tokens, n_bytes,
           round(n_tokens / (1.0 * nullif(n_words, 0)), 4) AS tokens_per_word,
           round(n_bytes / (1.0 * nullif(n_tokens, 0)), 4) AS bytes_per_token
         FROM perlang""",
    "unigram_decode" ->
      // the roundtrip expectation computed with NO tokenizer machinery:
      // pieces are substrings and byte-fallback restores unseen chars,
      // so decode(encode(text)) is text with every \s+ run deleted, byte
      // for byte (the bpe_decode contract) — for the covered corpus AND
      // the planted unseen-script docs (chr() codepoints: Greek 2-byte,
      // U+1F642 emoji 4-byte), which pre-fallback would have lost chars
      // at UNK
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9100002, chr(945) || chr(946) || chr(947) || ' sort'),
             (9100003, chr(128578) || ' data ' || chr(955) || 'x')
           ) t(doc_id, text))
         SELECT doc_id,
           regexp_replace(text, '[ \t\n\x0b\f\r]+', '', 'g') AS decoded
         FROM corpus""",
    "unigram_encode" ->
      // the Viterbi DP itself replayed in DuckDB over the pinned piece
      // table: per distinct word, a recursive CTE carries the dp/bp
      // vectors as LISTS and takes each step via six vocab LEFT JOINs —
      // one per candidate piece length — with the best transition picked
      // by greatest() over the integer scores (correlated subqueries in
      // a recursive member hang the engine; joins don't). The tie-break
      // is the kernel's longest-piece rule, encoded order-free as a
      // packed key score·8+len (len ∈ 1..6 < 8, and integer scores
      // differ by ≥1 scaled unit, so key order IS (score, len) order);
      // a second recursion backtracks bp to piece ids — a vocab hit maps
      // to its id + 256 (the reserved byte-piece block), a miss (always
      // a 1-char step) expands to the char's UTF-8 bytes' ids 1 + byte,
      // derived from pure code-point arithmetic so both engines compute
      // the identical byte-fallback expansion — and per-doc order
      // reassembles from word positions. Integer scores end to end — no
      // float comparison in either engine.
      """WITH RECURSIVE
         vocab AS (SELECT * FROM (VALUES
           (1,'a',-3464386),(2,'agg',-3440802),(3,'b',-10244307),
           (4,'batch',-3401624),(5,'big',-3468941),(6,'c',-10244307),
           (7,'column',-3404831),(8,'custom',-3404831),(9,'d',-10244307),
           (10,'data',-3433063),(11,'dup',-6986211),(12,'e',-10244307),
           (13,'er',-3404831),(14,'f',-10244307),(15,'fast',-3494376),
           (16,'filter',-3405902),(17,'g',-10244307),(18,'group',-3466661),
           (19,'h',-10244307),(20,'hash',-3391008),(21,'i',-10244307),
           (22,'j',-10244307),(23,'join',-3373216),(24,'k',-10244307),
           (25,'key',-3446367),(26,'l',-10244307),(27,'line',-3430863),
           (28,'m',-10244307),(29,'merge',-3422110),(30,'n',-10244307),
           (31,'o',-10244307),(32,'order',-3428667),(33,'p',-10244307),
           (34,'part',-3466661),(35,'q',-10244307),(36,'query',-3474665),
           (37,'r',-10244307),(38,'row',-3395241),(39,'s',-10244307),
           (40,'scan',-3402692),(41,'slow',-3422110),(42,'small',-3411276),
           (43,'sort',-3473518),(44,'spark',-3464386),(45,'stream',-3455336),
           (46,'t',-10244307),(47,'table',-3433063),(48,'the',-3510906),
           (49,'u',-10244307),(50,'v',-10244307),(51,'value',-3445252),
           (52,'vector',-3428667),(53,'w',-10244307),(54,'window',-3457591),
           (55,'y',-10244307)
         ) v(id, piece, lp)),
         corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9100001, 'hashrow streamjoin mergevalue'),
             (9100002, chr(945) || chr(946) || chr(947) || ' sort'),
             (9100003, chr(128578) || ' data')
           ) t(doc_id, text)),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM (SELECT doc_id, string_split_regex(text, '\s+') AS ws
                   FROM corpus) u0) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         dprec AS (
           SELECT w, length(w) AS len, 0 AS pos,
             [CAST(0 AS BIGINT)] AS dp, [CAST(0 AS INT)] AS bp
           FROM dw
           UNION ALL
           SELECT r.w, r.len, r.pos + 1,
             list_append(r.dp, greatest(
               coalesce((r.dp[r.pos + 1] + coalesce(v1.lp, -20000000)), -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 2 THEN (r.dp[r.pos + 0] + v2.lp) END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 3 THEN (r.dp[r.pos - 1] + v3.lp) END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 4 THEN (r.dp[r.pos - 2] + v4.lp) END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 5 THEN (r.dp[r.pos - 3] + v5.lp) END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 6 THEN (r.dp[r.pos - 4] + v6.lp) END, -4611686018427387904))),
             list_append(r.bp, CAST(((greatest(
               coalesce((r.dp[r.pos + 1] + coalesce(v1.lp, -20000000)) * 8 + 1, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 2 THEN (r.dp[r.pos + 0] + v2.lp) * 8 + 2 END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 3 THEN (r.dp[r.pos - 1] + v3.lp) * 8 + 3 END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 4 THEN (r.dp[r.pos - 2] + v4.lp) * 8 + 4 END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 5 THEN (r.dp[r.pos - 3] + v5.lp) * 8 + 5 END, -4611686018427387904),
               coalesce(CASE WHEN r.pos + 1 >= 6 THEN (r.dp[r.pos - 4] + v6.lp) * 8 + 6 END, -4611686018427387904)) % 8) + 8) % 8 AS INT))
           FROM dprec r
           LEFT JOIN vocab v1 ON v1.piece = substr(r.w, r.pos + 1, 1)
           LEFT JOIN vocab v2 ON r.pos + 1 >= 2 AND v2.piece = substr(r.w, r.pos + 0, 2)
           LEFT JOIN vocab v3 ON r.pos + 1 >= 3 AND v3.piece = substr(r.w, r.pos - 1, 3)
           LEFT JOIN vocab v4 ON r.pos + 1 >= 4 AND v4.piece = substr(r.w, r.pos - 2, 4)
           LEFT JOIN vocab v5 ON r.pos + 1 >= 5 AND v5.piece = substr(r.w, r.pos - 3, 5)
           LEFT JOIN vocab v6 ON r.pos + 1 >= 6 AND v6.piece = substr(r.w, r.pos - 4, 6)
           WHERE r.pos < r.len),
         back AS (
           SELECT w, bp, len AS pos, CAST([] AS BIGINT[]) AS ids
           FROM dprec WHERE pos = len
           UNION ALL
           SELECT b.w, b.bp, b.pos - b.bp[b.pos + 1],
             (CASE
                WHEN v.id IS NOT NULL THEN CAST([v.id + 256] AS BIGINT[])
                WHEN unicode(substr(b.w, b.pos, 1)) < 128 THEN
                  CAST([unicode(substr(b.w, b.pos, 1)) + 1] AS BIGINT[])
                WHEN unicode(substr(b.w, b.pos, 1)) < 2048 THEN
                  CAST([192 + unicode(substr(b.w, b.pos, 1)) // 64 + 1,
                        128 + unicode(substr(b.w, b.pos, 1)) % 64 + 1]
                    AS BIGINT[])
                WHEN unicode(substr(b.w, b.pos, 1)) < 65536 THEN
                  CAST([224 + unicode(substr(b.w, b.pos, 1)) // 4096 + 1,
                        128 + (unicode(substr(b.w, b.pos, 1)) // 64) % 64 + 1,
                        128 + unicode(substr(b.w, b.pos, 1)) % 64 + 1]
                    AS BIGINT[])
                ELSE
                  CAST([240 + unicode(substr(b.w, b.pos, 1)) // 262144 + 1,
                        128 + (unicode(substr(b.w, b.pos, 1)) // 4096) % 64 + 1,
                        128 + (unicode(substr(b.w, b.pos, 1)) // 64) % 64 + 1,
                        128 + unicode(substr(b.w, b.pos, 1)) % 64 + 1]
                    AS BIGINT[])
              END) || b.ids
           FROM back b
           LEFT JOIN vocab v
             ON v.piece = substr(b.w, b.pos - b.bp[b.pos + 1] + 1,
                                 b.bp[b.pos + 1])
           WHERE b.pos > 0),
         word_ids AS (SELECT w, ids FROM back WHERE pos = 0),
         tok AS (
           SELECT doc_id, widx, generate_subscripts(ids, 1) AS i, ids
           FROM wordpos JOIN word_ids USING (w))
         SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY widx, i) - 1 AS BIGINT) AS pos,
           CAST(ids[i] AS BIGINT) AS piece_id
         FROM tok""",
    "wordpiece_vocab" ->
      // [GOLDEN @ gate corpus — see wpVocabValues] the pinned trained
      // vocabulary plus the derived [UNK] row 0 (derived in both
      // engines, pinned in neither)
      s"""SELECT CAST(0 AS BIGINT) AS piece_id, '[UNK]' AS piece
         UNION ALL
         SELECT CAST(id AS BIGINT), piece FROM (VALUES
           $wpVocabValues
         ) v(id, piece)""",
    "wordpiece_encode" ->
      // the greedy longest-match walk replayed in DuckDB (wpGreedyCtes:
      // per distinct word, one matched piece per recursion step via six
      // per-length vocab joins + a longest-hit CASE ladder; no hit →
      // whole word [UNK]), then per-doc positions reassembled from word
      // order — the bpe_encode assembly. Planted docs: novel words over
      // seen chars, a whole-word-[UNK] Greek word, and a
      // prefix-match-then-fail word whose partial ids must be discarded.
      (wpGreedyCtes(
        """SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9200001, 'bigwindow joinkey'),
             (9200002, chr(945) || chr(946) || chr(947) || ' big'),
             (9200003, 'big' || chr(960) || ' scan')
           ) t(doc_id, text)""") +
      """, witem AS (
           SELECT w, generate_subscripts(ids, 1) AS sidx, unnest(ids) AS piece_id
           FROM wtok)
         SELECT doc_id,
           row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
             AS pos,
           CAST(piece_id AS BIGINT) AS piece_id
         FROM wordpos JOIN witem USING (w)"""),
    "wordpiece_decode" ->
      // both roundtrip arms recomputed from the greedy walk with NO
      // decode machinery: a word that segments comes back as ITSELF
      // (pieces are substrings, markers stripped), a failed word as the
      // literal '[UNK]' — concatenated in word order per doc (empty/
      // no-word docs LEFT-JOIN to '')
      (wpGreedyCtes(
        """SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9200002, chr(945) || chr(946) || chr(947) || ' big'),
             (9200003, 'big' || chr(960) || ' scan')
           ) t(doc_id, text)""") +
      """, wdec AS (
           SELECT w, CASE WHEN failed THEN '[UNK]' ELSE w END AS dec
           FROM wtok),
         perdoc AS (
           SELECT wp.doc_id, string_agg(x.dec, '' ORDER BY wp.widx) AS decoded
           FROM wordpos wp JOIN wdec x USING (w) GROUP BY 1)
         SELECT c.doc_id, coalesce(p.decoded, '') AS decoded
         FROM corpus c LEFT JOIN perdoc p USING (doc_id)"""),
    "wordpiece_fertility" ->
      // the greedy walk again, only the per-word piece count and failed
      // flag consumed, rolled up per lang exactly like the other two
      // families' fertility censuses — plus n_unk_words, the words the
      // tokenizer destroyed. Ratios divide the same exact integer sums.
      (wpGreedyCtes(
        """SELECT doc_id, lang, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9200011, 'el', chr(945) || chr(946) || chr(947) || ' ' ||
                       chr(948) || chr(949) || chr(950) || ' big'),
             (9200012, 'el', chr(960) || chr(955) || ' table')
           ) t(doc_id, lang, text)""") +
      """, wstat AS (
           SELECT w, CAST(len(ids) AS BIGINT) AS n_tok,
             CASE WHEN failed THEN 1 ELSE 0 END AS n_unk
           FROM wtok),
         perdoc AS (
           SELECT wp.doc_id, CAST(sum(t.n_tok) AS BIGINT) AS n_tok,
             CAST(sum(t.n_unk) AS BIGINT) AS n_unk,
             CAST(count(*) AS BIGINT) AS n_w
           FROM wordpos wp JOIN wstat t USING (w) GROUP BY 1),
         perlang AS (
           SELECT c.lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(coalesce(p.n_w, 0)) AS BIGINT) AS n_words,
             CAST(sum(coalesce(p.n_tok, 0)) AS BIGINT) AS n_tokens,
             CAST(sum(coalesce(p.n_unk, 0)) AS BIGINT) AS n_unk_words
           FROM corpus c LEFT JOIN perdoc p USING (doc_id)
           GROUP BY 1)
         SELECT lang, n_docs, n_words, n_tokens, n_unk_words,
           round(n_tokens / (1.0 * nullif(n_words, 0)), 4) AS pieces_per_word
         FROM perlang"""),
    "bpe_vocab" ->
      // rebuilt from the same pinned merge table bpe_merges gates: 256
      // base-byte rows plus one row per FIRST-occurrence concatenation
      // (min-rank rule — a duplicate concatenation never mints an id)
      """WITH m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b))
         SELECT CAST(i AS BIGINT) AS token_id, printf('%02x', i) AS symbol_hex
         FROM range(0, 256) t(i)
         UNION ALL
         SELECT CAST(256 + rank AS BIGINT) AS token_id, a || b AS symbol_hex
         FROM m
         WHERE rank = (SELECT min(m2.rank) FROM m m2
                       WHERE m2.a || m2.b = m.a || m.b)""",
    "bpe_decode" ->
      // the roundtrip oracle computes the EXPECTED decode output with no
      // BPE machinery at all: decode(encode(text)) must equal text with
      // every \s+ run deleted (encode splits on \s+ and keeps no
      // end-of-word marker), byte for byte. The explicit class
      // [ \t\n\x0B\f\r] is exactly Java's \s (the kernel's split), spelled
      // out so RE2-vs-Java class differences can't leak in; planted
      // non-ASCII docs (chr() codepoints) prove multi-byte UTF-8 survives
      // the id roundtrip as STRINGS, not just ids
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT * FROM (VALUES
             (9000001, 'caf' || chr(233) || ' d' || chr(233) || 'j' ||
                       chr(224) || ' na' || chr(239) || 've entr' ||
                       chr(233) || 'e'),
             (9000002, chr(252) || 'ber stra' || chr(223) || 'e gr' ||
                       chr(246) || chr(223) || 'er'),
             (9000003, chr(27169) || chr(22411) || ' ' || chr(35757) ||
                       chr(32451) || ' ' || chr(25968) || chr(25454))
           ) AS t(doc_id, text))
         SELECT doc_id,
           regexp_replace(text, '[ \t\n\x0B\f\r]+', '', 'g') AS decoded
         FROM corpus""",
    "packed_token_stream" ->
      // end-to-end replay of the training last mile: the bpe_encode
      // recursion yields each doc's token stream and count; md5-prefix
      // arithmetic reroutes the engine's shardOn override; the greedy
      // first-fit packer re-runs as a row-by-row recursive CTE whose
      // state transition is copied from Packing.packSequences (raw-n
      // overflow test, LEAST(n, budget) increment); window offsets plus
      // per-doc token order rebuild every stream position. 92k tokens,
      // checked token for token
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n > 512 THEN LEAST(o.n, 512)
                  ELSE p.used + LEAST(o.n, 512) END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, seq,
             coalesce(sum(n) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM pack)
         SELECT CAST(o.shard AS BIGINT) AS shard,
           CAST(o.seq AS BIGINT) AS seq_id,
           CAST(o.off + t.dpos AS BIGINT) AS pos,
           CAST(t.token_id AS BIGINT) AS token_id
         FROM offs o JOIN doctok t USING (doc_id)""",
    "packed_token_stream_eos" ->
      // the D29 replay with document separators: the recursive-CTE packer
      // charges one extra budget slot per doc (used + n + 1 > 512),
      // offsets advance by n + 1, and each doc contributes one EOS row
      // (reserved id 272 = 256 base + 16 merges) at off + n
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) + 1 AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n + 1 > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n + 1 > 512 THEN LEAST(o.n, 512) + 1
                  ELSE p.used + LEAST(o.n, 512) + 1 END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, n, seq,
             coalesce(sum(n + 1) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM pack)
         SELECT CAST(o.shard AS BIGINT) AS shard,
           CAST(o.seq AS BIGINT) AS seq_id,
           CAST(o.off + t.dpos AS BIGINT) AS pos,
           CAST(t.token_id AS BIGINT) AS token_id
         FROM offs o JOIN doctok t USING (doc_id)
         UNION ALL
         SELECT CAST(shard AS BIGINT), CAST(seq AS BIGINT),
           CAST(off + n AS BIGINT), CAST(272 AS BIGINT)
         FROM offs""",
    "packed_stream_segments" ->
      // the eos-packer replay plus the document ordinal within each
      // (shard, seq) — seg_id is a pure function of the same recursive
      // packer state, one extra row_number in the offs CTE
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) + 1 AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n + 1 > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n + 1 > 512 THEN LEAST(o.n, 512) + 1
                  ELSE p.used + LEAST(o.n, 512) + 1 END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, n, seq,
             coalesce(sum(n + 1) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
             row_number() OVER (PARTITION BY shard, seq ORDER BY doc_id)
               AS seg
           FROM pack)
         SELECT CAST(o.shard AS BIGINT) AS shard,
           CAST(o.seq AS BIGINT) AS seq_id,
           CAST(o.off + t.dpos AS BIGINT) AS pos,
           CAST(t.token_id AS BIGINT) AS token_id,
           CAST(o.seg AS BIGINT) AS seg_id
         FROM offs o JOIN doctok t USING (doc_id)
         UNION ALL
         SELECT CAST(shard AS BIGINT), CAST(seq AS BIGINT),
           CAST(off + n AS BIGINT), CAST(272 AS BIGINT),
           CAST(seg AS BIGINT)
         FROM offs""",
    "token_stream_export_segments" ->
      // the export_eos manifest replay with the two segment columns:
      // per-shard (seq, seg) count and the position-weighted segment
      // checksum over the same stream rebuild
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) + 1 AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n + 1 > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n + 1 > 512 THEN LEAST(o.n, 512) + 1
                  ELSE p.used + LEAST(o.n, 512) + 1 END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, n, seq,
             coalesce(sum(n + 1) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
             row_number() OVER (PARTITION BY shard, seq ORDER BY doc_id)
               AS seg
           FROM pack),
         stream AS (
           SELECT o.shard, o.seq, o.off + t.dpos AS pos, t.token_id, o.seg
           FROM offs o JOIN doctok t USING (doc_id)
           UNION ALL
           SELECT shard, seq, off + n AS pos, 272 AS token_id, seg
           FROM offs)
         SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(DISTINCT seq) AS BIGINT) AS n_seqs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(((pos + 1) * token_id) % 1000000007) AS BIGINT)
             AS checksum,
           CAST(count(DISTINCT (seq, seg)) AS BIGINT) AS n_segments,
           CAST(sum(((pos + 1) * seg) % 1000000007) AS BIGINT)
             AS seg_checksum
         FROM stream GROUP BY shard""",
    "packed_stream_roundtrip" ->
      // the consumer-side roundtrip: segment coordinates come from the
      // packer replay (merge recursion for per-doc token counts, md5
      // shard routing, the greedy first-fit CTE, rank-in-sequence by
      // doc id = the stream's segment order), but the EXPECTED text is
      // computed with no BPE machinery at all — the bpe_decode contract:
      // decode(segment) must equal the raw doc with every \s+ run
      // deleted, byte for byte
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         words AS (
           SELECT doc_id, w, count(*) AS n_occ FROM (
             SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
             FROM documents) u WHERE w <> '' GROUP BY doc_id, w),
         dw AS (SELECT DISTINCT w FROM words),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         counts AS (
           SELECT w, len(string_split(s, ',')) - 2 AS n_tok
           FROM rec WHERE r = 16),
         dcount AS (
           SELECT doc_id, CAST(sum(n_occ * n_tok) AS BIGINT) AS n
           FROM words JOIN counts USING (w) GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) + 1 AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n + 1 > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n + 1 > 512 THEN LEAST(o.n, 512) + 1
                  ELSE p.used + LEAST(o.n, 512) + 1 END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         seg AS (
           SELECT shard, doc_id, n, seq,
             row_number() OVER (PARTITION BY shard, seq ORDER BY doc_id)
               AS seg_idx
           FROM pack)
         SELECT CAST(s.shard AS BIGINT) AS shard,
           CAST(s.seq AS BIGINT) AS seq_id,
           CAST(s.seg_idx AS BIGINT) AS seg_idx,
           s.n AS n_tokens,
           regexp_replace(d.text, '[ \t\n\x0B\f\r]+', '', 'g') AS decoded
         FROM seg s JOIN documents d USING (doc_id)""",
    "token_stream_export_eos" ->
      // the separator stream's export manifest: same chain, rolled up per
      // shard — the position-weighted checksum now pins every EOS slot
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) + 1 AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n + 1 > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n + 1 > 512 THEN LEAST(o.n, 512) + 1
                  ELSE p.used + LEAST(o.n, 512) + 1 END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, n, seq,
             coalesce(sum(n + 1) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM pack),
         stream AS (
           SELECT o.shard, o.seq, o.off + t.dpos AS pos, t.token_id
           FROM offs o JOIN doctok t USING (doc_id)
           UNION ALL
           SELECT shard, seq, off + n AS pos, 272 AS token_id FROM offs)
         SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(DISTINCT seq) AS BIGINT) AS n_seqs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(((pos + 1) * token_id) % 1000000007) AS BIGINT)
             AS checksum
         FROM stream GROUP BY shard""",
    "token_stream_export" ->
      // the D29 replay chain (same CTEs as packed_token_stream) with the
      // export manifest aggregated per shard: sequence count, token
      // count, and the position-weighted checksum Σ (pos+1)·token_id
      // mod 1e9+7 — the gate proves the parquet write→read roundtrip
      // preserved every token AT its position
      """WITH RECURSIVE
         m AS (SELECT * FROM (VALUES
           (0,'65','72'),(1,'69','6e'),(2,'6f','77'),(3,'6f','72'),
           (4,'73','74'),(5,'6d','6572'),(6,'61','74'),(7,'6c','75'),
           (8,'61','72'),(9,'70','6172'),(10,'6a','6f'),(11,'6a6f','696e'),
           (12,'61','73'),(13,'6173','68'),(14,'68','617368'),
           (15,'72','6f77')) AS t(rank, a, b)),
         doclists AS (
           SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents),
         wordpos AS (
           SELECT doc_id, widx, w FROM (
             SELECT doc_id, generate_subscripts(ws, 1) AS widx,
                    unnest(ws) AS w
             FROM doclists) u
           WHERE w <> ''),
         dw AS (SELECT DISTINCT w FROM wordpos),
         rec AS (
           SELECT w, ',' || array_to_string(
                    regexp_extract_all(lower(hex(w)), '[0-9a-f]{2}'),
                    ',') || ',' AS s,
                  0 AS r
           FROM dw
           UNION ALL
           SELECT w,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN regexp_replace(s, ',' || a || ',' || b || ',',
                                      ',' || a || b || ',')
                  ELSE s END,
             CASE WHEN contains(s, ',' || a || ',' || b || ',')
                  THEN r ELSE r + 1 END
           FROM rec JOIN m ON m.rank = rec.r
           WHERE rec.r < 16),
         wsyms AS (
           SELECT w, list_filter(string_split(s, ','), x -> x <> '') AS syms
           FROM rec WHERE r = 16),
         symrows AS (
           SELECT w, sidx, sym FROM (
             SELECT w, generate_subscripts(syms, 1) AS sidx,
                    unnest(syms) AS sym
             FROM wsyms) u),
         ids AS (
           SELECT w, sidx,
             CASE WHEN length(sym) = 2 THEN
               (strpos('0123456789abcdef', sym[1]) - 1) * 16
                 + (strpos('0123456789abcdef', sym[2]) - 1)
             ELSE 256 + (SELECT min(rank) FROM m WHERE m.a || m.b = sym)
             END AS token_id
           FROM symrows),
         doctok AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY widx, sidx) - 1
               AS dpos,
             token_id
           FROM wordpos JOIN ids USING (w)),
         dcount AS (SELECT doc_id, count(*) AS n FROM doctok GROUP BY doc_id),
         sharded AS (
           SELECT doc_id, n,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4
               AS shard
           FROM dcount WHERE n > 0),
         ordered AS (
           SELECT shard, doc_id, n,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
           FROM sharded),
         pack AS (
           SELECT shard, doc_id, n, rn,
             CAST(0 AS BIGINT) AS seq, LEAST(n, 512) AS used
           FROM ordered WHERE rn = 1
           UNION ALL
           SELECT o.shard, o.doc_id, o.n, o.rn,
             CASE WHEN p.used + o.n > 512 THEN p.seq + 1 ELSE p.seq END,
             CASE WHEN p.used + o.n > 512 THEN LEAST(o.n, 512)
                  ELSE p.used + LEAST(o.n, 512) END
           FROM pack p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1),
         offs AS (
           SELECT shard, doc_id, seq,
             coalesce(sum(n) OVER (PARTITION BY shard, seq ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM pack),
         stream AS (
           SELECT o.shard, o.seq, o.off + t.dpos AS pos, t.token_id
           FROM offs o JOIN doctok t USING (doc_id))
         SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(DISTINCT seq) AS BIGINT) AS n_seqs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(((pos + 1) * token_id) % 1000000007) AS BIGINT)
             AS checksum
         FROM stream GROUP BY shard"""
  )
}
