package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, language identification, and content fingerprinting.
  *
  * Everything is per-row projection over built-in string/array functions —
  * codegen'd, shuffle-free, scales linearly with the corpus.
  */
object TextOps {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Lowercased whitespace tokens, empties filtered — the ONE shared
    * tokenization regime the LM gates, DSIR and tfidf replay verbatim in
    * the DuckDB oracles (`list_filter(regexp_split_to_array(trim(lower(
    * text)),'\s+'), x -> x <> '')`). Single definition so a future tweak
    * can't silently desynchronize one consumer's oracle from another's. */
  def lowerToks(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => t =!= "")

  /** Hashed TF-IDF document embeddings, SPARSE form `(id, dim, w)` — the
    * deterministic text→vector bridge that lets the ANN/semantic-dedup
    * tier run on real document TEXT instead of a precomputed embedding
    * table (the classic hashing trick, Weinberger et al. ICML'09; the
    * feature-hashing baseline every vector pipeline starts from before a
    * learned encoder exists). Every quantity is engine-exact by
    * construction so a second engine replays the vectors bit-for-bit:
    * tokens are [[lowerToks]], the bucket is the md5-prefix hash
    * (`conv(substr(md5(tok),1,4),16,10) % dims` — replays as
    * `('0x'||substr(md5(tok),1,4))::BIGINT` in DuckDB), and the smoothed
    * IDF `ln((N+1)/(df+1))` is rounded ONCE to an integer at `idfScale`
    * (a 1-ulp ln() divergence cannot flip a 1e3-scaled rint except within
    * ~1e-9 of a boundary), after which tf·idf accumulation is exact Long
    * arithmetic — and, downstream, dots/norms of the integer-valued
    * vectors stay below 2^53, so even the cosines are bit-identical
    * across engines. Scale shape: one explode, two map-side-combined
    * aggregates (tf on (id, tok), df on tok), one token-key join against
    * the vocab-sized df frame, a broadcast 1-row N — no driver state,
    * no floats until the consumer divides. */
  def hashedTfidfSparse(docs: DataFrame, idCol: String, textCol: String,
                        dims: Int = 64, idfScale: Int = 1000): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(lowerToks(col(textCol))).as("tok"))
    val tf = toks.groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .select(col("id"),
        (conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long")
          % dims).as("dim"),
        (col("tf") *
          round(log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
            * idfScale).cast("long")).as("w"))
      .groupBy("id", "dim").agg(sum("w").as("w"))
  }

  /** [[hashedTfidfSparse]] assembled into the DENSE `(id, vec)` form the
    * vector tier consumes (array<double> of the integer-valued weights —
    * exact in double while |w| < 2^53, which the idfScale bound
    * guarantees by orders of magnitude). */
  def hashedTfidf(docs: DataFrame, idCol: String, textCol: String,
                  dims: Int = 64, idfScale: Int = 1000): DataFrame =
    hashedTfidfSparse(docs, idCol, textCol, dims, idfScale)
      .groupBy("id")
      .agg(map_from_entries(
        collect_list(struct(col("dim").cast("int"), col("w")))).as("__m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(dims - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("double"))
          .as("vec"))

  /** Cast an integer-valued double weight to float ONLY while exactness
    * holds: floats carry 24 mantissa bits, so any |w| >= 2^24 would round
    * — and the doc_embed gates' "exact, deterministic" golden premise
    * would silently degrade on a corpus with high-tf docs. Fails LOUDLY
    * instead (a corpus that pushes a tf·idf weight past 2^24 needs a
    * smaller idfScale or double vectors, a calibration decision, not a
    * silent ulp). Codegen'd `when` guard — no measurable cost next to the
    * cast itself. */
  def floatExact(v: Column): Column =
    when(abs(v) < lit(1 << 24), v.cast("float"))
      .otherwise(raise_error(concat(
        lit("weight exceeds float-exact bound 2^24: "), v.cast("string")))
        .cast("float"))

  /** Whitespace + regex ("BPE-ish": letter runs / digit runs / single
    * punctuation) token counts. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // longs, not ints: BIGINT is what count-like columns are everywhere
    // else in the engine (and in ANSI engines' len()/count()).
    df.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '[a-z]+|[0-9]+', 0)")).cast("long").as("word_tokens"),
      length(col(textCol)).cast("long").as("n_chars_calc"))

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Heuristic document quality: length, token count, stopword ratio,
    * mean word length, composite score. Mirrors the length/punct/stopword
    * scoring families used for LLM corpus filtering. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ts = tokens(col(textCol))
    val isStop = (t: Column) => Stopwords.map(t === _).reduce(_ || _)
    df.select(col(idCol), col(textCol).as("__text"))
      .withColumn("n_words", size(tokens(col("__text"))).cast("long"))
      .withColumn("n_stopwords", size(filter(tokens(col("__text")), isStop)).cast("long"))
      .withColumn("stopword_ratio",
        round(col("n_stopwords") * lit(1.0) / col("n_words"), 4))
      .withColumn("avg_word_len",
        round(length(regexp_replace(col("__text"), "\\s+", "")) * lit(1.0) / col("n_words"), 4))
      .withColumn("quality_score",
        round(least(col("n_words") / lit(100.0), lit(1.0)) * (lit(1.0) - col("stopword_ratio")), 4))
      .drop("__text")
  }

  /** Language-ID stopword profiles (public-knowledge function-word lists). */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "que", "en"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这"))

  /** N-gram/stopword-profile language identification: score = fraction of
    * tokens hitting each language's function-word list, argmax wins
    * (deterministic tie-break on language code). For ideographic scripts
    * the character profile fires through `contains`. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ts = tokens(lower(col(textCol)))
    val scores = LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hit = (t: Column) => words.map(t === _).reduce(_ || _)
      val tokenScore = size(filter(ts, hit)) * lit(1.0) / greatest(size(ts), lit(1))
      val charScore =
        if (lang == "zh")
          least(length(regexp_replace(col(textCol), "[\\x00-\\x7F]", "")) * lit(1.0)
            / greatest(length(col(textCol)), lit(1)), lit(1.0))
        else lit(0.0)
      struct((tokenScore + charScore).as("score"), lit(lang).as("lang"))
    }
    // greatest() on structs compares (score, lang) lexicographically —
    // a deterministic argmax without exploding rows.
    df.select(
      col(idCol),
      greatest(scores: _*).getField("lang").as("detected_lang"),
      round(greatest(scores: _*).getField("score"), 4).as("lang_score"))
  }

  /** Normalization for dedup/training prep: strip control characters,
    * collapse whitespace runs to single spaces, trim, lowercase. Applied
    * before hashing/shingling so cosmetic variants (CRLF, tabs, case)
    * dedup together. Pure codegen'd projection. For canonically-equivalent
    * Unicode variants (decomposed accents, compatibility codepoints) see
    * [[normalizeTextNfc]]. */
  def normalizeText(text: Column): Column =
    // collapse whitespace BEFORE stripping controls: tab/CR/LF are word
    // separators and must become spaces, not vanish and merge words.
    // Oracle contract: Java's \s is exactly [ \t\n\x0B\f\r] but RE2's \s
    // EXCLUDES \x0B, so a DuckDB replay of this chain with bare '\s+'
    // diverges on vertical-tab docs (Spark word-splits, the replay
    // control-strips and merges). New oracles should spell the class out
    // ('[ \t\n\x0b\f\r]+' — the lang_id_trained form); existing bare-\s
    // replays are exact on any \x0B-free corpus, which the gate corpus is.
    lower(trim(regexp_replace(regexp_replace(text, "\\s+", " "), "[\\x00-\\x1f]", "")))

  /** Unicode NFC canonical composition (native codegen'd expression over
    * java.text.Normalizer — [[graft.functions.UnicodeNorm]]): decomposed
    * `e + U+0301` and precomposed `é` hash identically after this. */
  def nfcNormalize(text: Column): Column =
    graft.functions.UnicodeNorm.nfcCol(text)

  /** [[normalizeText]] with NFC composition applied first — the full
    * normalization chain for cross-source dedup (sources differ in
    * composition form far more often than in semantics). */
  def normalizeTextNfc(text: Column): Column =
    normalizeText(nfcNormalize(text))

  /** Corpus-filter rules in the C4/Gopher family, as a quarantine ruleset
    * (pair with [[Quality.quarantine]]/[[Quality.quarantineStats]]):
    * minimum length, digit-heaviness, terminal punctuation, mean word
    * length inside human-language bounds. All portable SQL predicates. */
  def corpusFilterRules(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nWords = size(tokens(text))
    val digits = length(regexp_replace(text, "[^0-9]", ""))
    Seq(
      "too_short" -> (nChars >= 100),
      "digit_heavy" -> (digits * lit(1.0) / greatest(nChars, lit(1)) <= 0.2),
      "no_terminal_punct" -> text.rlike("[.!?]\\s*$"),
      "word_len_outlier" -> {
        val mean = length(regexp_replace(text, "\\s+", "")) * lit(1.0) / greatest(nWords, lit(1))
        mean >= 3 && mean <= 12
      })
  }

  /** Stopword list for the Gopher "contains real function words" rule —
    * the paper's canonical eight (Rae et al. 2021, §A2.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher repetition-free rule bundle (Rae et al. 2021, §A2.1
    * — public knowledge; the reference's own quality tier stops at the
    * four [[corpusFilterRules]]): word-count bounds, mean-word-length
    * bounds, symbol-to-word ratio, bullet-line and ellipsis-line ratios,
    * alphabetic-word fraction, and the function-word requirement.
    *
    * Every ratio threshold is compared in CROSS-MULTIPLIED INTEGER form
    * (`10·symbols ≤ words` instead of `symbols/words ≤ 0.1`): the
    * predicate stays exact in any engine — no float division, no
    * rounding, no libm. All bounds inclusive. NULL text is normalized to
    * '' up front (word_count fails, pass_all false) — without it Spark's
    * legacy size(null) = -1 and SQL's three-valued NULL comparisons give
    * two engines three different answers. Pure map over the corpus;
    * everything here pushes into one codegen'd projection. */
  def gopherRules(rawText: Column): Seq[(String, Column)] = {
    val text = coalesce(rawText, lit(""))
    val ws = tokens(trim(lower(text)))
    val nWords = size(filter(ws, w => w =!= "")).cast("long")
    val nCharsNoWs = length(regexp_replace(text, "\\s+", "")).cast("long")
    val hashes = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val ellipses = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast("long")
    val alphaWords = size(filter(ws, w => w.rlike("[a-z]"))).cast("long")
    val stopHits = size(array_intersect(array_distinct(ws),
      array(GopherStopwords.map(lit): _*))).cast("long")
    Seq(
      // 50 ≤ words ≤ 100,000
      "word_count" -> (nWords >= 50L && nWords <= 100000L),
      // 3 ≤ mean word length ≤ 10  ⇔  3·words ≤ chars ≤ 10·words
      "mean_word_len" -> (nCharsNoWs >= nWords * 3L && nCharsNoWs <= nWords * 10L),
      // (# + …) per word ≤ 0.1  ⇔  10·symbols ≤ words
      "symbol_ratio" -> ((hashes + ellipses) * 10L <= nWords),
      // bullet-started lines ≤ 90%  ⇔  10·bullets ≤ 9·lines
      "bullet_lines" -> (bulletLines * 10L <= nLines * 9L),
      // ellipsis-ended lines ≤ 30%  ⇔  10·ellipsis ≤ 3·lines
      "ellipsis_lines" -> (ellipsisLines * 10L <= nLines * 3L),
      // ≥ 80% of words contain a letter  ⇔  5·alpha ≥ 4·words
      "alpha_words" -> (alphaWords * 5L >= nWords * 4L),
      // at least two DISTINCT function words present
      "stop_words" -> (stopHits >= 2L))
  }

  /** Per-document Gopher rule verdicts: one boolean per rule plus the
    * conjunction — the keep/drop bitmap a curation pass writes next to
    * every document. */
  def gopherQualityRules(df: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val rules = gopherRules(col(textCol))
    val withFlags = rules.foldLeft(df.select(col(idCol), col(textCol))) {
      case (acc, (name, pred)) => acc.withColumn(name, pred)
    }
    withFlags
      .withColumn("pass_all", rules.map(r => col(r._1)).reduce(_ && _))
      .drop(textCol)
  }

  /** Corpus-level Gopher rule roll-up: per-rule pass/fail counts — the
    * one-page report that says WHICH rule is doing the filtering. One
    * aggregation over the rule bitmap, then a static unpivot. */
  def gopherRuleStats(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val flags = gopherQualityRules(df, idCol, textCol)
    val names = gopherRules(col(textCol)).map(_._1) :+ "pass_all"
    val agg = flags.agg(
      count(lit(1)).as("n_docs"),
      names.map(n => sum(col(n).cast("long")).as(s"__$n")): _*)
    val stacked = names.map(n =>
      s"'$n', `__$n`").mkString(", ")
    agg.selectExpr("n_docs",
        s"stack(${names.size}, $stacked) as (rule, n_pass)")
      .select(col("rule"), col("n_pass"),
        (col("n_docs") - col("n_pass")).as("n_fail"))
  }

  /** Character-entropy quality signal — the standard encoding-junk /
    * gibberish detector (low Shannon entropy = repeated-character or
    * boilerplate junk; normal prose sits ~2.7-3.1 nats over characters):
    * H(doc) = ln(n) − Σ c·ln(c)/n over the per-character counts.
    *
    * Scale shape: one char explode (O(bytes) rows, the one unavoidable
    * pass) into a (doc, char) hash aggregation — map-side combine
    * collapses each partition's contribution to ≤ |alphabet| rows per
    * doc, so the shuffle ships histogram rows, not characters — then a
    * per-doc reduce over ≤ |alphabet| rows. NULL/empty docs classify as
    * unscoreable (null entropy, keep = false). The Σ c·ln(c) sum spans
    * ≤ |alphabet| terms, so the round-the-sum-at-4dp discipline holds
    * across engines; keep compares the ROUNDED entropy (a doc at true
    * H = minEntropy − ε inside the 4dp half-step keeps — the price of
    * an engine-exact predicate). */
  def charEntropy(df: DataFrame, idCol: String, textCol: String,
                  minEntropy: Double = 2.0): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    // one LINEAR pass: regexp_extract_all with (?s). yields one element
    // per CODE POINT (the oracle's substr-per-position unit). Not
    // split("(?!$)") — Java's $ also matches BEFORE a final line
    // terminator, gluing a trailing \n onto the last char ("aa\n" →
    // ["a","a\n"]) — and not split("(?!\\z)") either: Spark's split
    // places empty matches BETWEEN surrogate halves, shearing astral
    // chars into lone surrogates ("😀" → 2 elements) where the oracle
    // counts 1. The first cut exploded positions and substring'd each
    // one, which walks the string from byte 0 per position — O(n²) per
    // doc, quadratic in exactly the long-document regime this gates
    val chars = base.filter(length(col("__text")) > 0)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("__text"), lit("(?s)."), lit(0))).as("ch"))
    val scored = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_chars"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * log(col("c"))).as("__clc"))
      .withColumn("entropy",
        round(log(col("n_chars")) - col("__clc") / col("n_chars"), 4))
      .drop("__clc")
    base.select(col("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("entropy"),
        coalesce(col("entropy") >= lit(minEntropy), lit(false)).as("keep"))
  }

  /** TF-IDF top-N terms per document — keyword extraction for corpus
    * diversity/topic analysis (the classic signal for dedup-aware sampling
    * and quality filters over a training corpus).
    *
    * Scale shape: one explode pass over tokens, then two hash aggregations
    * — (doc, term) counts and term document-frequency — joined back on the
    * term key; the corpus row count N attaches as a broadcast 1-row
    * scalar, and the per-doc top-N window runs over the already-aggregated
    * (doc, term) frame, never raw tokens. Scores round to 6dp BEFORE
    * ranking so rank order is stable across engines (ln differs in the
    * last ulp between libms). */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("doc_freq")), 6))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select("doc_id", "term", "tf", "doc_freq", "tfidf", "rank")
  }

  /** PII patterns for corpus scrubbing (the standard pre-training redaction
    * family): emails, international-ish phone numbers, IPv4 addresses,
    * 13-16-digit card numbers. Deliberately conservative, order matters
    * (emails first so their digits never half-match the phone pattern). */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b", "<CARD>"),
    ("phone", "\\+\\d{1,3}[-. ]?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{2,4}", "<PHONE>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))

  /** PII scrub for training corpora: masks each pattern family with a
    * typed token and counts the hits per family — one projection, chained
    * regexp_replace (codegen'd), counts from the pre-scrub text so they
    * report what was REMOVED. Scales as a pure map over the corpus. */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scrubbed = PiiPatterns.foldLeft(col(textCol)) {
      case (acc, (_, pat, token)) => regexp_replace(acc, pat, token)
    }
    val counts = PiiPatterns.map { case (name, pat, _) =>
      size(expr(s"regexp_extract_all($textCol, '${pat.replace("\\", "\\\\")}', 0)"))
        .cast("long").as(s"n_$name")
    }
    df.select(
      (col(idCol) +: scrubbed.as("scrubbed") +: counts): _*)
  }

  /** HTML boilerplate extraction — the stage every web-crawl training
    * pipeline runs FIRST (the C4 lineage: strip markup, keep prose):
    * comment/script/style/title subtrees dropped whole (a script body is
    * code, not text — including any tag-looking strings inside it),
    * block-level closers turned into newlines so words from adjacent
    * blocks don't weld, remaining tags stripped, the core entities
    * decoded (`&amp;` LAST, the standard order — decoding it first would
    * double-decode `&amp;lt;`), then whitespace normalized per line.
    *
    * Pure chained `regexp_replace` — one codegen'd map-only projection,
    * no UDF, exactly replayable in a second engine: every pattern stays
    * inside the RE2 ∩ Java subset (no backreferences — script and style
    * get separate patterns instead of a `\1` closer — no lookaround).
    * NOT a browser: malformed nesting degrades to tag-stripping, which
    * is what the reference extractors do too. `n_tags` counts markup
    * removed (pre-strip), the boilerplate signal a crawl gate thresholds
    * on. */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val html = col(htmlCol)
    val noSubtrees = Seq(
      "(?s)<!--.*?-->",
      "(?is)<script\\b[^>]*>.*?</script>",
      "(?is)<style\\b[^>]*>.*?</style>",
      "(?is)<title\\b[^>]*>.*?</title>")
      .foldLeft(html)((acc, p) => regexp_replace(acc, p, ""))
    val blocks = regexp_replace(noSubtrees,
      "(?i)</(p|div|h[1-6]|li|ul|ol|tr|table|blockquote)>|<br\\b[^>]*>", "\n")
    val untagged = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(untagged) { case (acc, (e, ch)) =>
        regexp_replace(acc, e, java.util.regex.Matcher.quoteReplacement(ch)) }
    // edge strip is an explicit [ \n] class (the only whitespace left
    // after the collapse), not trim() — trim is space-only and would
    // leave the newline a trailing block closer minted
    val text = regexp_replace(regexp_replace(
      regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " "),
      " *\\n[ \\n]*", "\n"),
      "^[ \\n]+|[ \\n]+$", "")
    df.select(col(idCol), text.as("text"),
      size(regexp_extract_all(html, lit("<[^>]*>"), lit(0)))
        .cast("long").as("n_tags"),
      length(text).cast("long").as("n_chars"))
  }

  /** Gopher-family repetition signals: the fraction of LINES that are
    * duplicates of an earlier line, and the fraction of 2-gram
    * occurrences consumed by the single most frequent 2-gram. High values
    * flag boilerplate/spam (nav bars, keyword stuffing) that
    * length/stopword heuristics miss. One projection over per-row arrays;
    * no shuffle. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)), l => l =!= "")
    val ts = tokens(col(textCol))
    val grams = zip_with(
      slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1),
      (a, b) => concat_ws(" ", a, b))
    df.select(col(idCol), lines.as("__lines"), grams.as("__grams"))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        round(when(size(col("__lines")) > 0,
          (size(col("__lines")) - size(array_distinct(col("__lines")))).cast("double")
            / size(col("__lines"))).otherwise(lit(0.0)), 4).as("dup_line_ratio"),
        size(col("__grams")).cast("long").as("n_2grams"),
        // top-gram mass via longest equal run over the SORTED grams —
        // O(n log n) per row; a count-per-distinct scan would be O(n²)
        round(when(size(col("__grams")) > 0,
          aggregate(array_sort(col("__grams")),
            struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
            (st, g) => {
              val run = when(g === st.getField("prev"), st.getField("run") + 1)
                .otherwise(lit(1))
              struct(g.as("prev"), run.as("run"),
                greatest(st.getField("best"), run).as("best"))
            },
            st => st.getField("best"))
            .cast("double") / size(col("__grams"))).otherwise(lit(0.0)), 4)
          .as("top_2gram_ratio"))
  }

  /** Split documents into ≤`maxTokens`-token training chunks with
    * `overlap` tokens of context carried across boundaries — the standard
    * long-document → context-window preparation. Chunk starts step by
    * `maxTokens - overlap`; the start sequence is capped at
    * `n - overlap` so no trailing chunk is fully contained in its
    * predecessor; docs within the window stay whole (chunk_id 0).
    *
    * One projection + one explode, no shuffle. The token array is
    * materialized behind a projection boundary before the per-chunk
    * slices — inlined in the lambda it would re-tokenize the document
    * once per chunk (the [[graft.operators.Similarity.quantize]] trap). */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                maxTokens: Int = 512, overlap: Int = 64): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens, "0 <= overlap < maxTokens")
    val step = maxTokens - overlap
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("__toks")) - overlap, lit(1)), lit(step)),
          st => slice(col("__toks"), st, lit(maxTokens)))))
      .select(col(idCol),
        col("pos").as("chunk_id"),
        size(col("col")).cast("long").as("n_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }

  /** 31-bit domain keeps the rolling-hash multiply overflow-safe (ANSI). */
  private val P31 = 2147483647L

  /** Content fingerprints: order-sensitive rolling polynomial hash plus an
    * order-insensitive content min-hash — together they distinguish
    * reorderings from true duplicates. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hs = transform(tokens(col(textCol)), t => pmod(xxhash64(t), lit(P31)))
    df.select(
      col(idCol),
      aggregate(hs, lit(0L), (acc, h) => pmod(acc * 31 + h, lit(P31))).as("rolling_hash"),
      array_min(hs).as("content_minhash"),
      size(hs).as("n_tokens"))
  }
}
