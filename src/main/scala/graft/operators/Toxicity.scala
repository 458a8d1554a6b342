package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The blocklist-lexicon toxicity gate — the C4 "bad words" pass (public
  * knowledge: C4 dropped any page containing a term from the LDNOOBW
  * list; later pipelines score blocked-term DENSITY instead so a single
  * quoted slur doesn't kill an encyclopedia page). The reference's
  * check-oriented curation (acled_checks/base_checks) has no lexicon
  * stage; this is part of the LLM-training-data mandate, composed as the
  * curation funnel's 10th stage.
  *
  * Semantics are deliberately integer-exact (the D33 Gopher discipline):
  * tokens are lowercased runs of [a-z0-9] (punctuation-stripping split,
  * so "badword," still matches), a doc passes iff
  * `n_blocked * 1000 <= maxPerMille * n_tokens` — pure integer
  * cross-multiplication, no float threshold, so a second engine replays
  * the verdict bit-for-bit.
  *
  * Scale shape: ONE codegen'd projection — split + a higher-order
  * array filter against an `isin` literal set, no shuffle, no UDF, no
  * join. The literal-lexicon form is right up to a few thousand terms
  * (the UrlRules.Cfg blockedHosts bound); a production-size lexicon
  * (100k+ phrases) would instead explode tokens and broadcast-join the
  * lexicon table — same verdict, one narrow shuffle-free broadcast
  * probe. Phrase (multi-token) lexicons need the n-gram generalization;
  * this stage scores unigram terms, which is what the public lists
  * mostly are. */
object Toxicity {

  /** `blocked` is the term lexicon (unigrams, matched on the normalized
    * token); `maxPerMille` the density ceiling in tokens-per-thousand —
    * 0 means zero tolerance (any blocked token drops the doc, the
    * original C4 rule). The default lexicon is a synthetic stand-in:
    * the test corpus draws from a fixed benchmark vocabulary, so two of
    * its words play the blocked role exactly as the synthetic URL ingest
    * stands in for crawl provenance (UrlRules.withSyntheticUrl); a real
    * deployment supplies the public LDNOOBW/Jigsaw list. */
  case class Cfg(blocked: Seq[String] = Seq("slow", "big"),
                 maxPerMille: Int = 100) {
    require(blocked.nonEmpty, "blocklist lexicon must not be empty")
    require(maxPerMille >= 0, "maxPerMille must be >= 0")
  }

  /** Normalized token array: lowercased [a-z0-9] runs, empties dropped.
    * MUST stay replay-identical to the oracle's
    * `list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), ...)`. */
  private def tokens(textCol: Column): Column =
    filter(split(lower(coalesce(textCol, lit(""))), "[^a-z0-9]+"),
      t => t =!= "")

  /** Per-doc blocklist verdict frame: (idCol, n_tokens, n_blocked,
    * per_mille, pass_toxicity). Keeps every input row — a filter stage
    * needs the ledger, not just the survivors (the urlFilter shape).
    * per_mille is floor(1000 * n_blocked / n_tokens) (0 for an empty
    * doc); the pass verdict uses the exact cross-multiplication, never
    * the floored ratio. */
  def blocklistScore(docs: DataFrame, idCol: String, textCol: String,
                     cfg: Cfg = Cfg()): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
        col(idCol),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => t.isin(cfg.blocked: _*)))
          .cast("long").as("n_blocked"))
      .select(
        col(idCol), col("n_tokens"), col("n_blocked"),
        when(col("n_tokens") > 0,
          floor(col("n_blocked") * 1000L / col("n_tokens")))
          .otherwise(0L).as("per_mille"),
        (col("n_blocked") * 1000L <= lit(cfg.maxPerMille.toLong) * col("n_tokens"))
          .as("pass_toxicity"))
  }
}
