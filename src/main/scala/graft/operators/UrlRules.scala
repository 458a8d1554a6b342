package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain rule filtering — the FIRST gate of a web-crawl curation
  * chain (RefinedWeb §3.1 "URL filtering", C4's blocklist pass: cheap
  * string rules drop whole documents before any text-tier work runs).
  * Everything here is one codegen'd projection over a `url` column — no
  * shuffle, no UDF, no state — so at 100 TB the stage bills exactly one
  * scan it was already paying.
  *
  * The synthetic-URL ingest ([[withSyntheticUrl]]) exists because the test
  * corpus carries no url column: it derives one from (doc_id, source) with
  * PORTABLE integer/string arithmetic (the asAudio claimed-parameter
  * convention), so a second engine replays the whole construction and the
  * rule verdicts from the raw table. Failure residues are deliberately
  * SPARSE (mod-83/89/97 classes) so a handful of corpus docs exercises
  * each rule while the planted curation docs (ids 93xxxxx, every residue
  * checked and spec-pinned) all pass — the url stage must not perturb the
  * downstream stage plants.
  *
  * Reference behavior anchor: the reference's ingest validates row-level
  * fields before load (base_assets.py:120-207 typed casts + checks);
  * URL-rule filtering is the curation-mandate extension of that gate to
  * crawl provenance.
  */
object UrlRules {

  /** Rule configuration. `blockedHosts` is a LITERAL list (an `isin` —
    * fine up to a few thousand hosts, the plan-literal bound); for a
    * production-size blocklist use [[filterAgainstBlocklist]], which
    * broadcast-anti-joins a blocklist table instead. */
  case class Cfg(urlCol: String = "url",
                 blockedHosts: Seq[String] = Seq(
                   "src7.example.net", "src12.example.net"),
                 badExts: Seq[String] = Seq(
                   "jpg", "jpeg", "png", "gif", "mp3", "mp4", "css", "js",
                   "zip", "exe"),
                 maxDepth: Int = 5)

  /** Deterministic synthetic URL from (doc_id, source): host =
    * source.example.{com|net} (net on the doc_id%7=2 residue — the
    * blocklist arm), 2 path segments (6 on doc_id%89=5 — the depth arm),
    * file extension .html (.jpg on doc_id%97=3 — the asset arm), session
    * query string on doc_id%83=7 (the junk arm). Pure integer/string
    * arithmetic → full DuckDB replay. */
  def withSyntheticUrl(docs: DataFrame, idCol: String = "doc_id",
                       domainCol: String = "source",
                       urlCol: String = "url"): DataFrame = {
    val id = col(idCol)
    val tld = when(id % 7 === 2, "net").otherwise("com")
    val host = concat(col(domainCol), lit(".example."), tld)
    val seg: Int => Column = i =>
      concat(lit("/s"), ((id + i) % 10).cast("string"))
    val segs = when(id % 89 === 5,
        concat(seg(0), seg(1), seg(2), seg(3), seg(4), seg(5)))
      .otherwise(concat(seg(0), seg(1)))
    val ext = when(id % 97 === 3, ".jpg").otherwise(".html")
    val file = concat(lit("/f"), (id % 100).cast("string"), ext)
    val qs = when(id % 83 === 7,
        concat(lit("?sid="), (id % 1000).cast("string"))).otherwise(lit(""))
    docs.withColumn(urlCol, concat(lit("https://"), host, segs, file, qs))
  }

  /** Per-doc rule verdict frame: parsed URL parts + one boolean per rule
    * + pass_url. Parsing is anchored regexp_extract (explicit character
    * classes — Java and RE2 agree), verdicts are pure functions of the
    * url string. Keeps every input row (a filter stage needs the ledger,
    * not just the survivors). */
  def urlFilter(docs: DataFrame, idCol: String, cfg: Cfg = Cfg()): DataFrame = {
    val url = col(cfg.urlCol)
    val host = regexp_extract(url, "^https?://([^/?]+)", 1)
    // path = after host, before any query string
    val path = regexp_extract(url, "^https?://[^/?]+([^?]*)", 1)
    val query = regexp_extract(url, "\\?(.*)$", 1)
    val ext = lower(regexp_extract(path, "\\.([a-zA-Z0-9]+)$", 1))
    // segments = slash count (every synthetic path is '/'-led; a trailing
    // slash would overcount by one — the file component prevents it here,
    // and real ingests normalize first)
    val nSeg = (length(path) - length(regexp_replace(path, "/", ""))).cast("int")
    docs.select(
      col(idCol),
      url.as("url"),
      host.as("host"),
      nSeg.as("n_segments"),
      ext.as("ext"),
      (if (cfg.blockedHosts.isEmpty) lit(false)
       else host.isin(cfg.blockedHosts: _*)).as("blocked_domain"),
      ext.isin(cfg.badExts: _*).as("bad_ext"),
      (nSeg > cfg.maxDepth).as("too_deep"),
      query.rlike("(^|&)(sid|sessionid|phpsessid)=").as("junk_query"))
      .withColumn("pass_url",
        !col("blocked_domain") && !col("bad_ext") &&
          !col("too_deep") && !col("junk_query"))
  }

  /** Production-blocklist form: the blocklist as a TABLE (millions of
    * hosts — too big for a plan literal, small enough to broadcast), docs
    * kept by a broadcast LEFT ANTI join on the parsed host. The pattern
    * rules stay the projection they are. */
  def filterAgainstBlocklist(docs: DataFrame, idCol: String,
                             blocklist: DataFrame, hostCol: String = "host",
                             cfg: Cfg = Cfg()): DataFrame = {
    val verdicts = urlFilter(docs, idCol, cfg.copy(blockedHosts = Nil))
    verdicts
      .join(broadcast(blocklist.select(col(hostCol).as("host")).distinct()),
        Seq("host"), "left_anti")
      .filter(col("pass_url"))
  }
}
