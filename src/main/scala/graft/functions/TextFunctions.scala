package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, and the
  * deterministic hashing primitive shared with the DuckDB oracle.
  *
  * All pure `functions._` compositions — codegen-friendly, no UDFs, so they
  * stay inside whole-stage codegen on a 100 TB scan.
  */
object TextFunctions {

  /** Whitespace tokenization with empty-string guard (split("") yields [""]
    * in both Spark and DuckDB — the guard makes empty docs give []). */
  def words(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(words(c))

  /** BPE-style pretokenizer regex — the GPT-2 pattern minus its trailing
    * whitespace lookahead alternates (RE2, hence the DuckDB oracle, has no
    * lookahead; the lookahead branch only affects runs of trailing spaces,
    * which whitespace-clean training text doesn't carry). Matches
    * contractions, optionally space-prefixed letter runs, digit runs, and
    * punctuation runs — so its match count approximates a BPE vocab's
    * pre-merge token count, the unit LLM data budgets are measured in. */
  val BpeTokenRe: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish token count: number of pretokenizer matches. Pure
    * `regexp_count` — codegen'd, identical under Java regex and RE2
    * (no lookaround in the pattern, \p classes are Unicode in both). */
  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(BpeTokenRe))

  /** Deterministic 32-bit hash from the md5 hex prefix — identical in Spark
    * (`conv(substring(md5(x),1,8),16,10)`) and DuckDB
    * (`('0x' || substr(md5(x),1,8))::BIGINT`). The basis for MinHash /
    * SimHash signatures that a SQL oracle can replay exactly. */
  def md5Int(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast("long")

  /** Seeded variant: an independent hash family member per integer seed. */
  def md5IntSeeded(c: Column, seed: Int): Column =
    md5Int(concat(lit(seed.toString), lit(":"), c))

  /** Word n-gram shingles (distinct set) from an ALREADY-MATERIALIZED words
    * array (a real column/attribute, not an inline `words(...)` tree).
    *
    * This two-step split matters: a higher-order function's lambda body is
    * evaluated per array element, so an inline `words(c)` inside the
    * `slice` re-runs the regex split once per shingle — measured ~50×
    * per-doc overhead on the dedup path. Bind the split to a column first
    * (one split per row), then shingle from the bound attribute. */
  def shinglesFromWords(ws: Column, n: Int): Column =
    array_distinct(
      when(size(ws) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n))))))

  /** Word n-gram shingles (distinct set), the MinHash input unit. Prefer
    * `shinglesFromWords` over a materialized words column in hot paths —
    * see its scaladoc. */
  def shingles(c: Column, n: Int): Column = shinglesFromWords(words(c), n)

  /** Punctuation character ratio over total characters. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0d)).otherwise(
      (length(c) - length(regexp_replace(c, "[\\.,;:!\\?'\"()\\[\\]{}-]", "")))
        .cast("double") / length(c))

  /** Fraction of tokens that are in the given stopword list. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val ws = words(c)
    when(size(ws) === 0, lit(0d)).otherwise(
      size(filter(ws, w => w.isInCollection(stopwords))).cast("double") / size(ws))
  }

  def meanWordLen(c: Column): Column = {
    val ws = words(c)
    when(size(ws) === 0, lit(0d)).otherwise(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(ws))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, penalises
    * punctuation soup and stopword-free (non-linguistic) text. The exact
    * formula is arbitrary; what matters is that it is deterministic and
    * cheap (single pass, codegen). */
  def qualityScore(c: Column, stopwords: Seq[String]): Column = {
    val tokens = tokenCount(c)
    val lenScore = least(tokens.cast("double") / 100d, lit(1d))
    val punctPenalty = least(punctRatio(c) * 5d, lit(1d))
    val stopScore = least(stopwordRatio(c, stopwords) * 4d, lit(1d))
    greatest(lit(0d), least(lit(1d),
      lenScore * 0.4 + stopScore * 0.4 + (lit(1d) - punctPenalty) * 0.2))
  }

  /** Stopword sets for the n-gram language-ID heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "y", "es", "un", "en"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "dans"))

  /** Language-ID heuristic: argmax of per-language stopword hit counts,
    * deterministic tie-break in declaration order, 'unknown' when no
    * stopword hits at all. */
  def langId(c: Column): Column = {
    val ws = words(c)
    val scores = langStopwords.map { case (lang, sw) =>
      lang -> size(filter(ws, w => w.isInCollection(sw)))
    }
    // argmax cascade: first language (declaration order) whose score is > 0
    // and >= every later one; earlier branches failing implies a later
    // language strictly beat them.
    scores.zipWithIndex.foldRight(lit("unknown")) { case (((lang, score), i), els) =>
      val later = scores.drop(i + 1).map(_._2)
      val cond = later.foldLeft(score > 0)((acc, s2) => acc && score >= s2)
      when(cond, lit(lang)).otherwise(els)
    }
  }

  /** Document fingerprint: md5 of casefolded, punctuation-stripped,
    * whitespace-collapsed text — the exact-dedup key that survives
    * formatting noise. */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "),
      "\\s+", " ")).cast("binary"))

  /** PII-shaped patterns for redaction. Lookaround-free so Java regex and
    * RE2 (the DuckDB engine) match identically; the URL pattern is applied
    * FIRST so an email inside a URL query string is already gone when the
    * email pass runs — order is part of the contract and the oracle
    * replays the same three passes in the same order. */
  val UrlRe: String = "https?://[^\\s]+"
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe: String = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** Redact URLs, then emails, then phone-shaped digit runs. Pure
    * regexp_replace chain — map-only and codegen'd, the shape a 100 TB
    * pre-training scrub wants. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Rolling-hash modulus/base: M = 2^31-1 keeps every intermediate
    * (acc·B + h < 2^51 + 2^32) inside a long with no overflow, in Spark
    * and in a 64-bit SQL engine alike. */
  val RollB: Long = 1000003L
  val RollM: Long = 2147483647L

  /** Order-sensitive document fingerprint: polynomial rolling hash over the
    * word sequence, h = fold(h·B + md5Int(word) mod M) from 0 — unlike
    * `fingerprint`'s bag semantics, reordered documents hash differently.
    * Left fold from 0 over per-word hashes ≡ DuckDB
    * `list_reduce(list_transform(ws, …md5…), (a, h) -> (a*B + h) % M)`
    * (fold-from-0's first step yields h₁, which is exactly list_reduce's
    * first-element seed), so the oracle replays it exactly. Empty doc → 0. */
  def rollingFingerprint(c: Column): Column =
    // fold over an empty array returns the init (0) — no guard needed, and
    // the single reference keeps the split+md5 transform at once per row
    aggregate(transform(words(c), w => md5Int(w)), lit(0L),
      (acc, h) => (acc * RollB + h) % RollM)
}
