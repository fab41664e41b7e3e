package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis operators for training-data pipelines (BASELINE.json
  * north star: language-ID, quality scoring, token counting, document
  * fingerprinting).
  *
  * Scale design: every function here is a pure per-row `Column`
  * expression over the document string — no shuffle, no UDF, fully
  * codegen'd, embarrassingly parallel over a 100 TB corpus scan. The
  * only aggregation-shaped op (fingerprint) is a per-row fold
  * (`aggregate` higher-order function), still shuffle-free.
  */
object TextAnalysis {

  /** Whitespace tokenization (the baseline tokenizer; BPE-ish regex
    * variant below). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-boundary token count: words plus digit runs and
    * punctuation as separate tokens, approximated with a regex split —
    * a cheap, deterministic proxy for tokenizer budgeting. */
  def tokensBpeIsh(text: Column): Column =
    filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), t => t =!= "" && t =!= " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast(LongType)

  /** Sum of token lengths as a long (exact; feeds ratio computations). */
  def totalTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))

  /** Count of tokens drawn from a marker set (stopword lists per
    * language) — the n-gram/stopword language-ID heuristic. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedLit(markers), t))).cast(LongType)

  val EnMarkers: Seq[String] = Seq("the", "a", "of", "and", "is")
  val DeMarkers: Seq[String] = Seq("der", "die", "das", "und", "ist")
  val EsMarkers: Seq[String] = Seq("el", "la", "de", "y", "es")

  /** Language-ID by marker-count argmax, deterministic tie-break
    * (en > de > es on equal scores). */
  def langId(text: Column): (Column, Column, Column, Column) = {
    val en = markerCount(text, EnMarkers)
    val de = markerCount(text, DeMarkers)
    val es = markerCount(text, EsMarkers)
    val pred = when(de > en && de >= es, "de")
      .when(es > en && es > de, "es")
      .otherwise("en")
    (en, de, es, pred)
  }

  /** Quality scoring: length, average token length, stopword ratio,
    * punctuation ratio — combined into one bounded score. All double
    * arithmetic is per-row (IEEE-deterministic across engines). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars  = length(text).cast(LongType)
    val nToks   = tokenCount(text)
    val punct   = (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast(LongType)
    val stopw   = markerCount(text, EnMarkers)
    val avgLen  = totalTokenLen(text).cast(DoubleType) / nToks.cast(DoubleType)
    val stopR   = stopw.cast(DoubleType) / nToks.cast(DoubleType)
    val punctR  = punct.cast(DoubleType) / nChars.cast(DoubleType)
    val score   = (least(nToks.cast(DoubleType) / 100.0, lit(1.0)) * 0.4
      + least(stopR * 10.0, lit(1.0)) * 0.3
      + (lit(1.0) - least(punctR * 20.0, lit(1.0))) * 0.3)
    Seq("n_chars" -> nChars, "n_tokens" -> nToks, "punct_count" -> punct,
      "avg_token_len" -> avgLen, "stopword_ratio" -> stopR,
      "punct_ratio" -> punctR, "quality_score" -> score)
  }

  /** Deterministic 48-bit-ish token hash shared with the DuckDB oracle:
    * first 12 hex chars of md5, hex letters transliterated to digits,
    * parsed as a base-10 long. (Not a great hash — a great *portable*
    * one: identical in any engine with md5+translate.) */
  def tokenHash(t: Column): Column =
    translate(substring(md5(t), 1, 12), "abcdef", "012345").cast(LongType)

  /** Rolling polynomial fingerprint over the token stream
    * (Rabin-Karp-style): fold (acc*31 + h(tok)) mod 1e9+7. Order-
    * sensitive by construction — reordered documents fingerprint
    * differently, unlike bag-of-words hashes. */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31L + tokenHash(t)) % 1000000007L)

  /** PII masking (the C4/CCNet privacy pass): emails, NANP-style
    * `ddd-ddd-dddd` phone numbers, and dotted-quad IPv4 literals
    * become typed tokens. Three anchored RE2-safe regexes (no
    * lookaround — the DuckDB oracle replays them verbatim), applied
    * email-first so the address's dotted domain can't half-match the
    * IP pattern. Pure per-row Column: scrubbing is a scan at any
    * scale. */
  def piiScrub(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")

  /** Count of the most frequent token (Gopher-style repetition
    * signal): run-length fold over the SORTED token array — per-row,
    * shuffle-free, no per-token grouping anywhere. Initial run = 0
    * makes the first element score 1 whether or not it equals the
    * sentinel prev. */
  def topTokenCount(text: Column): Column =
    aggregate(array_sort(tokens(text)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Adjacent 2-grams of the token stream ("w1 w2", "w2 w3", ...). */
  def tokenBigrams(text: Column): Column = {
    val w = tokens(text)
    zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Fraction of 2-grams that are repeats of an earlier 2-gram
    * (Gopher's duplicate-n-gram class of quality signals): 1 −
    * distinct/total, 0.0 for degenerate single-token docs. */
  def dupBigramFrac(text: Column): Column = {
    val g = tokenBigrams(text)
    when(size(g) > 0,
      lit(1.0) - size(array_distinct(g)).cast(DoubleType) /
        size(g).cast(DoubleType)).otherwise(lit(0.0))
  }
}
