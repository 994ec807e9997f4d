package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Heuristic document-quality filter batteries for pretraining-corpus
  * curation. [[gopherFilters]] is the non-repetition half of the Gopher
  * rule set (Rae et al. 2021 "Scaling Language Models", §A1.1):
  * word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  * alphabetic-word ratio, bullet/ellipsis line ratios, and the
  * stopword-presence gate. The repetition half (max-term-frequency and
  * duplicate-bigram rules) is [[TextAnalysis.repetition]] /
  * `q_repetition`.
  *
  * Scale: one narrow per-row projection over the corpus — no shuffle,
  * full whole-stage codegen (`functions._` higher-order functions, no
  * UDFs). At 100 TB this is a single map stage fused into the scan; the
  * verdict columns then feed the same funnel machinery as
  * `q_filter_funnel`.
  *
  * Determinism: every ratio is a single IEEE division of two integer
  * counts, and every threshold compares the ROUNDED ratio (6 places),
  * so the keep flags are bit-stable across engines (the established
  * discipline of `q_repetition`).
  */
object Filters {

  // Thresholds, per Gopher §A1.1 (the paper's [50, 100k] word band).
  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolRatio = 0.1
  val MinAlphaRatio = 0.8
  val MaxBulletRatio = 0.9
  val MaxEllipsisRatio = 0.3
  val MinStopHits = 2L

  /** Stopword gate markers. Gopher uses (the, be, to, of, and, that,
    * have, with); we use the engine's English marker list
    * ([[TextAnalysis.EnStop]]) so the gate rule shares one vocabulary
    * with `q_lang_id` — the rule (>= 2 distinct markers present) is
    * Gopher's.
    */
  val StopMarkers: Seq[String] = TextAnalysis.EnStop

  // ---- q_gopher_filters ----------------------------------------------

  /** Per-document Gopher rule verdicts: the measured statistics, one
    * boolean per rule, the combined `keep`, and `n_fail` (how many
    * rules the document breaks — the funnel's ranking key for
    * borderline docs).
    */
  def gopherFilters(spark: SparkSession, sfDir: String): DataFrame =
    gopherVerdicts(Tables.documents(spark, sfDir))

  /** The rule battery as a pure (doc_id, text) → verdicts transform —
    * narrow ops only, so it applies to a STREAMING DataFrame unchanged
    * (StreamingFilterSpec pins stream == batch): the live ingest path
    * can reject documents with the exact same rules the batch curation
    * pass uses.
    */
  def gopherVerdicts(docs: DataFrame): DataFrame = {
    val t = TextAnalysis.tokens(col("text"))
    val nTok = size(t).cast("long")
    // single-space-separated text: total word chars = len - (n-1)
    val meanWordLen =
      round((length(col("text")) - (nTok - lit(1L))).cast("double") / nTok, 6)
    val nSymbol = size(filter(t, x => x.contains("#") || x.contains("...")))
    val symbolRatio = round(nSymbol.cast("double") / nTok, 6)
    val nAlpha = size(filter(t, x => x.rlike("[a-zA-Z]")))
    val alphaRatio = round(nAlpha.cast("double") / nTok, 6)
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => l.rlike("^[-*•] ")))
    val bulletRatio = round(nBullet.cast("double") / nLines, 6)
    val nEllipsis = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$")))
    val ellipsisRatio = round(nEllipsis.cast("double") / nLines, 6)
    // distinct markers PRESENT (not occurrence count): Gopher's gate
    val stopHits = StopMarkers
      .map(w => when(array_contains(t, w), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)

    val fWords = nTok >= MinWords && nTok <= MaxWords
    val fWlen = meanWordLen >= MinMeanWordLen && meanWordLen <= MaxMeanWordLen
    val fSymbol = symbolRatio <= MaxSymbolRatio
    val fAlpha = alphaRatio >= MinAlphaRatio
    val fBullet = bulletRatio <= MaxBulletRatio
    val fEllipsis = ellipsisRatio <= MaxEllipsisRatio
    val fStop = stopHits >= MinStopHits
    val flags = Seq(fWords, fWlen, fSymbol, fAlpha, fBullet, fEllipsis, fStop)

    docs.select(
      col("doc_id"),
      nTok.as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      alphaRatio.as("alpha_ratio"),
      bulletRatio.as("bullet_ratio"),
      ellipsisRatio.as("ellipsis_ratio"),
      stopHits.as("stop_hits"),
      fWords.as("f_words"),
      fWlen.as("f_word_len"),
      fSymbol.as("f_symbol"),
      fAlpha.as("f_alpha"),
      fBullet.as("f_bullet"),
      fEllipsis.as("f_ellipsis"),
      fStop.as("f_stop"),
      flags.reduce(_ && _).as("keep"),
      flags.map(f => when(f, lit(0L)).otherwise(lit(1L))).reduce(_ + _).as("n_fail"),
    )
  }

  val gopherFiltersSql: String = {
    val markers = StopMarkers.map(w => s"'$w'").mkString(", ")
    s"""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             string_split(text, chr(10)) AS lns,
             length(text) AS char_len
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             round(CAST(char_len - (len(toks) - 1) AS DOUBLE) / len(toks), 6) AS mean_word_len,
             round(CAST(len(list_filter(toks, x -> contains(x, '#') OR contains(x, '...'))) AS DOUBLE)
                   / len(toks), 6) AS symbol_ratio,
             round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                   / len(toks), 6) AS alpha_ratio,
             round(CAST(len(list_filter(lns, l -> regexp_matches(l, '^[-*•] '))) AS DOUBLE)
                   / len(lns), 6) AS bullet_ratio,
             round(CAST(len(list_filter(lns, l -> regexp_matches(l, '(\\.\\.\\.|…)$$'))) AS DOUBLE)
                   / len(lns), 6) AS ellipsis_ratio,
             CAST(len(list_filter([$markers], w -> list_contains(toks, w))) AS BIGINT) AS stop_hits
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
           bullet_ratio, ellipsis_ratio, stop_hits,
           (n_words BETWEEN $MinWords AND $MaxWords) AS f_words,
           (mean_word_len BETWEEN $MinMeanWordLen AND $MaxMeanWordLen) AS f_word_len,
           (symbol_ratio <= $MaxSymbolRatio) AS f_symbol,
           (alpha_ratio >= $MinAlphaRatio) AS f_alpha,
           (bullet_ratio <= $MaxBulletRatio) AS f_bullet,
           (ellipsis_ratio <= $MaxEllipsisRatio) AS f_ellipsis,
           (stop_hits >= $MinStopHits) AS f_stop,
           ((n_words BETWEEN $MinWords AND $MaxWords)
            AND (mean_word_len BETWEEN $MinMeanWordLen AND $MaxMeanWordLen)
            AND (symbol_ratio <= $MaxSymbolRatio)
            AND (alpha_ratio >= $MinAlphaRatio)
            AND (bullet_ratio <= $MaxBulletRatio)
            AND (ellipsis_ratio <= $MaxEllipsisRatio)
            AND (stop_hits >= $MinStopHits)) AS keep,
           CAST(CASE WHEN n_words BETWEEN $MinWords AND $MaxWords THEN 0 ELSE 1 END
            + CASE WHEN mean_word_len BETWEEN $MinMeanWordLen AND $MaxMeanWordLen THEN 0 ELSE 1 END
            + CASE WHEN symbol_ratio <= $MaxSymbolRatio THEN 0 ELSE 1 END
            + CASE WHEN alpha_ratio >= $MinAlphaRatio THEN 0 ELSE 1 END
            + CASE WHEN bullet_ratio <= $MaxBulletRatio THEN 0 ELSE 1 END
            + CASE WHEN ellipsis_ratio <= $MaxEllipsisRatio THEN 0 ELSE 1 END
            + CASE WHEN stop_hits >= $MinStopHits THEN 0 ELSE 1 END AS BIGINT) AS n_fail
    FROM m"""
  }
}
