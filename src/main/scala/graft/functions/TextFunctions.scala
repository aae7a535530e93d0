package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level scalar functions of the engine (SURVEY §2.11).
  *
  * All of these are composed from `org.apache.spark.sql.functions._`
  * builtins, so they stay inside whole-stage codegen — no UDF boundary.
  */
object TextFunctions {

  /** Hyphen cleaning before OCR-noise comparison: remove `-`/`¬` plus any
    * following whitespace (reference:
    * `lib/inception_postprocessing/helpers.py:27-28`). */
  def hyphenClean(c: Column): Column =
    regexp_replace(c, "[-¬]\\s*", "")

  /** Normalized Levenshtein distance after hyphen cleaning — the LED metric
    * of `helpers.py:55-69` (`stringdist.levenshtein_norm`): edit distance
    * divided by the longer cleaned length. Pure Catalyst (builtin
    * `levenshtein` is codegen'd); no UDF needed (SURVEY §4.2 item 3). */
  def levenshteinNorm(a: Column, b: Column): Column = {
    val ca = hyphenClean(a)
    val cb = hyphenClean(b)
    levenshtein(ca, cb).cast("double") /
      greatest(length(ca), length(cb), lit(1)).cast("double")
  }

  /** Accent-fold + lower for contains-matching (`unidecode` analog,
    * `preprocessing.ipynb cells 9-10`). ICU-free approximation: strip
    * combining marks via NFD — expressed with translate for the fr/de
    * range so it stays codegen'd. */
  def foldAccentsLower(c: Column): Column =
    translate(lower(c),
      "àâäáãåéèêëíìîïóòôöõúùûüçñœæ",
      "aaaaaaeeeeiiiiooooouuuucnoa")

  /** `decade = year // 10 * 10` (`import_data.ipynb cell 7`). */
  def decadeOf(year: Column): Column =
    (year.cast("int") / 10).cast("int") * 10

  /** Whitespace token count on single-space-joined text. */
  def tokenCount(text: Column): Column =
    size(split(text, " "))

  /** BPE-ish token count: a GPT-style pre-tokenizer approximation —
    * letter runs, digit runs and punctuation runs (each optionally
    * space-prefixed) are each one unit, the shape subword tokenizers
    * split on before merges. Lookahead-free alternation so the same
    * pattern means the same thing under Java regex and RE2 (the DuckDB
    * oracle). Pure Catalyst (`regexp_extract_all`), fuses into the scan. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"), lit(0)))

  /** Deterministic document fingerprint: minimum md5 over character
    * 5-grams (a 1-permutation MinHash; SURVEY "document fingerprinting").
    * Pure higher-order-function Catalyst — no UDF. */
  def fingerprint5(text: Column): Column =
    when(length(text) >= 5,
      array_min(transform(
        sequence(lit(0), length(text) - 5),
        i => md5(text.substr(i + lit(1), lit(5)).cast("binary")))))
      .otherwise(md5(text.cast("binary")))
}
