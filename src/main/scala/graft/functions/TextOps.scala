package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis building blocks for the large-scale
  * training-data operators (dedup, language-ID, quality scoring,
  * fingerprinting) over the `documents` table.
  *
  * Everything here is built from `org.apache.spark.sql.functions` only —
  * higher-order array functions and built-in scalar expressions, all
  * whole-stage-codegen friendly. No UDFs: a Scala UDF would break codegen
  * and serialize per-row; these stay inside Catalyst.
  *
  * Cross-engine determinism notes (the driver hash-compares against
  * DuckDB):
  *  - integer-ratio doubles (`k / n`) are IEEE-exact and order-free, so
  *    they match DuckDB bit-for-bit without rounding;
  *  - `md5` hex strings are engine-independent;
  *  - `xxhash64` is Spark-specific and only ever used *inside* operators
  *    whose final output is verified by exact, engine-neutral math
  *    (MinHash/SimHash candidates are re-checked with exact Jaccard).
  */
object TextOps {

  /** Whitespace tokens with empties dropped (leading/double spaces in the
    * corpus would otherwise produce "" tokens). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct word n-gram shingles ("w-shingling"); the unit of the
    * near-dup Jaccard measure. Docs shorter than n words have no shingle.
    * Char n-grams are useless on this corpus (shared vocab pushes all
    * pairwise char-3-gram Jaccards above 0.5); word shingles separate the
    * planted near-dup pairs (J >= 0.9) from background (J < 0.03). */
  def wordShingles(text: Column, n: Int): Column =
    array_distinct(wordNgrams(text, n))

  /** ALL word n-gram occurrences in order (the multiset [[wordShingles]]
    * distincts) — the unit of frequency analysis (heavy hitters). */
  def wordNgrams(text: Column, n: Int): Column = {
    val w = tokens(text)
    // Built by zip_with over n shifted slices of the token array — NOT
    // `transform(sequence(...), i => ...w...)`: a lambda body that
    // captures `w` re-evaluates the whole tokenization per ELEMENT in
    // interpreted mode (O(len²) per doc; measured 3× slowdown across
    // the dedup suite). zip_with's lambda touches only its element
    // variables, so tokenization runs O(n) times per ROW.
    val cnt = size(w) - (n - 1)
    val grams = (1 until n).foldLeft(slice(w, lit(1), cnt)) { (acc, o) =>
      zip_with(acc, slice(w, lit(1 + o), cnt), (a, b) => concat(a, lit(" "), b))
    }
    when(size(w) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Count of tokens that appear in `set` (exact membership). */
  def tokensIn(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(set))).cast("long")

  /** English-ish stopword list used by quality scoring. Kept tiny and
    * mirrored verbatim in the DuckDB oracle SQL. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Per-language stopword marker sets for the n-gram-free language-ID
    * heuristic (argmax of marker hits, ties broken de<en<es<fr). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
  )

  /** MD5 hex fingerprint of a string column (engine-neutral). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Lexicographic min of the shingle MD5s — a 1-permutation MinHash
    * usable as a cheap locality-sensitive doc sketch, and deterministic
    * across engines (hex-string compare). Null when no shingles. */
  def minShingleFingerprint(shingles: Column): Column =
    array_min(transform(shingles, s => md5(s.cast("binary"))))

  /** GPT-2-style BPE pre-tokenizer pattern, simplified to the Java-regex
    * ∩ RE2 dialect (no unicode category classes, no lookahead): pieces
    * are a leading-space-attached letter run, digit run, or
    * punctuation run, or a whitespace run. Piece counts track LLM
    * token budgets far better than whitespace token counts. */
  val bpePretokenRe: String =
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** PII scrub patterns, ordered (earlier patterns see the raw text).
    * Written in the Java-regex ∩ RE2 dialect — character classes,
    * bounded quantifiers, no backreferences/lookaround — so Spark's
    * `regexp_replace` and the DuckDB oracle's (RE2) apply IDENTICAL
    * semantics; the replacement markers survive later patterns. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b" -> "<PHONE>",
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>",
  )

  /** Redact [[piiPatterns]] left to right — a single per-row projection
    * chain of codegen'd `regexp_replace` calls (global replace in both
    * engines): at 100 TB this is one embarrassingly-parallel scan stage,
    * no shuffle, no UDF. */
  def redact(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, mark)) =>
      regexp_replace(c, re, mark)
    }

  /** Count of matches of `re` in `text` (pre-redaction audit metric). */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")
}
