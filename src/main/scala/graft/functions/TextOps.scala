package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline:
  * tokenization, shingling, quality stats, language ID and
  * fingerprinting. Everything is pure Catalyst column algebra
  * (higher-order array functions, no UDFs) so it stays inside
  * whole-stage codegen and scales linearly with the corpus — the
  * per-document cost is O(tokens) with no driver involvement.
  */
object TextOps {

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word n-gram shingles; documents shorter than `n` tokens
    * contribute their whole token join as a single shingle so they
    * still participate in similarity search.
    *
    * PERF: pass a *materialized attribute* (project [[tokens]] into a
    * column first), never the tokens expression inline — `toks` is
    * referenced inside the per-window lambda, and an inline
    * `split(...)` there is re-evaluated once PER WINDOW per row
    * (measured ~7 s of an 11 s pipeline at sf0.1). An attribute
    * referenced three times is never inlined by CollapseProject.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))

  /** ASCII punctuation count (explicit ranges so the Java-regex and
    * RE2 oracle twins agree byte for byte).
    */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))

  /** BPE-ish subword token estimate: alpha runs, digit runs, and any
    * other non-space character each count as one token — the classic
    * pre-tokenizer shape, far closer to an LLM tokenizer's count than
    * whitespace splitting. Same pattern runs under Java regex and RE2.
    */
  val BpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  private val EnStop = Seq("the", "a", "of", "to", "and", "in", "is", "it")
  private val DeStop = Seq("der", "die", "und", "das", "ist", "ein", "zu", "den")
  private val EsStop = Seq("el", "la", "de", "que", "y", "en", "un", "los")
  private val FrStop = Seq("le", "la", "de", "et", "les", "des", "un", "du")

  def stopwordCount(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stop)))

  def stopwordCountEn(toks: Column): Column = stopwordCount(toks, EnStop)

  /** SQL IN-list literal for the oracle twins. */
  def stopListSql(lang: String): String = (lang match {
    case "en" => EnStop
    case "de" => DeStop
    case "es" => EsStop
    case "fr" => FrStop
  }).map(w => s"'$w'").mkString("(", ", ", ")")

  /** CJK character count (zh detection). */
  def cjkCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))

  /** Per-language stopword scores as (column, alias) pairs, in the
    * tie-break priority order of the classifier.
    */
  def langScores(toks: Column): Seq[(Column, String)] = Seq(
    stopwordCount(toks, EnStop) -> "en_n",
    stopwordCount(toks, DeStop) -> "de_n",
    stopwordCount(toks, EsStop) -> "es_n",
    stopwordCount(toks, FrStop) -> "fr_n")

  /** Heuristic language classifier over the score columns: CJK-ratio
    * gate first, then stopword-score argmax with the deterministic
    * tie-break priority en > de > es > fr.
    */
  def predictedLang(enN: Column, deN: Column, esN: Column, frN: Column,
                    cjkN: Column, nTokens: Column): Column =
    when(cjkN > 0 && cjkN * 2 >= nTokens, "zh")
      .when(enN >= deN && enN >= esN && enN >= frN, "en")
      .when(deN >= esN && deN >= frN, "de")
      .when(esN >= frN, "es")
      .otherwise("fr")

  private val FpPrime = 1000000007L

  /** Polynomial rolling hash over the token stream, mod a 31-bit prime
    * (keeps every intermediate < 2^36, so no bigint overflow under
    * ANSI arithmetic on any engine).
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(xxhash64(t), lit(FpPrime)), lit(FpPrime)))

  /** Winnowing-style minimum over the window hashes of `n`-token
    * shingles — robust to local edits, unlike the rolling hash.
    */
  def minShingleFingerprint(toks: Column, n: Int): Column =
    array_min(transform(shingles(toks, n), s => pmod(xxhash64(s), lit(FpPrime))))
}
