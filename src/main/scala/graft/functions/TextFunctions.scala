package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for corpus curation: tokenization, token
  * counting, quality scoring, language ID, and document fingerprinting.
  *
  * Everything here is a per-row codegen'd expression (functions, not UDFs):
  * no shuffle, no state — they vectorize across partitions untouched at any
  * scale. Arithmetic is kept portable (integer ops, explicit double casts,
  * left-to-right folds) so an external SQL oracle evaluates the identical
  * IEEE sequence.
  *
  * Reference scope: not in the reference repo (its only scalar math is
  * abs/pow, src/Kmeans.java:67-69); these are north-star LLM-pipeline
  * additions per BASELINE.json.
  */
object TextFunctions {

  /** Whitespace tokenizer (the corpus contract: single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish pre-tokenizer: word pieces OR isolated punctuation — the
    * standard `\w+|[^\w\s]` regex used by byte-pair pre-segmentation.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("""\w+|[^\w\s]"""), lit(0))

  /** int64, not Spark size()'s int32 — every hashed integer column in
    * the corpus standardizes on BIGINT (the oracle engines' count type),
    * so the driver's type-aware compare never sees width skew.
    */
  def tokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  /** English-ish stopword list used by quality scoring and TF-IDF. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for",
    "on", "with", "as", "by", "at", "or", "be", "this", "that", "from")

  private val stopArr: Column = array(stopwords.map(lit): _*)

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => array_contains(stopArr, t)))

  /** Quality score in [0,1]: blend of length band, punctuation ratio and
    * stopword ratio — the C4/Gopher-style cheap heuristics. All-double
    * arithmetic with fixed evaluation order (portable to a SQL oracle).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val punct = size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0))).cast("double")
    val stopRatio = stopwordCount(toks).cast("double") / greatest(nTok, lit(1.0))
    val punctRatio = punct / greatest(nChar, lit(1.0))
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val wordLen = nChar / greatest(nTok, lit(1.0))
    val wordLenScore = when(wordLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    round(lenScore * lit(0.4) + wordLenScore * lit(0.2) +
      least(stopRatio * lit(4.0), lit(1.0)) * lit(0.2) +
      (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.2), 6)
  }

  /** Stopword-hit language ID. Scores each candidate language by counting
    * tokens from its closed stopword list; argmax with a fixed tie-break
    * order (list order below). A pure heuristic — deterministic, cheap,
    * per-row — the standard first-pass filter of large-corpus pipelines.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "人"))

  def langScores(toks: Column): Seq[(String, Column)] =
    langStopwords.map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(arr, t)))
    }

  def langId(text: Column): Column = {
    val scores = langScores(tokens(text))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in list order) attaining the max — fixed tie-break
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Polynomial rolling-hash fingerprint over the document's CODEPOINTS:
    * fold of (acc*131 + codepoint) mod 1e9+7. Integer-only arithmetic —
    * bit-identical in any engine — and content-sensitive at every position
    * (unlike e.g. a length/prefix sketch).
    *
    * The fold iterates codepoints (codePointAt + charCount), not UTF-16
    * units: SQL engines index per CHARACTER (DuckDB `ascii(text[i])`), so
    * a char-unit fold would diverge on any supplementary-plane character
    * (emoji, rare CJK) — agreeing only by accident on BMP-only corpora.
    *
    * One compiled UDF pass per row: the expression formulation
    * (`aggregate(transform(sequence(...), substr ...))`) is interpreted
    * per CHARACTER and allocates a string per step — measured 4s of a 63s
    * sf0.1 bench on its own. Max intermediate (1e9+7)·131 + c < 2^63, so
    * the math is overflow-free; identical to the DuckDB oracle's
    * list_reduce fold over ascii codepoints.
    */
  def fingerprint(text: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) 0L
      else {
        var acc = 0L
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          acc = (acc * 131 + cp) % 1000000007L
          i += Character.charCount(cp)
        }
        acc
      }
    }
    f(text)
  }
}
