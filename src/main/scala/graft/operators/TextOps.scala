package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text normalization / tokenization / shingling column builders.
  *
  * Every definition here has an exact DuckDB equivalent (documented per method)
  * so that any operator built on these primitives stays oracle-checkable. All
  * are `org.apache.spark.sql.functions` compositions — codegen'd, no UDFs.
  */
object TextOps {

  /** Lowercased, whitespace-collapsed, trimmed text.
    * DuckDB: `regexp_replace(lower(trim(text)), '\s+', ' ', 'g')`.
    */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the lowercased text, empties dropped.
    * DuckDB: `list_filter(string_split_regex(lower(text), ' +'), t -> t <> '')`.
    *
    * NOT a `filter()` HOF (Spark evaluates higher-order-function lambdas
    * interpreted per element — profiled at ~2 ms/doc in the dedup tier):
    * splitting on space runs can only produce empty tokens at the string
    * edges, and `array_remove(_, "")` is a codegen'd single pass that drops
    * them — including the degenerate `[""]` from empty/all-space text, so the
    * empty-drop contract holds for EVERY input, matching the oracle exactly.
    */
  def tokens(c: Column): Column =
    array_remove(split(lower(c), " +"), "")

  /** Distinct 3-gram word shingles; defined for docs with ≥3 tokens (callers
    * filter `size(tokens) >= 3`). Shingle i (1-based) joins tokens i..i+2.
    * DuckDB: `list_distinct([array_to_string(ts[i:i+2], ' ') FOR i IN range(1, len(ts)-1)])`
    * (DuckDB `range` is exclusive at the top, slices are inclusive).
    */
  def shingles3(toks: Column): Column =
    array_distinct(
      transform(sequence(lit(1), size(toks) - 2), i => concat_ws(" ", slice(toks, i, lit(3))))
    )

  /** Quantized natural log: round(1e6·ln p) as a 64-bit integer — the ONE
    * definition of the engine's quantize-before-sum contract (NB scoring,
    * LM perplexity, token entropy). The literal `1000000.0` appears in the
    * consumers' oracle SQL as well — keep them textually in sync. Note the
    * quantization makes per-row terms integers (order-independent sums
    * within an engine); it does not make ln() itself cross-engine
    * bit-stable — see the caveat at `Learn.cl_lm_perplexity`.
    */
  def qlog(p: Column): Column =
    round(lit(1000000.0) * log(p)).cast("long")

  /** Stopword list shared with the oracle SQL (keep in sync textually). */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Language marker words for the n-gram/marker language-ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "y"),
    "fr" -> Seq("le", "la", "les", "et")
  )

  /** Clipped linear quality score from structural ratios: base 0.2, rewarded
    * by stopword density (real prose has function words), penalized by
    * punctuation density (markup/symbol soup), clamped to [0,1]. No exp/log —
    * libm is not bit-stable across engines; every operand here is an integer
    * count or exact length, so the score is deterministic. Callers must gate
    * out empty/whitespace-only text first (0-token docs make the stopword
    * ratio 0/0 = NULL). Shared by `ta_quality` (which also reports the
    * component ratios) and the `pl_train_corpus` pipeline filter.
    */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val nPunct = (length(c) - length(regexp_replace(c, "[.,!?;:'\"]", ""))).cast("double")
    val stopRatio = markerCount(c, Stopwords).cast("double") / size(tokens(c))
    val punctRatio = nPunct / nChars
    greatest(lit(0.0), least(lit(1.0), lit(0.2) + stopRatio * 2.0 - punctRatio * 3.0))
  }

  /** Count of whitespace tokens of `lower(text)` that appear in `words`, as
    * ONE codegen'd regex pass over the text instead of a per-token
    * interpreted `filter()` lambda (the lambda ran interpreted per token — ×4
    * languages in ta_langid — and dominated those scans).
    *
    * Tokens are delimited by space runs, so a marker occurrence is the word
    * with a space on both sides once the text is padded with one space at
    * each edge; the zero-width lookarounds keep adjacent occurrences
    * ("a a a") countable despite the shared delimiter space. Words are
    * required letter-only so a future marker-list edit that would need regex
    * escaping or sub-token matching fails loudly instead of miscounting; each
    * word is `Pattern.quote`d anyway as defense in depth.
    * DuckDB: `len(list_filter(ts, t -> list_contains([...], t)))` (unchanged).
    */
  def markerCount(text: Column, words: Seq[String]): Column = {
    require(
      words.nonEmpty && words.forall(_.matches("[a-z]+")),
      s"marker words must be non-empty lowercase-letter-only (got: ${words.mkString(",")})")
    regexp_count(
      concat(lit(" "), lower(text), lit(" ")),
      lit(words.map(java.util.regex.Pattern.quote).mkString("(?<= )(", "|", ")(?= )"))
    )
  }
}
