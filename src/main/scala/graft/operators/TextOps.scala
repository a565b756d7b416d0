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
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), " +"), t => t =!= lit(""))

  /** Distinct 3-gram word shingles; defined for docs with ≥3 tokens (callers
    * filter `size(tokens) >= 3`). Shingle i (1-based) joins tokens i..i+2.
    * DuckDB: `list_distinct([array_to_string(ts[i:i+2], ' ') FOR i IN range(1, len(ts)-1)])`
    * (DuckDB `range` is exclusive at the top, slices are inclusive).
    */
  def shingles3(toks: Column): Column =
    array_distinct(
      transform(sequence(lit(1), size(toks) - 2), i => concat_ws(" ", slice(toks, i, lit(3))))
    )

  /** Stopword list shared with the oracle SQL (keep in sync textually). */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Language marker words for the n-gram/marker language-ID heuristic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "y"),
    "fr" -> Seq("le", "la", "les", "et")
  )

  /** Count of tokens that appear in `words`.
    * DuckDB: `len(list_filter(ts, t -> list_contains([...], t)))`.
    */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
}
