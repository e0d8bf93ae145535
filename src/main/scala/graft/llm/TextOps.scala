package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-pipeline operators (SURVEY.md §7.1).
  *
  * Everything here is built-in-function composition (codegen'd, no UDFs)
  * and written for cross-engine determinism: the same normalization /
  * tokenization is expressible verbatim in the DuckDB oracle SQL, so the
  * operators built on top stay hash-gateable.
  */
object TextOps {

  /** Lowercase, collapse whitespace runs to single spaces, trim.
    * Oracle mirror: `lower(trim(regexp_replace(t, '\s+', ' ', 'g')))`. */
  def normText(c: Column): Column = lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the normalized text (never empty strings,
    * because [[normText]] guarantees single spaces). */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Distinct word n-gram shingles. Docs shorter than n tokens yield an
    * empty array (the `when` guard matters: Spark's `sequence(0, -1)`
    * would otherwise produce a *descending* sequence, not an empty one).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
}
