package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * operators.
  *
  * Everything here is built from codegen'd Catalyst expressions
  * (regexp/array/lambda functions) — no UDFs — so the operators that use
  * them stay inside whole-stage codegen and scale linearly. Every helper
  * has a bit-identical DuckDB rendering (documented per call site) so the
  * oracle can replay the same computation.
  */
object TextFunctions {

  /** BPE-ish token pattern: letter runs, digit runs, or single non-space
    * symbols — the shape of a byte-pair pre-tokenizer's word split. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Whitespace word split of trimmed text (empty text → empty array). */
  def wsTokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Normalized text: lowercase, trimmed, runs of whitespace collapsed —
    * the canonical form hashed by dedup/fingerprint ops. */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Word 3-shingles (distinct), the unit of n-gram dedup. Docs with fewer
    * than 3 tokens yield an empty array. */
  def shingles3(text: Column): Column = {
    val toks = wsTokens(text)
    when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
  }

  /** First 15 hex chars of md5 as a non-negative 60-bit long — the largest
    * md5 prefix that fits a signed 64-bit int in every engine
    * (DuckDB: CAST('0x' || substr(md5(x),1,15) AS BIGINT)). */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Chars remaining after stripping `stripPattern` — i.e. the count of
    * chars in the complementary class (DuckDB:
    * length(regexp_replace(x, pattern, '', 'g')) — note the 'g' flag,
    * DuckDB replaces only the first match without it). */
  def strippedLength(text: Column, stripPattern: String): Column =
    length(regexp_replace(text, stripPattern, ""))
}
