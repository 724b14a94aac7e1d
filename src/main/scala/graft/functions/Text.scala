package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the BM25 chain, dedup and
  * text-analysis operators.
  *
  * The reference tokenizes with ansj Chinese segmentation plus a
  * part-of-speech whitelist and stopword set (reference
  * BatchBM25PreMain.java:38-48,185-199). The engine's tokenizer is the
  * same operator shape — explode + predicate filter — with a
  * whitespace tokenizer (the corpus is space-separated) and a
  * stopword/min-length predicate standing in for the POS whitelist.
  * Everything here is deliberately expressible in ANSI SQL so the
  * DuckDB oracle can replay it exactly (SURVEY.md §6).
  */
object Text {
  /** Stopword set (engine default; the ref's set is domain-specific). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** SQL-literal form of [[Stopwords]] for oracle queries. */
  def stopwordsSqlList: String = Stopwords.map(w => s"'$w'").mkString(", ")

  val MinTokenLength = 2

  /** Raw whitespace tokens of a text column (lowercased). */
  def rawTokens(text: Column): Column = split(lower(text), " ")

  /** Pluggable tokenizer: split on a delimiter regex (the engine's
    * generalization point for language-specific segmentation — the
    * reference plugs in ansj Chinese segmentation here; any
    * tokenization that can be expressed as a split/regex pass is a
    * Column function, anything heavier is a custom Expression).
    * Trailing/leading empty tokens are removed so delimiter runs at
    * the edges don't produce phantom terms. */
  def regexTokens(text: Column, delimPattern: String = "[^a-z0-9]+"): Column =
    filter(split(lower(text), delimPattern), t => length(t) > 0)

  /** Keep predicate applied to each token (stopword + min length). */
  def keepToken(term: Column): Column =
    length(term) >= MinTokenLength && !term.isin(Stopwords: _*)

  /** Deterministic POS lexicon over the corpus vocabulary — the
    * engine's stand-in for a real tagger's term→tag table (the
    * reference tags with ansj and keeps nouns n/ns/nt/nz, reference
    * BatchBM25PreMain.java:38-48,185-199). The lexicon is DATA, not
    * code: a broadcast term→tag join plus a whitelist predicate on the
    * tag column, so swapping in a million-entry real lexicon changes
    * nothing about the plan shape. */
  val PosLexicon: Seq[(String, String)] = Seq(
    "batch" -> "n", "column" -> "n", "customer" -> "n", "data" -> "n",
    "group" -> "n", "hash" -> "n", "key" -> "n", "line" -> "n",
    "order" -> "n", "part" -> "n", "query" -> "n", "row" -> "n",
    "stream" -> "n", "table" -> "n", "value" -> "n", "vector" -> "n",
    "window" -> "n",
    "agg" -> "v", "dup" -> "v", "filter" -> "v", "join" -> "v",
    "merge" -> "v", "scan" -> "v", "sort" -> "v",
    "big" -> "adj", "fast" -> "adj", "slow" -> "adj", "small" -> "adj",
    "spark" -> "nz")

  /** Tags [[tokenizePos]] keeps by default — the ansj noun family. */
  val PosWhitelist: Seq[String] = Seq("n", "nz")

  /** SQL VALUES form of [[PosLexicon]] for oracle queries. */
  def posLexiconSqlValues: String =
    PosLexicon.map { case (t, g) => s"('$t', '$g')" }.mkString(", ")

  /** Driver-side twin of [[keepToken]] over a LITERAL query term: can
    * the tokenizer ever produce `t`? (Stopword / too short / not
    * lowercase / multi-token terms never match, and a query built on
    * one would return empty indistinguishably from "absent" — callers
    * reject such terms loudly.) */
  def producibleToken(t: String): Boolean =
    t.length >= MinTokenLength && !Stopwords.contains(t) &&
      t == t.toLowerCase && !t.contains(" ")
}
