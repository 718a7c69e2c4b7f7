package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-cleaning / tokenization column expressions (SURVEY §2.7 F1-F12,
  * §2.8 V1-V2). All pure Catalyst `Column` chains — codegen'd, no UDFs —
  * re-expressing the reference's clean_text (ref 02_build_models.R:25-41)
  * as lazy expressions instead of eager R string maps.
  *
  * Regex classes are kept ASCII-explicit (`[^a-z0-9 ]`, `\\s+`) so Java
  * regex (Spark) and RE2 (DuckDB oracle) agree byte-for-byte.
  */
object TextFunctions {

  /** F1 lowercase. */
  def toLower(c: Column): Column = lower(c)

  /** F3+F4 strip punctuation and digits (anything outside [a-z ]) —
    * applied after lowering; ref 02_build_models.R:32-33. */
  def stripNonAlpha(c: Column): Column = regexp_replace(c, "[^a-z ]", " ")

  /** F5 collapse whitespace runs + F9 trim; ref 02_build_models.R:34. */
  def collapseWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Full clean chain ≙ reference clean_text (ref 02_build_models.R:25-41):
    * lower → strip punct/nums → collapse whitespace → trim.
    * (Contraction expansion F2 is a separate dictionary pass, see
    * [[expandContractions]].) */
  def cleanText(c: Column): Column = collapseWs(stripNonAlpha(toLower(c)))

  /** F2 contraction expansion — deterministic dictionary, longest-first
    * (ref 02_build_models.R:28 textclean::replace_contraction). */
  val contractions: Seq[(String, String)] = Seq(
    "won't" -> "will not", "can't" -> "cannot", "n't" -> " not",
    "'re" -> " are", "'ve" -> " have", "'ll" -> " will",
    "'d" -> " would", "'m" -> " am", "it's" -> "it is", "let's" -> "let us")

  def expandContractions(c: Column): Column =
    contractions.foldLeft(c) { case (col, (k, v)) =>
      regexp_replace(col, java.util.regex.Pattern.quote(k), v)
    }

  /** English stopword list (subset of snowball, matching the reference's
    * tm::stopwords("en") usage, ref 02_build_models.R:35) plus the
    * reference's custom noise words (ref 02_build_models.R:36). */
  val stopWords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "have", "he", "her", "his", "i", "in", "is", "it", "its", "of",
    "on", "or", "she", "that", "the", "their", "they", "this", "to", "was",
    "we", "were", "will", "with", "you",
    // reference-specific noise words:
    "project", "focuses", "team", "users")

  /** Whitespace tokenization of cleaned text → array<string> with empties
    * dropped. Deterministic and oracle-expressible (string_split + filter). */
  def tokens(c: Column): Column =
    filter(split(cleanText(c), " "), t => t =!= "")

  /** V1-ish n-gram generation from a token array: space-joined n-grams.
    * Built from transform over slice — stays in codegen'd expressions.
    * Empty array when the doc has fewer than n tokens (sequence would
    * otherwise count downward). */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Fast n-gram path: ml.feature.NGram (compiled sliding window —
    * identical output to [[ngrams]], ~50× faster than the interpreted
    * higher-order expression; use for hot paths over whole tables). */
  def withNgrams(df: org.apache.spark.sql.DataFrame, inCol: String,
                 outCol: String, n: Int): org.apache.spark.sql.DataFrame =
    new org.apache.spark.ml.feature.NGram()
      .setN(n).setInputCol(inCol).setOutputCol(outCol).transform(df)

  /** F10 comma-join of a token array (ref 02_build_models.R:82). */
  def joinTokens(c: Column): Column = array_join(c, ", ")

  /** F12 label prefix arithmetic (ref 02_build_models.R:632,764). */
  def clusterLabel(id: Column): Column = concat(lit("Cluster_"), id)
  def clusterId(label: Column): Column =
    regexp_replace(label, "^Cluster_", "").cast("int")

  /** F7 regex field extraction — capture-group form of the reference's
    * lookbehind extracts (ref 01_extract_features.R:277-279). */
  def extractField(c: Column, field: String, next: String): Column = {
    val pat = java.util.regex.Pattern.quote(field + ": ") +
      "(.*?)" + java.util.regex.Pattern.quote(" " + next + ":")
    regexp_extract(c, pat, 1)
  }
}
