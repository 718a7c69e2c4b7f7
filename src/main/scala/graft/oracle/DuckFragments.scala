package graft.oracle

import graft.functions.TextFunctions

/** Shared DuckDB-SQL fragments for the oracle side of the harness —
  * single source of truth for the clean-text chain and the stopword
  * list, so the Spark Column implementations in
  * [[graft.functions.TextFunctions]] and every oracle that embeds them
  * cannot drift apart (they are generated from the same constants).
  *
  * ASCII-explicit regexes + the 'g' flag keep Java regex (Spark) and
  * DuckDB's RE2 in byte-for-byte agreement; DuckDB regexp_replace is
  * first-match-only without 'g'.
  */
object DuckFragments {

  /** ≙ [[TextFunctions.cleanText]] over a `text` column: lower →
    * contraction replaces (generated from the SAME lists, nested
    * innermost-first so application order matches the Scala fold;
    * whole-word passes `\b`-anchored on both sides, suffix passes on
    * the right — `\b` is the ASCII word boundary in both Java regex
    * and RE2) → strip → trim. */
  val cleanSql: String = {
    def esc(k: String): String = k.replace("'", "''")
    val whole = TextFunctions.wholeWordContractions.foldLeft("lower(text)") {
      case (acc, (k, v)) => s"regexp_replace($acc, '\\b${esc(k)}\\b', '$v', 'g')"
    }
    val expanded = TextFunctions.suffixContractions.foldLeft(whole) {
      case (acc, (k, v)) => s"regexp_replace($acc, '${esc(k)}\\b', '$v', 'g')"
    }
    s"trim(regexp_replace(regexp_replace($expanded, '[^a-z ]', ' ', 'g'), '\\s+', ' ', 'g'))"
  }

  /** Token list (may contain '' entries — filter downstream). */
  val tokListSql: String = s"string_split($cleanSql, ' ')"

  def sqlStringList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(", ")

  val stopListSql: String = sqlStringList(TextFunctions.stopWords)

  /** ≙ [[graft.features.Featurize.wordsCol]]: tokens with empties and
    * stopwords removed, still a list. */
  val wordsListSql: String =
    s"list_filter($tokListSql, x -> x <> '' AND x NOT IN ($stopListSql))"
}
