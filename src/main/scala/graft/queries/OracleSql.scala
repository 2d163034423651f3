package graft.queries

/** Shared DuckDB-oracle SQL fragments — ONE definition of the
  * cross-engine tokenization twin and literal-list rendering, so a
  * quoting or regex fix cannot drift between the query modules that
  * embed them (TextQueries, LlmPrepQueries, StreamingQueries).
  */
private[queries] object OracleSql {

  /** DuckDB twin of [[graft.text.TextAnalysis.tokens]]. */
  val DTokens: String =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""

  /** A Scala string list as a DuckDB list literal. */
  def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ",", "]")
}
