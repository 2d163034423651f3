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

  /** Per-document quality metric projection (n_tok / n_stop / n_punct /
    * n_chars) over a row carrying `text` and a tokens list column —
    * the shared front of the quality-composite twin.
    */
  def qualityMetrics(stopwords: Seq[String], toksCol: String = "ts"): String =
    s"""len($toksCol) AS n_tok,
       |                 len(list_filter($toksCol, tk ->
       |                   list_contains(${sqlList(stopwords)}, tk))) AS n_stop,
       |                 len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
       |                 length(text) AS n_chars""".stripMargin

  /** DuckDB twin of [[graft.text.TextAnalysis.qualityScore]] scaled to
    * floor(q·1e4), over the [[qualityMetrics]] columns. ONE definition:
    * q94 and q95 both embed it, so a coefficient or regex fix cannot
    * desynchronize their oracles.
    */
  val QualityE4: String =
    """CAST(floor(((least(CAST(n_tok AS DOUBLE) / 20.0, 1.0)
      |                            + least((CAST(n_stop AS DOUBLE) / greatest(n_tok, 1)) * 4.0, 1.0)
      |                            + greatest(0.0, 1.0 - (CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)) * 4.0))
      |                           / 3.0) * 10000) AS BIGINT)""".stripMargin

  /** DuckDB twin of [[graft.operators.VectorLsh.buckets]] over a column
    * `emb` (DOUBLE[]): one `... AS b{t}` select item per hash table,
    * the seeded hyperplanes embedded as double literals
    * (Double.toString round-trips exactly) and every dot written as a
    * LEFT-ASSOCIATIVE sum — the sequential IEEE accumulation order the
    * native DotProduct uses — so sign bits match bit-for-bit. Shared
    * by the q43 and q37 generated oracles: the plane set has ONE
    * definition on each engine side.
    */
  def lshBucketSql(tables: Seq[Seq[Array[Double]]]): String =
    tables.zipWithIndex.map { case (planes, t) =>
      planes.zipWithIndex.map { case (p, i) =>
        val dot = p.zipWithIndex
          .map { case (w, j) => s"emb[${j + 1}]*($w)" }.mkString(" + ")
        s"(CASE WHEN $dot > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ") + s" AS b$t"
    }.mkString(",\n               ")

  /** DuckDB twin of TextQueries.bm25Scored (the q145 scoring core,
    * shared with q152's fusion oracle): CTE chain ending in
    * `agg(doc_id, n_matched, score_e6)`. ONE definition so the fused
    * text ranking can never drift from the standalone one.
    */
  def bm25AggSql(terms: Seq[String]): String =
    s"""bdocs AS (
       |          SELECT doc_id, $DTokens AS ts FROM documents
       |        ), bcorpus AS (
       |          SELECT COUNT(*) AS n_docs, CAST(SUM(len(ts)) AS BIGINT) AS t_tokens
       |          FROM bdocs
       |        ), btoks AS (
       |          SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl, unnest(ts) AS tok
       |          FROM bdocs
       |        ), btf AS (
       |          SELECT doc_id, tok, COUNT(*) AS tf, MAX(dl) AS dl
       |          FROM btoks WHERE tok IN (${terms.map(t => s"'$t'").mkString(", ")})
       |          GROUP BY doc_id, tok
       |        ), bdfreq AS (
       |          SELECT tok, COUNT(*) AS df FROM btf GROUP BY tok
       |        ), bscored AS (
       |          SELECT btf.doc_id,
       |                 CAST(floor(ln((2.0 * n_docs - 2*df + 1) / (2*df + 1) + 1.0)
       |                   * 1000000) AS BIGINT) AS idf_e6,
       |                 1000*btf.tf + 300 + (btf.dl * 900 * n_docs) // t_tokens
       |                   AS denom_e3,
       |                 btf.tf AS tf
       |          FROM btf JOIN bdfreq USING (tok), bcorpus
       |        ), agg AS (
       |          SELECT doc_id, COUNT(*) AS n_matched,
       |                 CAST(SUM((idf_e6 * ((tf * 2200000) // denom_e3)) // 1000)
       |                   AS BIGINT) AS score_e6
       |          FROM bscored GROUP BY doc_id
       |        )""".stripMargin
}
