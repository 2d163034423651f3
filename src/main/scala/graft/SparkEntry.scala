package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full registry of implemented operators (one entry per
  * SURVEY.md §2 line + the generic relational / training-data-pipeline
  * surface); `oracleSql` carries the DuckDB-equivalent ANSI SQL for every
  * oracle-expressible entry. Registries live in graft.queries.*.
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def registry: Seq[Q] =
    graft.queries.Relational.all ++
    graft.queries.Relational2.all ++
    graft.queries.Receipts.all ++
    graft.queries.TextQueries.all ++
    graft.queries.LlmPrepQueries.all ++
    graft.queries.VectorQueries.all ++
    graft.queries.DedupQueries.all ++
    graft.queries.ImageQueries.all ++
    graft.queries.EventWindowQueries.all ++
    graft.queries.StreamingQueries.all ++
    graft.queries.MultimodalQueries.all ++
    graft.queries.JoinQueries.all ++
    graft.queries.SinkQueries.all ++
    graft.queries.CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join orders⋈customer⋈nation⋈region with broadcast dims — the
    * canonical shape of this engine (SURVEY.md §7.1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Q.queryMap(registry)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Q.oracleMap(registry)
}
