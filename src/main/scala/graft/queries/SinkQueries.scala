package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Sink surface registered as a driver-checkable query: q73 pushes an
  * aggregate THROUGH the K1 JDBC batch-insert path (Derby in-memory —
  * the sandbox stand-in for the reference's SQLite, `db.py:5-13`) and
  * returns what the database hands back, so the oracle checks
  * end-to-end sink fidelity (types, decimals-as-scaled-bigints, row
  * set), not just that a write happened. K2-K4 stay spec-tier
  * (SinksSpec) — file moves and schema merges have no query-shaped
  * output.
  */
object SinkQueries {

  // fresh in-memory db per invocation: writeJdbc is append-mode (the
  // reference's batch-insert semantics), so reusing one db across
  // registry re-runs would accumulate duplicates
  private val runId = new java.util.concurrent.atomic.AtomicLong

  val all: Seq[Q] = Seq(
    Q("q73_jdbc_roundtrip",
      (s, d) => {
        import graft.functions.ColumnOps.e2
        val url = s"jdbc:derby:memory:graft_q73_${runId.incrementAndGet()};create=true"
        val agg = Tables.customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
            sum(e2(col("c_acctbal"))).as("acctbal_e2"))
        graft.sources.Sinks.writeJdbc(agg, url, "segment_stats")
        graft.sources.Sinks.readJdbc(s, url, "segment_stats")
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers,
               CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS acctbal_e2
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
      """),
      // bench=false: measures Derby insert throughput, not the engine
      bench = false),

    // ---------------------------------------------------------------
    // q81: multi-format source/sink round-trip — the same projection
    // written to and re-read from ORC, CSV and JSON (the interchange
    // formats a lakehouse ingests beside parquet), then fingerprinted
    // per format. The oracle computes the identical fingerprint from
    // the original parquet, so a format that mangles anything (types,
    // quoting, row loss) diverges and fails the hash check — the check
    // is end-to-end through each format's writer AND reader, not "a
    // write happened". Text-hostile columns are shaped first: the
    // money double becomes a scaled bigint (CSV/JSON round-trip floats
    // by decimal rendering, which is where exactness dies), so every
    // written column is a long or a comma-free string. Re-reads use
    // the explicit schema — schema inference is a correctness hazard,
    // not a feature, in a pipeline.
    Q("q81_format_roundtrip",
      (s, d) => {
        import graft.functions.ColumnOps.e2
        val base = graft.TempDirs.scoped("graft_q81")
        val cust = Tables.customer(s, d).select(
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          e2(col("c_acctbal")).as("acctbal_e2"), col("c_mktsegment"))
        val schema = cust.schema
        cust.write.mode("overwrite").orc(s"$base/orc")
        cust.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
        cust.write.mode("overwrite").json(s"$base/json")
        val reread = Seq(
          "csv" -> s.read.schema(schema).option("header", "true").csv(s"$base/csv"),
          "json" -> s.read.schema(schema).json(s"$base/json"),
          "orc" -> s.read.schema(schema).orc(s"$base/orc"))
        reread.map { case (fmt, df) =>
          df.agg(
            count(lit(1)).as("n_rows"),
            sum(col("acctbal_e2")).cast("long").as("sum_acctbal_e2"),
            countDistinct(col("c_mktsegment")).as("n_segments"),
            min(col("c_custkey")).as("min_key"),
            max(col("c_custkey")).as("max_key"))
            .select(lit(fmt).as("fmt"), col("n_rows"), col("sum_acctbal_e2"),
              col("n_segments"), col("min_key"), col("max_key"))
        }.reduce(_.unionAll(_)).orderBy(col("fmt"))
      },
      Some("""
        WITH f AS (
          SELECT COUNT(*) AS n_rows,
                 CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
                      AS BIGINT) AS sum_acctbal_e2,
                 COUNT(DISTINCT c_mktsegment) AS n_segments,
                 MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
          FROM customer
        )
        SELECT fmt, n_rows, sum_acctbal_e2, n_segments, min_key, max_key
        FROM (SELECT 'csv' AS fmt, * FROM f
              UNION ALL SELECT 'json', * FROM f
              UNION ALL SELECT 'orc', * FROM f)
        ORDER BY fmt
      """),
      // bench=false: measures tmpfs write throughput of three format
      // encoders, not query execution
      bench = false)
  )
}
