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
      bench = false)
  )
}
