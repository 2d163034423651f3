package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Event-time windowing over `events` — tumbling, sliding, session —
  * the batch expression of the streaming semantics (same `window` /
  * `session_window` functions run under watermarks in
  * StreamingWindowSpec). Window starts are emitted as formatted strings
  * (parquet timestamp annotations differ between engine writers).
  */
object EventWindowQueries {

  // shared driver-gate output-shaping helpers — rationale in ColumnOps
  import graft.functions.ColumnOps.{dec2, e2}
  private def fmt(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // q45: tumbling 1-hour windows per event type. Epoch-aligned in
    // both engines (Spark window() and DuckDB time_bucket).
    Q("q45_tumbling_window",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
               sum(e2(col("value"))).as("total_e2"))
          .select(fmt(col("w.start")).as("window_start"), col("event_type"),
                  col("n"), col("total_e2"))
          .orderBy(col("window_start"), col("event_type"))
      },
      Some("""
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_e2
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
      """)),

    // ---------------------------------------------------------------
    // q46: sliding windows (1 hour, 30-minute slide) — every event
    // lands in exactly two windows; the oracle unrolls that membership
    // explicitly.
    Q("q46_sliding_window",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"),
               sum(e2(col("value"))).as("total_e2"))
          .select(fmt(col("w.start")).as("window_start"), col("n"), col("total_e2"))
          .orderBy(col("window_start"))
      },
      Some("""
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_e2
        FROM (
          SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                         time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
                 value
          FROM events
        )
        GROUP BY ws ORDER BY window_start
      """)),

    // ---------------------------------------------------------------
    // q47: session windows (10-minute gap) per user — Spark
    // session_window vs the classic gaps-and-islands rewrite in the
    // oracle (new session iff the gap to the previous event >= 10 min,
    // exactly session_window's merge rule).
    Q("q47_session_window",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"),
               sum(e2(col("value"))).as("total_e2"))
          .select(col("user_id"), fmt(col("w.start")).as("session_start"),
                  col("n_events"), col("total_e2"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some("""
        WITH o AS (
          SELECT user_id, ts, value,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w >= INTERVAL '10 minutes'
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT user_id, ts, value,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_e2
        FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
      """)),

    // ---------------------------------------------------------------
    // q52: salted two-phase aggregation — the skew-mitigation pattern
    // (event_type has ~5 hot keys carrying the full table; salting
    // splits each across 8 sub-keys, then merges partials). Exact
    // decimal sums, so the result equals the direct groupBy.
    Q("q52_salted_agg",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_type"), e2(col("value")).as("v"))
        graft.operators.Salt.sumsBySaltedKey(e, "event_type", 8,
            Map("total_e2" -> col("v")))
          .select(col("event_type"), col("n"), col("total_e2"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_e2
        FROM events GROUP BY event_type ORDER BY event_type
      """))
  )
}
