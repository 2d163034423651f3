package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
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

  /** The SCD2 dimension attribute shared by q109 (interval build) and
    * q127 (point-in-time lookup): tier = props.k div 25. props.k is
    * non-negative, so truncating DIV equals the oracles' floor `//`.
    */
  private def propsTier: Column =
    expr("CAST(get_json_object(props, '$.k') AS BIGINT) DIV 25")

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
      """)),

    // ---------------------------------------------------------------
    // q103: ordered conversion funnel (r8) — view → click-after-view →
    // purchase-after-click, the staple product-analytics query, with a
    // 24-hour conversion window per stage (at sf0.01: 150 → 60 → 25).
    // The ordering constraint (each stage's event strictly AFTER the
    // previous stage's first event, within the window) is what makes
    // this more than three COUNT(DISTINCT)s.
    //
    // Scale: ONE user-keyed shuffle, no joins — per user we take
    // min(view ts) plus the click/purchase timestamp lists (bounded by
    // that user's event count, the standard funnel working-set
    // assumption), then resolve the chain with array_min∘filter
    // map-side. collect_list partials merge, so the combine is
    // map-side too. The oracle resolves the same chain with joins.
    Q("q103_funnel",
      (s, d) => {
        val perUser = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t_view"),
            collect_list(when(col("event_type") === "click", col("ts")))
              .as("clicks"),
            collect_list(when(col("event_type") === "purchase", col("ts")))
              .as("buys"))
          .select(col("t_view"),
            array_min(filter(col("clicks"), c =>
              c > col("t_view") &&
                c <= col("t_view") + expr("INTERVAL 24 HOURS")))
              .as("t_click"),
            col("buys"))
          .select(col("t_view"), col("t_click"),
            array_min(filter(col("buys"), b =>
              b > col("t_click") &&
                b <= col("t_click") + expr("INTERVAL 24 HOURS")))
              .as("t_buy"))
        perUser
          .agg(count(col("t_view")).as("n0"),
               count(col("t_click")).as("n1"),
               count(col("t_buy")).as("n2"))
          .selectExpr("""stack(3,
              CAST(1 AS BIGINT), 'view', n0, CAST(NULL AS BIGINT),
              CAST(2 AS BIGINT), 'click_after_view', n1,
                CASE WHEN n0 > 0 THEN (n1 * 10000) div n0 END,
              CAST(3 AS BIGINT), 'purchase_after_click', n2,
                CASE WHEN n1 > 0 THEN (n2 * 10000) div n1 END
            ) AS (stage_ord, stage, n_users, conv_e4)""")
          .orderBy(col("stage_ord"))
      },
      Some("""
        WITH v AS (
          SELECT user_id, MIN(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY 1
        ), c AS (
          SELECT e.user_id, MIN(e.ts) AS t_click
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t_view
            AND e.ts <= v.t_view + INTERVAL 24 HOUR
          GROUP BY e.user_id
        ), p AS (
          SELECT e.user_id, MIN(e.ts) AS t_buy
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            AND e.ts <= c.t_click + INTERVAL 24 HOUR
          GROUP BY e.user_id
        ), n AS (
          SELECT (SELECT COUNT(*) FROM v) AS n0,
                 (SELECT COUNT(*) FROM c) AS n1,
                 (SELECT COUNT(*) FROM p) AS n2
        )
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS stage_ord, 'view' AS stage,
                 CAST(n0 AS BIGINT) AS n_users, CAST(NULL AS BIGINT) AS conv_e4
          FROM n
          UNION ALL
          SELECT CAST(2 AS BIGINT), 'click_after_view', CAST(n1 AS BIGINT),
                 CASE WHEN n0 > 0 THEN CAST((n1 * 10000) // n0 AS BIGINT) END
          FROM n
          UNION ALL
          SELECT CAST(3 AS BIGINT), 'purchase_after_click', CAST(n2 AS BIGINT),
                 CASE WHEN n1 > 0 THEN CAST((n2 * 10000) // n1 AS BIGINT) END
          FROM n
        ) ORDER BY stage_ord
      """)),

    // ---------------------------------------------------------------
    // q104: weekly retention cohorts (r8) — cohort = epoch-aligned
    // week of a user's first event; cell (cohort, offset) = distinct
    // users from that cohort active offset weeks later. The classic
    // engagement matrix.
    //
    // Scale: user-keyed shuffle → per-user (first week, distinct-week
    // set; bounded by weeks, not events) → explode → cohort-keyed agg.
    // No events-side join at all; cohort sizes are a #weeks-row frame,
    // joined broadcast. Week ids stay integer epoch-week indexes —
    // no engine-specific timestamp bucketing to diverge on.
    Q("q104_retention_cohorts",
      (s, d) => {
        val byUser = Tables.events(s, d)
          .select(col("user_id"),
            floor(col("ts").cast("long") / 604800L).cast("long").as("wk"))
          .groupBy(col("user_id"))
          .agg(min(col("wk")).as("wk0"), collect_set(col("wk")).as("wks"))
          // feeds both the activity explode and the cohort sizes:
          // persist the per-user frame so events shuffle once
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val active = byUser
          .select(col("wk0"), explode(col("wks")).as("wk"))
          .groupBy(col("wk0"), (col("wk") - col("wk0")).as("week_offset"))
          .agg(count(lit(1)).as("n_active"))
        val sizes = byUser.groupBy(col("wk0"))
          .agg(count(lit(1)).as("cohort_size"))
        active.join(broadcast(sizes), "wk0")
          .select(col("wk0").as("cohort_week"), col("week_offset"),
            col("n_active"), col("cohort_size"),
            expr("(n_active * 10000) div cohort_size").as("retention_e4"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
          FROM events
        ), u AS (
          SELECT user_id, MIN(wk) AS wk0 FROM e GROUP BY 1
        ), a AS (
          SELECT DISTINCT e.user_id, u.wk0, e.wk - u.wk0 AS week_offset
          FROM e JOIN u USING (user_id)
        ), cs AS (
          SELECT wk0, COUNT(*) AS cohort_size FROM u GROUP BY 1
        ), r AS (
          SELECT wk0, week_offset, COUNT(*) AS n_active FROM a GROUP BY 1, 2
        )
        SELECT r.wk0 AS cohort_week, CAST(r.week_offset AS BIGINT) AS week_offset,
               CAST(r.n_active AS BIGINT) AS n_active,
               CAST(cs.cohort_size AS BIGINT) AS cohort_size,
               CAST((r.n_active * 10000) // cs.cohort_size AS BIGINT) AS retention_e4
        FROM r JOIN cs USING (wk0) ORDER BY cohort_week, week_offset
      """)),

    // ---------------------------------------------------------------
    // q109: SCD2 interval build (r8) — the warehouse dimension-history
    // op: derive each user's attribute (tier = props.k div 25) and
    // collapse the event log into validity intervals via
    // gaps-and-islands (new interval iff the tier differs from the
    // previous event's; valid_to = next interval's start, NULL while
    // current). This is change-data capture folded to history — the
    // shape every slowly-changing-dimension pipeline materializes.
    //
    // Scale: both windows partition by user_id (high-cardinality —
    // one shuffle, no single-task funnel); the second window runs on
    // the change rows only. Ordering inside a user is (ts, event_id)
    // so ties cannot flap; the output ORDER BY covers the full row.
    Q("q109_scd2_intervals",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val t = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            propsTier.as("tier"))
        val starts = t
          .withColumn("prev", lag(col("tier"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("tier"))
        val w2 = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        starts
          .withColumn("nxt", lead(col("ts"), 1).over(w2))
          .select(col("user_id"), col("tier"),
            fmt(col("ts")).as("valid_from"), fmt(col("nxt")).as("valid_to"))
          .orderBy(col("user_id"), col("valid_from"), col("tier"),
            col("valid_to"))
      },
      Some("""
        WITH t AS (
          SELECT user_id, ts, event_id,
                 CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) // 25 AS tier
          FROM events
        ), m AS (
          SELECT *, LAG(tier) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
          FROM t
        ), st AS (
          SELECT user_id, tier, ts, event_id FROM m
          WHERE prev IS NULL OR prev <> tier
        ), iv AS (
          SELECT user_id, tier, ts,
                 LEAD(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
          FROM st
        )
        SELECT user_id, tier,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(nxt, '%Y-%m-%d %H:%M:%S') AS valid_to
        FROM iv ORDER BY user_id, valid_from, tier, valid_to
      """)),

    // ---------------------------------------------------------------
    // q110: first-order Markov transition matrix over per-user event
    // sequences — P(next event type | current) as an exact-integer
    // e4 probability ((cnt·10000) div row-total, no floating point).
    // The lead() window shuffles once on user_id (high cardinality —
    // no skew); the transition-pair aggregation is |types|² rows.
    Q("q110_event_transitions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"))
          .withColumn("to_type", lead(col("from_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = Window.partitionBy(col("from_type"))
        pairs
          .withColumn("from_total", sum(col("n")).over(tot))
          .select(col("from_type"), col("to_type"), col("n"),
            expr("CAST((n * 10000) DIV from_total AS BIGINT)").as("p_e4"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""
        WITH seq AS (
          SELECT event_type AS from_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events
        ), pairs AS (
          SELECT from_type, to_type, COUNT(*) AS n
          FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST((n * 10000) // SUM(n) OVER (PARTITION BY from_type)
                    AS BIGINT) AS p_e4
        FROM pairs ORDER BY from_type, to_type
      """)),

    // ---------------------------------------------------------------
    // q111: time-decayed engagement score per user — weight halves per
    // whole week of age relative to the corpus max timestamp. The decay
    // is kept exactly rational (16 div 2^(weeks), weeks ≤ 4 over the
    // 30-day corpus) so the weighted sum is pure bigint arithmetic:
    // order-independent and hash-stable, unlike a float exp() decay.
    // One broadcast scalar (max ts) + one user-keyed aggregation.
    Q("q111_decayed_engagement",
      (s, d) => {
        val ev = Tables.events(s, d)
        val anchor = ev.agg(max(col("ts")).as("mx"))
        ev.crossJoin(broadcast(anchor))
          .select(col("user_id"),
            (e2(col("value")) *
              expr("16 DIV CAST(pow(2, datediff(CAST(mx AS DATE), CAST(ts AS DATE)) DIV 7) AS BIGINT)"))
              .as("wv"))
          .groupBy(col("user_id"))
          .agg(expr("CAST(SUM(wv) DIV 16 AS BIGINT)").as("decayed_e2"),
               count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS md FROM events)
        SELECT user_id,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                        * (16 // CAST(POW(2, DATEDIFF('day', CAST(ts AS DATE), md) // 7) AS BIGINT)))
                    // 16 AS BIGINT) AS decayed_e2,
               COUNT(*) AS n_events
        FROM events, mx
        GROUP BY user_id ORDER BY user_id
      """)),

    // ---------------------------------------------------------------
    // q112: 7-day rolling distinct active users per observed day.
    // NOT a range join: each (day,user) is expanded map-side into the
    // ≤7 window days it contributes to (explode of a constant array),
    // then one equi-join against the tiny observed-day dimension
    // (broadcast) and one exact-distinct aggregation. The expansion
    // factor is the window length — fixed — so the shape is a 7×
    // map-side blow-up plus two hash shuffles regardless of scale.
    Q("q112_rolling_actives",
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .distinct()
        val days = ud.select(col("day")).distinct()
        ud.withColumn("x", explode(sequence(lit(0), lit(6))))
          .select(expr("date_add(day, x)").as("day"), col("user_id"))
          .join(broadcast(days), "day")
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("active_7d"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
                  col("active_7d"))
          .orderBy(col("day"))
      },
      Some("""
        WITH ud AS (
          SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ), days AS (SELECT DISTINCT day FROM ud),
        ex AS (
          SELECT ud.day + CAST(x AS INTEGER) AS day, user_id
          FROM ud, UNNEST(generate_series(0, 6)) AS t(x)
        )
        SELECT strftime(ex.day, '%Y-%m-%d') AS day,
               COUNT(DISTINCT user_id) AS active_7d
        FROM ex JOIN days ON ex.day = days.day
        GROUP BY 1 ORDER BY day
      """)),

    // ---------------------------------------------------------------
    // q113: robust per-type outlier report — lower median and median
    // absolute deviation (MAD), both computed over the e2-quantized
    // value histogram, flagging values beyond 3·MAD. Quantization
    // bounds the histogram at (max−min)·100 buckets per type no matter
    // the row count, so the per-type cumulative windows run over
    // compressed aggregates, not data rows — that's what makes an
    // exact median scale where sort-based percentile would funnel.
    // All arithmetic is bigint (lower median, not interpolated), so
    // the result is hash-stable across engines.
    Q("q113_mad_outliers",
      (s, d) => {
        val h = Tables.events(s, d)
          .groupBy(col("event_type"), e2(col("value")).as("v"))
          .agg(count(lit(1)).as("cnt"))
        val byType = Window.partitionBy(col("event_type"))
        val cumW = byType.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val medOf = h
          .withColumn("n", sum(col("cnt")).over(byType))
          .withColumn("cum", sum(col("cnt")).over(cumW))
          .filter(col("cum") >= expr("(n + 1) DIV 2"))
          .groupBy(col("event_type"))
          .agg(min(col("v")).as("med_e2"), max(col("n")).as("n"))
        val dev = h.join(broadcast(medOf), "event_type")
          .groupBy(col("event_type"), abs(col("v") - col("med_e2")).as("dv"))
          .agg(sum(col("cnt")).as("cnt"),
               max(col("med_e2")).as("med_e2"), max(col("n")).as("n"))
        val devCum = byType.orderBy(col("dv"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val madOf = dev
          .withColumn("cum", sum(col("cnt")).over(devCum))
          .filter(col("cum") >= expr("(n + 1) DIV 2"))
          .groupBy(col("event_type"))
          .agg(min(col("dv")).as("mad_e2"))
        h.join(broadcast(medOf), "event_type")
          .join(broadcast(madOf), "event_type")
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"), max(col("med_e2")).as("med_e2"),
               max(col("mad_e2")).as("mad_e2"),
               sum(when(abs(col("v") - col("med_e2")) > col("mad_e2") * 3,
                     col("cnt")).otherwise(lit(0L))).as("n_outliers"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH h AS (
          SELECT event_type,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2
        ), c AS (
          SELECT *, SUM(cnt) OVER (PARTITION BY event_type) AS n,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM h
        ), med AS (
          SELECT event_type, MIN(v) AS med_e2, MAX(n) AS n
          FROM c WHERE cum >= (n + 1) // 2 GROUP BY 1
        ), dh AS (
          SELECT h.event_type, ABS(v - med_e2) AS dv, SUM(cnt) AS cnt,
                 MAX(med_e2) AS med_e2, MAX(n) AS n
          FROM h JOIN med ON h.event_type = med.event_type
          GROUP BY 1, 2
        ), dc AS (
          SELECT *, SUM(cnt) OVER (PARTITION BY event_type ORDER BY dv
                                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM dh
        ), mad AS (
          SELECT event_type, MIN(dv) AS mad_e2
          FROM dc WHERE cum >= (n + 1) // 2 GROUP BY 1
        )
        SELECT h.event_type, CAST(MAX(med.n) AS BIGINT) AS n,
               MAX(med.med_e2) AS med_e2, MAX(mad.mad_e2) AS mad_e2,
               CAST(SUM(CASE WHEN ABS(v - med.med_e2) > mad.mad_e2 * 3
                             THEN cnt ELSE 0 END) AS BIGINT) AS n_outliers
        FROM h JOIN med ON h.event_type = med.event_type
               JOIN mad ON h.event_type = mad.event_type
        GROUP BY 1 ORDER BY 1
      """)),

    // ---------------------------------------------------------------
    // q117: top-10 session opening paths — the first ≤3 event types of
    // every 10-minute session (q47's gap rule), counted corpus-wide:
    // the sequence-mining summary product analytics reads next to the
    // q103 funnel (which paths actually happen vs the one we designed
    // for). Per-session ordering is (ts, event_id) inside a
    // session_window aggregate — one user-keyed shuffle; the path
    // count is a tiny second agg; top-10 is native ORDER BY LIMIT.
    // Scale note: the collect_list partial phase hashes one key per
    // session CANDIDATE (∝ rows per input split), so a dense split
    // (>2^21 events) sort-falls-back — the correct merge algorithm
    // for sessions, allowlisted as structural in ScaleBench
    // .SortFallbackOk rather than "fixed" with an extra pre-shuffle.
    Q("q117_session_paths",
      (s, d) => {
        val paths = Tables.events(s, d)
          .groupBy(col("user_id"),
            session_window(col("ts"), "10 minutes").as("w"))
          .agg(sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))).as("ev"))
          .select(concat_ws(">",
            transform(slice(col("ev"), 1, 3), x => x("event_type"))).as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        graft.operators.TopK.global(paths,
            Seq(col("n_sessions").desc, col("path")), 10)
          .orderBy(col("rank"))
      },
      Some("""
        WITH o AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w >= INTERVAL '10 minutes'
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        ), p AS (
          SELECT array_to_string(
                   list_slice(array_agg(event_type ORDER BY ts, event_id),
                              1, 3), '>') AS path
          FROM s GROUP BY user_id, sid
        ), pc AS (
          SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path
        )
        SELECT path, n_sessions,
               CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path)
                    AS INT) AS rank
        FROM pc ORDER BY n_sessions DESC, path LIMIT 10
      """)),

    // ---------------------------------------------------------------
    // q118: longest consecutive-day activity streak per user — the
    // date-arithmetic gaps-and-islands twin of q109's value-change
    // intervals: distinct user-days, island id = day − row_number
    // (consecutive days share it), island lengths, max per user. Every
    // window is user-keyed (high cardinality), the distinct is one
    // hash shuffle — nothing funnels.
    Q("q118_activity_streaks",
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        ud.withColumn("grp", expr("date_sub(day, row_number() OVER " +
            "(PARTITION BY user_id ORDER BY day))"))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("user_id"))
          .agg(max(col("len")).as("longest_streak"),
               sum(col("len")).as("n_active_days"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ), g AS (
          SELECT user_id, day,
                 day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY day) AS INTEGER) AS grp
          FROM ud
        ), runs AS (
          SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2
        )
        SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
               CAST(SUM(len) AS BIGINT) AS n_active_days
        FROM runs GROUP BY user_id ORDER BY user_id
      """)),

    // ---------------------------------------------------------------
    // q119: rate-burst detection — minutes where an event type's count
    // is ≥3 AND exceeds 3× its trailing-hour per-minute average (n·20 >
    // trailing sum — exact integers, no division; the n≥3 floor keeps
    // sparse 1-event minutes from reading as bursts). Events are
    // pre-aggregated to
    // (type, epoch-minute) FIRST, so the per-type RANGE window runs
    // over a bounded minute series (≤ minutes-in-retention rows per
    // type) no matter how many raw events — the same
    // compress-then-window trick as q113. Minutes are emitted as raw
    // epoch-minute bigints: no timestamp formatting, no tz surface.
    Q("q119_burst_detection",
      (s, d) => {
        val pm = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 60").as("m"))
          .agg(count(lit(1)).as("n"))
        val trail = Window.partitionBy(col("event_type")).orderBy(col("m"))
          .rangeBetween(-60, -1)
        pm.withColumn("trail_n", sum(col("n")).over(trail))
          .filter(col("trail_n").isNotNull && col("n") >= 3 &&
            col("n") * 20 > col("trail_n"))
          .select(col("event_type"), col("m"), col("n"), col("trail_n"))
          .orderBy(col("event_type"), col("m"))
      },
      Some("""
        WITH pm AS (
          SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 60 AS m,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2
        ), t AS (
          SELECT *, SUM(n) OVER (PARTITION BY event_type ORDER BY m
                       RANGE BETWEEN 60 PRECEDING AND 1 PRECEDING) AS trail_n
          FROM pm
        )
        SELECT event_type, m, n, CAST(trail_n AS BIGINT) AS trail_n
        FROM t
        WHERE trail_n IS NOT NULL AND n >= 3 AND n * 20 > trail_n
        ORDER BY event_type, m
      """)),

    // ---------------------------------------------------------------
    // q120: RFM segmentation — recency / frequency / monetary exact
    // tertiles over purchase activity, the classic customer-base
    // summary. Tier boundaries are EXACT global ranks ((rank−1)·3 div
    // n), not approximate percentiles, computed three times through
    // GlobalRank's two-phase rank (range-partition + per-partition
    // offsets) — no single-task ORDER BY window at any user count.
    // Tie-breaks on user_id make every rank total; all arithmetic is
    // integer (days, counts, e2 cents). Tier 1 = most recent for R;
    // tier 3 = highest for F/M.
    Q("q120_rfm_segments",
      (s, d) => {
        import graft.operators.GlobalRank
        val ev = Tables.events(s, d)
        val anchor = ev.agg(max(to_date(col("ts"))).as("md"))
        // persisted: consumed four times (sampled + shuffled by the
        // first rank pass, and by the user-count aggregate) — without
        // this the purchase reduction re-runs from the events scan
        val base = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(max(to_date(col("ts"))).as("lastd"),
               count(lit(1)).as("freq"),
               sum(e2(col("value"))).as("mon"))
          .crossJoin(broadcast(anchor))
          .select(col("user_id"), datediff(col("md"), col("lastd")).as("rec"),
                  col("freq"), col("mon"))
          .persist()
        val ranked = Seq[(String, Column)](
            "rr" -> col("rec"), "fr" -> col("freq"), "mr" -> col("mon"))
          .foldLeft(base) { case (df, (rc, c)) =>
            GlobalRank.withGlobalRank(df, Seq(c, col("user_id")), rc)
          }
        val n = base.agg(count(lit(1)).as("nu"))
        ranked.crossJoin(broadcast(n))
          .select(concat_ws("-",
              expr("((rr - 1) * 3) DIV nu + 1"),
              expr("((fr - 1) * 3) DIV nu + 1"),
              expr("((mr - 1) * 3) DIV nu + 1")).as("segment"))
          .groupBy(col("segment")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("segment"))
      },
      Some("""
        WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS md FROM events),
        p AS (
          SELECT user_id, MAX(CAST(ts AS DATE)) AS lastd, COUNT(*) AS freq,
                 SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS mon
          FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ), m AS (
          SELECT user_id, DATEDIFF('day', lastd, md) AS rec, freq, mon
          FROM p, mx
        ), r AS (
          SELECT user_id,
                 ROW_NUMBER() OVER (ORDER BY rec, user_id) AS rr,
                 ROW_NUMBER() OVER (ORDER BY freq, user_id) AS fr,
                 ROW_NUMBER() OVER (ORDER BY mon, user_id) AS mr,
                 COUNT(*) OVER () AS n
          FROM m
        )
        SELECT CAST(((rr - 1) * 3) // n + 1 AS VARCHAR) || '-' ||
               CAST(((fr - 1) * 3) // n + 1 AS VARCHAR) || '-' ||
               CAST(((mr - 1) * 3) // n + 1 AS VARCHAR) AS segment,
               COUNT(*) AS n_users
        FROM r GROUP BY 1 ORDER BY segment
      """)),

    // ---------------------------------------------------------------
    // q121: exact p50/p90/p99 per event type by the nearest-rank rule
    // (value at rank ceil(p·n/100)), computed over the e2-quantized
    // value histogram like q113 — the cumulative window runs over
    // ≤ (max−min)·100 compressed buckets per type, never over data
    // rows, which is what lets an EXACT tail percentile (the ops
    // metric approx_percentile can't pin down) scale. All arithmetic
    // is bigint: rank thresholds are (n·p + 99) div 100, outputs are
    // conditional MINs over the cumulative counts.
    Q("q121_value_percentiles",
      (s, d) => {
        val h = Tables.events(s, d)
          .groupBy(col("event_type"), e2(col("value")).as("v"))
          .agg(count(lit(1)).as("cnt"))
        val byType = Window.partitionBy(col("event_type"))
        val cumW = byType.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        h.withColumn("n", sum(col("cnt")).over(byType))
          .withColumn("cum", sum(col("cnt")).over(cumW))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            expr("MIN(CASE WHEN cum >= (n * 50 + 99) DIV 100 THEN v END)")
              .as("p50_e2"),
            expr("MIN(CASE WHEN cum >= (n * 90 + 99) DIV 100 THEN v END)")
              .as("p90_e2"),
            expr("MIN(CASE WHEN cum >= (n * 99 + 99) DIV 100 THEN v END)")
              .as("p99_e2"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH h AS (
          SELECT event_type,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2
        ), c AS (
          SELECT *, SUM(cnt) OVER (PARTITION BY event_type) AS n,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM h
        )
        SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
               MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50_e2,
               MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN v END) AS p90_e2,
               MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99_e2
        FROM c GROUP BY 1 ORDER BY event_type
      """)),

    // ---------------------------------------------------------------
    // q127: SCD2 point-in-time lookup — each purchase priced against
    // the dimension value valid AT ITS TIMESTAMP (the feature-store /
    // training-data temporal-correctness join: never read a future
    // attribute). The dimension history is q109's change stream
    // restricted to 'view' events (tier = props.k div 25); probes are
    // purchases. NOT an interval join: the union + partitioned
    // last-non-null window (q53's as-of machinery, aimed at a derived
    // dimension) resolves every probe in ONE shuffle keyed by user_id
    // — no range-join explosion, no interval table materialized.
    // Same-instant semantics are pinned by the sort (ts, is_probe,
    // event_id): a change AT the probe's ts is visible (changes sort
    // first), and concurrent same-ts changes resolve to the highest
    // event_id deterministically. Purchases before any view report
    // tier NULL (explicit NULLS FIRST on both engines — their default
    // null order differs).
    Q("q127_scd2_lookup",
      (s, d) => {
        val ev = Tables.events(s, d)
        val changes = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(0).as("is_probe"), propsTier.as("tier"),
            lit(null).cast("long").as("val_e2"))
        val probes = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(1).as("is_probe"), lit(null).cast("long").as("tier"),
            e2(col("value")).as("val_e2"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_probe"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        changes.unionByName(probes)
          .withColumn("cur_tier", last(col("tier"), ignoreNulls = true).over(w))
          .filter(col("is_probe") === 1)
          .groupBy(col("cur_tier").as("tier"))
          .agg(count(lit(1)).as("n_purchases"),
               sum(col("val_e2")).as("value_e2"))
          .orderBy(col("tier").asc_nulls_first)
      },
      Some("""
        WITH u AS (
          SELECT user_id, ts, event_id, 0 AS is_probe,
                 CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) // 25
                   AS tier,
                 CAST(NULL AS BIGINT) AS val_e2
          FROM events WHERE event_type = 'view'
          UNION ALL
          SELECT user_id, ts, event_id, 1, NULL,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
          FROM events WHERE event_type = 'purchase'
        ), f AS (
          SELECT *, LAST_VALUE(tier IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, is_probe, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cur_tier
          FROM u
        )
        SELECT cur_tier AS tier, CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(val_e2) AS BIGINT) AS value_e2
        FROM f WHERE is_probe = 1
        GROUP BY 1 ORDER BY tier NULLS FIRST
      """)),

    // ---------------------------------------------------------------
    // q128: A/B experiment lift — users split into two deterministic
    // arms (user_id parity — the auditable stand-in for a salted
    // assignment hash), conversion = a purchase strictly after the
    // user's first view (exposure), and conv_value_e2 counts ONLY
    // post-exposure purchase revenue (a pre-exposure purchase is
    // neither a conversion nor attributable value). Shape: exposure
    // frame (per-user min view ts) ⋈ purchases with ts > exposure →
    // per-user post stats, then a 2-row arm rollup — both reductions
    // and the join are keyed by user_id (ONE shuffle key end to end);
    // rates are exact e4 integers (conv·10⁴ div n), no floats.
    Q("q128_ab_lift",
      (s, d) => {
        val ev = Tables.events(s, d)
        val fv = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("fv"))
        val post = ev.filter(col("event_type") === "purchase")
          .join(fv, "user_id")
          .filter(col("ts") > col("fv"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("np"), sum(e2(col("value"))).as("pe2"))
        fv.join(post, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("np").isNotNull, lit(1L)).otherwise(lit(0L)).as("converted"),
            coalesce(col("pe2"), lit(0L)).as("cv"))
          .groupBy(pmod(col("user_id"), lit(2L)).as("arm"))
          .agg(count(lit(1)).as("n_users"),
               sum(col("converted")).as("n_converted"),
               sum(col("cv")).as("conv_value_e2"))
          .withColumn("conv_e4", expr("n_converted * 10000 DIV n_users"))
          .orderBy(col("arm"))
      },
      Some("""
        WITH fv AS (
          SELECT user_id, MIN(ts) AS fv FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ), post AS (
          SELECT e.user_id, COUNT(*) AS np,
                 SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS pe2
          FROM events e JOIN fv USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > fv.fv
          GROUP BY e.user_id
        ), per AS (
          SELECT fv.user_id,
                 CASE WHEN np IS NOT NULL THEN 1 ELSE 0 END AS converted,
                 COALESCE(pe2, 0) AS cv
          FROM fv LEFT JOIN post ON fv.user_id = post.user_id
        )
        SELECT user_id % 2 AS arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted,
               CAST(SUM(cv) AS BIGINT) AS conv_value_e2,
               CAST(SUM(converted) * 10000 // COUNT(*) AS BIGINT) AS conv_e4
        FROM per GROUP BY 1 ORDER BY arm
      """)),

    // ---------------------------------------------------------------
    // q131: calendar gap fill — densify the per-(type, day) count
    // series over the full observed date range, missing days as 0 (the
    // step every dashboard/forecast consumer needs before windowing,
    // since q119-style RANGE frames are correct on sparse series but
    // chart/ML consumers want dense ones). The dense axis is generated,
    // not scanned: sequence(min, max) on a 1-row bounds aggregate ×
    // the distinct-type dimension (broadcast nested-loop over
    // #days·#types rows — both dimension-sized), then ONE left join
    // against the real counts keyed (type, day). Events are
    // pre-aggregated before the join, so the dense frame never touches
    // raw rows.
    Q("q131_gap_fill",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val counts = ev.groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n"))
        val days = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
          .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        val types = ev.select(col("event_type")).distinct()
        days.crossJoin(broadcast(types))
          .join(counts, Seq("event_type", "day"), "left")
          .na.fill(0L, Seq("n"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type, CAST(ts AS DATE) AS day FROM events
        ), b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ev),
        days AS (
          SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
            AS day
          FROM b
        ), t AS (SELECT DISTINCT event_type FROM ev),
        c AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2)
        SELECT t.event_type AS event_type, days.day AS day,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        FROM days CROSS JOIN t
        LEFT JOIN c ON c.event_type = t.event_type AND c.day = days.day
        ORDER BY 1, 2
      """)),

    // ---------------------------------------------------------------
    // q132: cumulative unique users per day — the growth curve. The
    // naive COUNT(DISTINCT) OVER (ORDER BY day) carries an
    // ever-growing distinct set through one task; the scale shape is
    // first-touch attribution: per-user MIN(day) (one user-keyed agg),
    // collapse to per-day new-user counts (calendar-bounded), then the
    // exact running sum via GlobalRank.withGlobalCumSum — cumulative
    // uniques ≡ cumsum of first appearances, an identity that turns an
    // unbounded-state window into two bounded aggs + the two-phase
    // cumsum. Output carries new_users and cum_users per day.
    Q("q132_cumulative_uniques",
      (s, d) => {
        import graft.operators.GlobalRank
        val perDay = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("day"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("new_users"))
        GlobalRank.withGlobalCumSum(perDay, Seq(col("day")),
            col("new_users"), "__r", "cum_users", "__t")
          .select(col("day"), col("new_users"), col("cum_users"))
          .orderBy(col("day"))
      },
      Some("""
        WITH f AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
        ), p AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1)
        SELECT day, CAST(new_users AS BIGINT) AS new_users,
               CAST(SUM(new_users) OVER (ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM p ORDER BY day
      """)),

    // ---------------------------------------------------------------
    // q135: EWMA trend per event type — exponential smoothing
    // (α = 1/2) of the daily count series as a sequential FOLD:
    // s_t = (s_{t-1} + x_t) div 2 in e3 integers, seeded with the
    // first day (list_reduce semantics, mirrored exactly on both
    // engines), observed days only. A recursion can't be windowed;
    // the scale answer is that the series is CALENDAR-BOUNDED: events
    // compress to (type, day) counts first (the q113/q119 trick), so
    // the collect_list + aggregate() HOF folds over ≤ days-in-range
    // elements per type — driver-free, bounded state, and the fold
    // itself is a codegen'd higher-order function, not a UDF.
    Q("q135_ewma_smoothing",
      (s, d) => {
        val pm = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        pm.groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("sd"))
          .withColumn("a", expr("transform(sd, p -> p.n * 1000)"))
          .select(col("event_type"), size(col("a")).as("n_days"),
            expr("""aggregate(slice(a, 2, size(a) - 1), element_at(a, 1),
                    (s, x) -> (s + x) DIV 2)""").as("sm_e3"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH pm AS (
          SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
          FROM events GROUP BY 1, 2
        ), l AS (
          SELECT event_type, list(n ORDER BY day) AS ns FROM pm GROUP BY 1
        )
        SELECT event_type, CAST(len(ns) AS INT) AS n_days,
               CAST(list_reduce(list_transform(ns, x -> CAST(x * 1000 AS BIGINT)),
                                (s, x) -> (s + x) // 2) AS BIGINT) AS sm_e3
        FROM l ORDER BY event_type
      """)),

    // ---------------------------------------------------------------
    // q146: sketched distinct counting — per-segment cardinality via
    // the K-Minimum-Values sketch (graft.expressions.KmvAgg), audited
    // against the exact count, error emitted as data (the q97
    // recall-as-data discipline). This is the scale-safe form of
    // "distinct users per segment": exact COUNT(DISTINCT) carries
    // reducer state ∝ cardinality — the measured quantity itself —
    // while the sketch is O(k) mergeable state per partial at any
    // parallelism. Spark's own approx_count_distinct (HLL++) has
    // engine-defined estimates the driver could only rows-check; KMV
    // over the deterministic 56-bit md5 hash is a pure set function
    // of the input, so the ESTIMATE is bit-reproducible and the
    // DuckDB twin (k-th smallest distinct hash via a ranking window)
    // hash-compares it. Estimator: n̂ = (k−1)·2^56 div h_k when the
    // sketch is full, exact size otherwise; err_e4 reports
    // |n̂−n|·10⁴ div n per segment. The exact column doubles as the
    // audit: at web scale you drop it and keep the sketch.
    Q("q146_kmv_distinct",
      (s, d) => {
        val k = 64
        val h = conv(substring(md5(concat(lit("kmv:"),
          col("user_id").cast("string"))), 1, 14), 16, 10).cast("bigint")
        Tables.events(s, d)
          .select(col("event_type"), h.as("h"))
          .groupBy(col("event_type"))
          .agg(graft.expressions.KmvAgg.kmv(col("h"), k).as("sk"),
            countDistinct(col("h")).as("exact_distinct"))
          .withColumn("est_distinct",
            when(size(col("sk")) < k, size(col("sk")).cast("bigint"))
              .otherwise(
                expr(s"${(k - 1L) * 72057594037927936L}L div element_at(sk, $k)")))
          .select(col("event_type"), col("exact_distinct"),
            col("est_distinct"),
            expr("abs(est_distinct - exact_distinct) * 10000 div exact_distinct")
              .as("err_e4"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH h AS (
          SELECT DISTINCT event_type,
                 CAST('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 14)
                   AS BIGINT) AS h
          FROM events
        ), ranked AS (
          SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS nd
          FROM h
        ), sk AS (
          SELECT event_type, CAST(MAX(nd) AS BIGINT) AS exact_distinct,
                 MAX(CASE WHEN rn = 64 THEN h END) AS h64,
                 COUNT(*) AS n_in
          FROM ranked WHERE rn <= 64 GROUP BY event_type
        ), est AS (
          SELECT event_type, exact_distinct,
                 CAST(CASE WHEN n_in < 64 THEN n_in
                      ELSE (63 * 72057594037927936) // h64 END AS BIGINT)
                   AS est_distinct
          FROM sk
        )
        SELECT event_type, exact_distinct, est_distinct,
               CAST(abs(est_distinct - exact_distinct) * 10000 // exact_distinct
                 AS BIGINT) AS err_e4
        FROM est ORDER BY event_type
      """)),

    // ---------------------------------------------------------------
    // q150: fixed-size quantile sketch — per-type p50/p99 from a
    // 64-bucket equi-width histogram, audited against the exact
    // percentiles (the q146/q97 error-as-data discipline, aimed at
    // quantiles). q121's exact machinery compresses to the VALUE
    // domain first — bounded for cent-valued metrics, but state ∝
    // distinct values in general; the histogram sketch is O(64) per
    // group REGARDLESS of the value domain, trivially mergeable
    // (counts sum), the classic warehouse answer when the metric is
    // high-cardinality continuous. All arithmetic is integer on the
    // e2-quantized values: bucket = ((v−mn)·64) div (mx−mn+1), the
    // estimate interpolates inside the covering bucket — deterministic
    // on both engines, so unlike approx_percentile (engine-defined)
    // the ESTIMATE itself hash-compares. Per-type bounds broadcast;
    // the histogram and exact sides reuse one scan's compressed frame.
    Q("q150_quantile_sketch",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), e2(col("value")).as("v"))
        val bounds = ev.groupBy(col("event_type"))
          .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        val byType = Window.partitionBy(col("event_type"))
        def t(p: Int) = s"(n * $p + 99) DIV 100"
        // the CASE fires ONLY for the covering bucket (cum ≥ t > cum−cnt)
        // — one row per percentile; past the covering bucket the
        // interpolation offset t − cum_before would go negative and a
        // bare MIN would pick a sparse late bucket's garbage value
        def estExpr(p: Int) = expr(
          s"""MIN(CASE WHEN cum >= ${t(p)} AND cum - cnt < ${t(p)} THEN
                mn + (b * (mx - mn + 1)) DIV 64
                   + ((${t(p)} - (cum - cnt)) * ((mx - mn + 1) DIV 64)) DIV cnt
              END)""")
        val est = ev.join(broadcast(bounds), "event_type")
          .withColumn("b", expr("((v - mn) * 64) div (mx - mn + 1)"))
          .groupBy(col("event_type"), col("b"))
          .agg(count(lit(1)).as("cnt"), max(col("mn")).as("mn"),
            max(col("mx")).as("mx"))
          .withColumn("n", sum(col("cnt")).over(byType))
          .withColumn("cum", sum(col("cnt")).over(
            byType.orderBy(col("b"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"), estExpr(50).as("p50_est_e2"),
            estExpr(99).as("p99_est_e2"))
        val h = ev.groupBy(col("event_type"), col("v"))
          .agg(count(lit(1)).as("cnt"))
        val exact = h
          .withColumn("n", sum(col("cnt")).over(byType))
          .withColumn("cum", sum(col("cnt")).over(
            byType.orderBy(col("v"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("event_type"))
          .agg(expr(s"MIN(CASE WHEN cum >= ${t(50)} THEN v END)")
              .as("p50_exact_e2"),
            expr(s"MIN(CASE WHEN cum >= ${t(99)} THEN v END)")
              .as("p99_exact_e2"))
        est.join(exact, "event_type")
          .select(col("event_type"), col("n"),
            col("p50_exact_e2"), col("p50_est_e2"),
            abs(col("p50_est_e2") - col("p50_exact_e2")).as("p50_err_e2"),
            col("p99_exact_e2"), col("p99_est_e2"),
            abs(col("p99_est_e2") - col("p99_exact_e2")).as("p99_err_e2"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
          FROM events
        ), bounds AS (
          SELECT event_type, MIN(v) AS mn, MAX(v) AS mx
          FROM ev GROUP BY event_type
        ), hist AS (
          SELECT ev.event_type, ((v - mn) * 64) // (mx - mn + 1) AS b,
                 COUNT(*) AS cnt, MAX(mn) AS mn, MAX(mx) AS mx
          FROM ev JOIN bounds USING (event_type)
          GROUP BY 1, 2
        ), hc AS (
          SELECT *, SUM(cnt) OVER (PARTITION BY event_type) AS n,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY b
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM hist
        ), est AS (
          SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                 CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100
                               AND cum - cnt < (n * 50 + 99) // 100 THEN
                   mn + (b * (mx - mn + 1)) // 64
                      + (((n * 50 + 99) // 100 - (cum - cnt))
                         * ((mx - mn + 1) // 64)) // cnt END) AS BIGINT)
                   AS p50_est_e2,
                 CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100
                               AND cum - cnt < (n * 99 + 99) // 100 THEN
                   mn + (b * (mx - mn + 1)) // 64
                      + (((n * 99 + 99) // 100 - (cum - cnt))
                         * ((mx - mn + 1) // 64)) // cnt END) AS BIGINT)
                   AS p99_est_e2
          FROM hc GROUP BY 1
        ), vc AS (
          SELECT event_type, v, COUNT(*) AS cnt FROM ev GROUP BY 1, 2
        ), vcc AS (
          SELECT *, SUM(cnt) OVER (PARTITION BY event_type) AS n,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM vc
        ), exact AS (
          SELECT event_type,
                 MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END)
                   AS p50_exact_e2,
                 MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END)
                   AS p99_exact_e2
          FROM vcc GROUP BY 1
        )
        SELECT event_type, n, p50_exact_e2, p50_est_e2,
               abs(p50_est_e2 - p50_exact_e2) AS p50_err_e2,
               p99_exact_e2, p99_est_e2,
               abs(p99_est_e2 - p99_exact_e2) AS p99_err_e2
        FROM est JOIN exact USING (event_type)
        ORDER BY event_type
      """)),

    // ---------------------------------------------------------------
    // q151: sketch-merge rollup — the ALGEBRA that makes sketches
    // reusable data artifacts, demonstrated on q146's KMV: per-segment
    // sketches are built ONCE (one corpus pass), then the distinct
    // count of ANY union of segments is answered from the stored
    // sketches alone — here the all-types union, merged by re-sketching
    // the exploded per-segment sketch values (KMV is closed under
    // union: the k smallest of a union of per-set k-smallest IS the
    // union's sketch — a set identity, so the rollup is EXACTLY the
    // sketch a full rescan would build, and the twin can hash-compare
    // it). Rollup cost ∝ #segments·k — independent of corpus size;
    // the exact union distinct is the audit column that drops at
    // scale. This is the warehouse pattern behind sketch columns in
    // summary tables (Druid/BigQuery sketch merges).
    Q("q151_kmv_rollup",
      (s, d) => {
        val k = 64
        val h = conv(substring(md5(concat(lit("kmv:"),
          col("user_id").cast("string"))), 1, 14), 16, 10).cast("bigint")
        val perSeg = Tables.events(s, d)
          .select(col("event_type"), h.as("h"))
          .groupBy(col("event_type"))
          .agg(graft.expressions.KmvAgg.kmv(col("h"), k).as("sk"))
        val merged = perSeg
          .select(explode(col("sk")).as("h"))
          .agg(graft.expressions.KmvAgg.kmv(col("h"), k).as("sk"),
            count(lit(1)).as("n_sketch_rows"))
        val nseg = perSeg.agg(count(lit(1)).as("n_segments"))
        // audit basis = distinct HASH (not distinct user_id), matching
        // q146: the sketch lives in hash domain, so a 56-bit collision
        // must shrink the exact base identically in both audits
        val exact = Tables.events(s, d)
          .select(h.as("h")).distinct()
          .agg(count(lit(1)).as("exact_union"))
        merged.crossJoin(broadcast(nseg)).crossJoin(broadcast(exact))
          .withColumn("est_union",
            when(size(col("sk")) < k, size(col("sk")).cast("bigint"))
              .otherwise(expr(
                s"${(k - 1L) * 72057594037927936L}L div element_at(sk, $k)")))
          .select(col("n_segments"), col("n_sketch_rows"), col("est_union"),
            col("exact_union"),
            expr("abs(est_union - exact_union) * 10000 div exact_union")
              .as("err_e4"))
      },
      Some("""
        WITH h AS (
          SELECT DISTINCT event_type,
                 CAST('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 14)
                   AS BIGINT) AS h
          FROM events
        ), ranked AS (
          SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM h
        ), nseg AS (
          SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_segments,
                 CAST(COUNT(*) AS BIGINT) AS n_sketch_rows
          FROM ranked WHERE rn <= 64
        ), mr AS (
          SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
          FROM (SELECT DISTINCT h FROM ranked WHERE rn <= 64)
        ), msk AS (
          SELECT MAX(CASE WHEN rn = 64 THEN h END) AS h64, COUNT(*) AS n_in
          FROM mr WHERE rn <= 64
        ), exact AS (
          SELECT CAST(COUNT(DISTINCT CAST('0x' ||
                   substring(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 14)
                   AS BIGINT)) AS BIGINT) AS exact_union
          FROM events
        ), est AS (
          SELECT CAST(CASE WHEN n_in < 64 THEN n_in
                      ELSE (63 * 72057594037927936) // h64 END AS BIGINT)
            AS est_union
          FROM msk
        )
        SELECT n_segments, n_sketch_rows, est_union, exact_union,
               CAST(abs(est_union - exact_union) * 10000 // exact_union
                 AS BIGINT) AS err_e4
        FROM nseg, est, exact
      """))
  )
}
