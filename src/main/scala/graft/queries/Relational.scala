package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** The generic relational query surface over the testdata star schema
  * (SURVEY.md §7.2-6): scans with pushdown, hash/broadcast joins,
  * semi/anti joins, partial+final aggregation, window functions, grouping
  * sets, set operations, top-k. Every query here is declarative
  * DataFrame API — Catalyst plans the physical strategy (broadcast under
  * the threshold, SMJ above; AQE re-plans at runtime), which is exactly
  * what survives a 100 TB scale-up: no driver-side collects, no
  * hand-scheduled loops, shuffles only on aggregate/join keys.
  */
object Relational {

  // dec2/e2 (exact decimal view + integer-cents output shaping) are the
  // shared driver-gate helpers — see ColumnOps for the full rationale.
  import graft.functions.ColumnOps.{dec2, e2}
  private def dec4(c: Column): Column = c.cast("decimal(4,2)")

  /** revenue term: l_extendedprice * (1 - l_discount), all exact decimal */
  private def revTerm(price: Column, disc: Column): Column =
    dec2(price) * (lit(1).cast("decimal(3,2)") - dec4(disc))

  private def revE4(price: Column, disc: Column): Column =
    (revTerm(price, disc) * 10000).cast("bigint")

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // q1: TPC-H Q1-shaped pricing summary — partial+final hash agg,
    // exact decimal measures, filter pushed to the parquet scan.
    Q("q1_pricing_summary",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1997-09-01").cast("timestamp"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(e2(col("l_quantity"))).as("sum_qty_e2"),
            sum(e2(col("l_extendedprice"))).as("sum_base_price_e2"),
            sum(revE4(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price_e4"),
            (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qty_e2,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_base_price_e2,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)),

    // ---------------------------------------------------------------
    // q2: top-10 orders by revenue — shuffle agg on l_orderkey then
    // global top-k (TakeOrderedAndProject: no full sort at scale).
    Q("q2_top_orders",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(revE4(col("l_extendedprice"), col("l_discount"))).as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY revenue_e4 DESC, l_orderkey
        LIMIT 10
      """)),

    // ---------------------------------------------------------------
    // q3: orders⋈lineitem fact-fact join + count-distinct — the join key
    // is the shuffle key, no extra exchange after the join.
    Q("q3_priority_count",
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        val li = Tables.lineitem(s, d)
        // "orders with ≥1 lineitem" is a LEFT SEMI join, not an inner
        // join + COUNT DISTINCT: the semi join never multiplies rows, so
        // the aggregate is a plain count — no distinct expand, and the
        // lineitem side ships only its join key through the shuffle.
        o.join(li.select(col("l_orderkey")),
            o("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS order_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """)),

    // ---------------------------------------------------------------
    // q4: dimension join — part is small, so it is explicitly broadcast:
    // the 100 TB fact side never shuffles for this join.
    Q("q4_brand_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            sum(revE4(col("l_extendedprice"), col("l_discount"))).as("revenue_e4"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("p_brand"))
      },
      Some("""
        SELECT p_brand,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand
      """)),

    // ---------------------------------------------------------------
    // q5: star join customer⋈nation⋈region⋈orders — three broadcast
    // dims around the orders fact; one shuffle (the final groupBy).
    Q("q5_region_revenue",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        val o = Tables.orders(s, d)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(e2(col("o_totalprice"))).as("revenue_e2"),
               count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_e2,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
      """)),

    // ---------------------------------------------------------------
    // q6: selective scan — both predicates and the 3-column projection
    // reach the parquet reader (PushedFilters + ReadSchema pruning).
    Q("q6_forecast_revenue",
      (s, d) => {
        Tables.lineitem(s, d)
          .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(sum(dec2(col("l_extendedprice")) * dec4(col("l_discount")))
            .cast("decimal(18,4)").as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      """)),

    // ---------------------------------------------------------------
    // q7: left-semi join (EXISTS) — semi joins ship only the key column
    // of the probe side and short-circuit on first match.
    Q("q7_big_spenders",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey
      """)),

    // ---------------------------------------------------------------
    // q8: left-anti join (NOT EXISTS) — customers who never placed a
    // large order (plain no-orders-at-all is empty on this data).
    Q("q8_no_big_order_customers",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey
      """)),

    // ---------------------------------------------------------------
    // q9: top-3-per-group via ranking window — the standard distributed
    // top-k-per-key shape (one shuffle on the partition key). The
    // tie-break on o_orderkey makes row_number deterministic.
    Q("q9_top_orders_per_customer",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          // o_totalprice is a raw parquet double: emit it untouched —
          // identical bits on both sides, no cast needed at all
          .select(col("o_custkey"), col("o_orderkey"),
                  col("o_totalprice").as("totalprice"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               o_totalprice AS totalprice, rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3
        ORDER BY o_custkey, rn
      """)),

    // ---------------------------------------------------------------
    // q10: running (prefix) aggregate per user over event time — frame
    // ROWS UNBOUNDED PRECEDING..CURRENT, exact decimal accumulation.
    Q("q10_running_user_value",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("running_value_e2", sum(e2(col("value"))).over(w))
          .select(col("user_id"), col("event_id"), col("event_type"),
                  col("running_value_e2"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id, event_type,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS running_value_e2
        FROM events
        ORDER BY user_id, event_id
      """)),

    // ---------------------------------------------------------------
    // q11: ROLLUP hierarchy totals — subtotal levels disambiguated with
    // COALESCE so the output has no NULL grouping keys (stable ordering
    // across engines, whose NULL sort order differs).
    Q("q11_rollup_acctbal",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(sum(e2(col("c_acctbal"))).as("acctbal_e2"),
               count(lit(1)).as("n_customers"))
          .select(
            coalesce(col("r_name"), lit("(all)")).as("region"),
            coalesce(col("n_name"), lit("(all)")).as("nation"),
            col("acctbal_e2"), col("n_customers"))
          .orderBy(col("region"), col("nation"))
      },
      Some("""
        SELECT COALESCE(r_name, '(all)') AS region,
               COALESCE(n_name, '(all)') AS nation,
               CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS acctbal_e2,
               COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region, nation
      """)),

    // ---------------------------------------------------------------
    // q12: CUBE over two independent dimensions.
    Q("q12_cube_segment_status",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .cube(col("c_mktsegment"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
               sum(e2(col("o_totalprice"))).as("total_e2"))
          .select(
            coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
            coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
            col("n_orders"), col("total_e2"))
          .orderBy(col("segment"), col("status"))
      },
      Some("""
        SELECT COALESCE(c_mktsegment, '(all)') AS segment,
               COALESCE(o_orderstatus, '(all)') AS status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_e2
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY CUBE (c_mktsegment, o_orderstatus)
        ORDER BY segment, status
      """))
  )
}
