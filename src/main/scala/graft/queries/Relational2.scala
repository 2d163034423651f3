package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Second tranche of the generic relational surface: set operations,
  * scalar function families (string / date / json / array), analytic
  * windows (lag/lead/ntile), subquery shapes, string aggregation,
  * histograms, approximate distinct. Same determinism contract as
  * [[Relational]] (see Q.scala).
  */
object Relational2 {

  // shared driver-gate output-shaping helpers — rationale in ColumnOps
  import graft.functions.ColumnOps.{dec2, e2}

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // q13: set operations — INTERSECT / EXCEPT / UNION DISTINCT of the
    // nation-key sets reachable from customers vs suppliers, tagged and
    // stacked so one result exercises all three.
    Q("q13_setops",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
        val both = c.intersect(sup).withColumn("op", lit("intersect"))
        val custOnly = c.except(sup).withColumn("op", lit("except"))
        val either = c.union(sup).distinct().withColumn("op", lit("union"))
        both.union(custOnly).union(either)
          .select(col("op"), col("nationkey"))
          .orderBy(col("op"), col("nationkey"))
      },
      Some("""
        SELECT op, nationkey FROM (
          SELECT 'intersect' AS op, nationkey FROM
            (SELECT c_nationkey AS nationkey FROM customer
             INTERSECT SELECT s_nationkey FROM supplier)
          UNION ALL
          SELECT 'except' AS op, nationkey FROM
            (SELECT c_nationkey AS nationkey FROM customer
             EXCEPT SELECT s_nationkey FROM supplier)
          UNION ALL
          SELECT 'union' AS op, nationkey FROM
            (SELECT c_nationkey AS nationkey FROM customer
             UNION SELECT s_nationkey FROM supplier)
        ) ORDER BY op, nationkey
      """)),

    // ---------------------------------------------------------------
    // q14: multi-distinct aggregation (two COUNT(DISTINCT) in one agg —
    // Spark plans an expand + two-phase agg).
    Q("q14_distinct_parts_suppliers",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_suppliers"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """)),

    // ---------------------------------------------------------------
    // q15: scalar string function family over part.
    Q("q15_string_funcs",
      (s, d) => {
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            length(col("p_name")).as("name_len"),
            substring(col("p_type"), 1, 5).as("type_prefix"),
            regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
            regexp_replace(col("p_name"), " ", "_").as("name_snake"),
            concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
            lpad(col("p_size").cast("string"), 3, "0").as("size_padded"),
            split_part(col("p_type"), lit(" "), lit(1)).as("type_word1"),
            trim(col("p_name")).as("name_trim"),
            col("p_name").contains("blue").cast("int").as("has_blue"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LENGTH(p_name) AS name_len,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               REGEXP_EXTRACT(p_brand, '(\d+)', 1) AS brand_num,
               REPLACE(p_name, ' ', '_') AS name_snake,
               CONCAT_WS('-', p_brand, p_type) AS brand_type,
               LPAD(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
               SPLIT_PART(p_type, ' ', 1) AS type_word1,
               TRIM(p_name) AS name_trim,
               CAST(CONTAINS(p_name, 'blue') AS INT) AS has_blue
        FROM part ORDER BY p_partkey
      """)),

    // ---------------------------------------------------------------
    // q16: date/time function family over orders, grouped by month.
    Q("q16_date_funcs",
      (s, d) => {
        Tables.orders(s, d)
          .select(
            date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            year(col("o_orderdate")).as("yr"),
            quarter(col("o_orderdate")).as("qtr"),
            dayofmonth(col("o_orderdate")).as("dom"),
            datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"),
            col("o_totalprice"))
          .groupBy(col("month"), col("yr"), col("qtr"))
          .agg(count(lit(1)).as("n_orders"),
               min(col("dom")).as("min_dom"),
               max(col("days_to_98")).as("max_days_to_98"),
               sum(e2(col("o_totalprice"))).as("total_e2"))
          .orderBy(col("month"))
      },
      Some("""
        SELECT STRFTIME(o_orderdate, '%Y-%m') AS month,
               YEAR(o_orderdate) AS yr,
               QUARTER(o_orderdate) AS qtr,
               COUNT(*) AS n_orders,
               MIN(DAY(o_orderdate)) AS min_dom,
               MAX(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')) AS max_days_to_98,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_e2
        FROM orders
        GROUP BY STRFTIME(o_orderdate, '%Y-%m'), YEAR(o_orderdate), QUARTER(o_orderdate)
        ORDER BY month
      """)),

    // ---------------------------------------------------------------
    // q17: conditional aggregation (the receipt-pivot A1 shape,
    // SURVEY.md §2.4, generalized): one column per event_type.
    Q("q17_conditional_agg",
      (s, d) => {
        val e = Tables.events(s, d)
        e.groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "purchase", e2(col("value")))
              .otherwise(lit(0L))).as("purchase_value_e2"),
            count(when(col("event_type") === "click", lit(1))).as("n_clicks"),
            count(when(col("event_type") === "error", lit(1))).as("n_errors"),
            max(when(col("event_type") === "view", e2(col("value")))).as("max_view_value_e2"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_value_e2,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
               CAST(MAX(CASE WHEN event_type = 'view' THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS max_view_value_e2
        FROM events GROUP BY user_id ORDER BY user_id
      """)),

    // ---------------------------------------------------------------
    // q18: JSON extraction from a string column (events.props).
    Q("q18_json_extract",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"),
               count(col("k")).as("n_k"),
               min(col("k")).as("min_k"),
               max(col("k")).as("max_k"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n_k, MIN(k) AS min_k, MAX(k) AS max_k
        FROM (SELECT event_type,
                     CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k
              FROM events)
        GROUP BY event_type ORDER BY event_type
      """)),

    // ---------------------------------------------------------------
    // q19: array/list operations over the embedding column. Element
    // values are emitted as floor(x*1e4) bigints (identical doubles in
    // both engines, and float32 cells would hash differently across the
    // driver's two pandas load paths); the sliced array is emitted as a
    // comma-joined string — complex-typed cells crash the driver's
    // row-sort (unhashable ndarray).
    Q("q19_array_ops",
      (s, d) => {
        def e4(c: Column): Column = floor(c.cast("double") * 10000)
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            e4(element_at(col("embedding"), 1)).as("first_e4"),
            e4(element_at(col("embedding"), -1)).as("last_e4"),
            array_join(transform(slice(col("embedding"), 1, 3),
              x => e4(x).cast("string")), ",").as("head3_e4"),
            col("label"))
          .orderBy(col("vec_id"))
      },
      Some("""
        SELECT vec_id,
               LEN(embedding) AS dim,
               CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT) AS first_e4,
               CAST(FLOOR(CAST(embedding[-1] AS DOUBLE) * 10000) AS BIGINT) AS last_e4,
               ARRAY_TO_STRING(LIST_TRANSFORM(embedding[1:3],
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)), ',') AS head3_e4,
               label
        FROM embeddings ORDER BY vec_id
      """)),

    // ---------------------------------------------------------------
    // q20: analytic window functions — lag/lead/first_value per user in
    // event-time order.
    Q("q20_window_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(
            col("user_id"), col("event_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            first(col("event_type")).over(w).as("first_type"),
            row_number().over(w).as("seq"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id, value,
               LAG(value, 1) OVER w AS prev_value,
               LEAD(value, 1) OVER w AS next_value,
               FIRST_VALUE(event_type) OVER w AS first_type,
               ROW_NUMBER() OVER w AS seq
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id
      """)),

    // ---------------------------------------------------------------
    // q21: argmax-per-group — richest customer per nation (deterministic
    // tie-break on custkey). Max-by-struct aggregate: partial aggregation
    // combines map-side, so the 25-key group never concentrates sorted
    // partitions the way a row_number window would — at 100× the scan
    // grows but the shuffle stays 25 rows per mapper.
    Q("q21_argmax_customer",
      (s, d) => {
        // (acctbal, -custkey) max == (acctbal DESC, custkey ASC) first;
        // the key pair is unique per row, so trailing fields never
        // participate in the comparison.
        val best = Tables.customer(s, d)
          .groupBy(col("c_nationkey"))
          .agg(max(struct(
            col("c_acctbal").as("bal"),
            (-col("c_custkey")).as("negkey"),
            col("c_name").as("name"))).as("best"))
          .select(col("c_nationkey"),
            (-col("best.negkey")).as("c_custkey"),
            col("best.name").as("c_name"),
            col("best.bal").as("c_acctbal"))
        val n = Tables.nation(s, d)
        best.join(broadcast(n), best("c_nationkey") === n("n_nationkey"))
          // c_acctbal is a raw parquet double — emit it untouched
          .select(col("n_name"), col("c_custkey"), col("c_name"),
                  col("c_acctbal").as("acctbal"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name, c_custkey, c_name, c_acctbal AS acctbal
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                           ORDER BY c_acctbal DESC, c_custkey) AS rn
              FROM customer) c
        JOIN nation ON c_nationkey = n_nationkey
        WHERE rn = 1
        ORDER BY n_name
      """)),

    // ---------------------------------------------------------------
    // q22: uncorrelated scalar subquery — customers above the global
    // average balance (exact-decimal average on both sides).
    Q("q22_above_avg_balance",
      (s, d) => {
        val c = Tables.customer(s, d)
        val avgBal = c.agg(
          (sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .select(col("c_custkey"), col("c_name"), col("c_acctbal").as("acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer)
        ORDER BY c_custkey
      """)),

    // ---------------------------------------------------------------
    // q23: correlated-subquery shape — orders larger than their own
    // customer's average (expressed as a window, one shuffle).
    Q("q23_above_customer_avg",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
        Tables.orders(s, d)
          .withColumn("cust_avg",
            sum(dec2(col("o_totalprice"))).over(w).cast("double") / count(lit(1)).over(w))
          .filter(col("o_totalprice") > col("cust_avg"))
          .select(col("o_custkey"), col("o_orderkey"),
                  col("o_totalprice").as("totalprice"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice AS totalprice
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
                       / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
              FROM orders)
        WHERE o_totalprice > cust_avg
        ORDER BY o_custkey, o_orderkey
      """)),

    // ---------------------------------------------------------------
    // q24: histogram — fixed-width bucketing of a continuous measure.
    Q("q24_value_histogram",
      (s, d) => {
        Tables.events(s, d)
          .select(floor(col("value") / 50).cast("int").as("bucket"), col("value"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
               sum(e2(col("value"))).as("bucket_sum_e2"))
          .orderBy(col("bucket"))
      },
      Some("""
        SELECT CAST(FLOOR(value / 50) AS INT) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS bucket_sum_e2
        FROM events GROUP BY bucket ORDER BY bucket
      """)),

    // ---------------------------------------------------------------
    // q25: ordered string aggregation — supplier roster per nation.
    // collect_list order is nondeterministic under parallelism, so the
    // list is sorted before joining (same result as DuckDB's ORDER BY).
    Q("q25_string_agg",
      (s, d) => {
        val sup = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("suppliers"),
               count(lit(1)).as("n_suppliers"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name,
               STRING_AGG(s_name, ',' ORDER BY s_name) AS suppliers,
               COUNT(*) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
      """)),

    // ---------------------------------------------------------------
    // q26: UNION ALL across heterogeneous tables into one entity count.
    Q("q26_entity_union",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_nationkey").cast("int").as("nationkey"), lit("customer").as("kind"))
        val sup = Tables.supplier(s, d)
          .select(col("s_nationkey").cast("int").as("nationkey"), lit("supplier").as("kind"))
        c.union(sup)
          .groupBy(col("nationkey"), col("kind"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("nationkey"), col("kind"))
      },
      Some("""
        SELECT nationkey, kind, COUNT(*) AS n FROM (
          SELECT CAST(c_nationkey AS INT) AS nationkey, 'customer' AS kind FROM customer
          UNION ALL
          SELECT CAST(s_nationkey AS INT) AS nationkey, 'supplier' AS kind FROM supplier
        ) GROUP BY nationkey, kind ORDER BY nationkey, kind
      """)),

    // ---------------------------------------------------------------
    // q27: IN-subquery (semi-join on a filtered, deduplicated build side).
    Q("q27_parts_in_bulk_orders",
      (s, d) => {
        val p = Tables.part(s, d)
        val bulk = Tables.lineitem(s, d)
          .filter(col("l_quantity") >= 49).select(col("l_partkey"))
        p.join(bulk, p("p_partkey") === bulk("l_partkey"), "left_semi")
          .select(col("p_partkey"), col("p_name"), col("p_size"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey, p_name, p_size
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        ORDER BY p_partkey
      """)),

    // ---------------------------------------------------------------
    // q28: ntile quartiles over a global order — two-phase exact ntile
    // (range repartition + local sort + broadcast offsets, see
    // GlobalRank) instead of a single-partition Window.orderBy; same
    // bucket assignment as NTILE(4), no one-task sort of the table.
    Q("q28_price_quartiles",
      (s, d) => {
        // project BEFORE the two-phase ntile: GlobalRank persists its
        // range-sorted input, which is a pruning barrier — without
        // this, the whole 9-column orders row (o_comment included)
        // rides the range shuffle and the cache for a 2-column query
        graft.operators.GlobalRank.ntile(
            Tables.orders(s, d).select(col("o_totalprice"), col("o_orderkey")), 4,
            Seq(col("o_totalprice"), col("o_orderkey")), "quartile")
          .groupBy(col("quartile"))
          .agg(count(lit(1)).as("n"),
               min(col("o_totalprice")).as("min_price"),
               max(col("o_totalprice")).as("max_price"))
          .orderBy(col("quartile"))
      },
      Some("""
        SELECT quartile, COUNT(*) AS n,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM (SELECT o_totalprice,
                     NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
              FROM orders)
        GROUP BY quartile ORDER BY quartile
      """)),

    // ---------------------------------------------------------------
    // q29: GROUPING SETS (beyond rollup/cube): independent subtotal sets.
    Q("q29_grouping_sets",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .createOrReplaceTempView("q29_cn")
        s.sql("""
          SELECT COALESCE(n_name, '(all)') AS nation,
                 COALESCE(c_mktsegment, '(all)') AS segment,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS acctbal_e2
          FROM q29_cn
          GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
          ORDER BY nation, segment
        """)
      },
      Some("""
        SELECT COALESCE(n_name, '(all)') AS nation,
               COALESCE(c_mktsegment, '(all)') AS segment,
               COUNT(*) AS n,
               CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS acctbal_e2
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        ORDER BY nation, segment
      """)),

    // ---------------------------------------------------------------
    // q30: approximate distinct (HyperLogLog++) next to the exact count.
    // The raw estimates are sketch-specific (DuckDB's
    // approx_count_distinct is a different HLL), so the registered
    // output emits the exact count plus the sketch's 5%-tolerance flag:
    // each engine checks ITS OWN estimate against the shared exact
    // ground truth, and the driver hash-checks that both sketches honor
    // the bound (rsd=0.02 makes 5% a >2σ margin). The raw-estimate
    // error bound stays pinned numerically in RowsOnlySpec.
    Q("q30_approx_distinct",
      (s, d) => {
        // The sketch and the exact count are computed in SEPARATE
        // aggregations on purpose: mixing countDistinct with
        // approx_count_distinct makes Spark's distinct rewrite key the
        // FIRST-level aggregate by (flag, orderkey) while carrying the
        // partial HLL buffer — ~3 KB at rsd=0.02 — on every one of the
        // ~N_distinct groups (observed ~1 GB of aggregation buffer at
        // sf0.1, spill-prone and memory-sensitive). Split, the HLL
        // buffers exist only per FLAG group, the exact path is a plain
        // two-level distinct, and the 3-row join is broadcast. Two
        // scans of a 2-column pruned parquet are noise by comparison.
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_orderkey"))
        val exact = li.distinct()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("exact_orders"))
        val approx = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
        exact.join(broadcast(approx), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_orders"),
            (abs(col("approx") - col("exact_orders"))
              <= col("exact_orders") * 0.05).cast("int").as("approx_within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS exact_orders,
               CAST(abs(approx_count_distinct(l_orderkey)
                        - COUNT(DISTINCT l_orderkey))
                    <= COUNT(DISTINCT l_orderkey) * 0.05 AS INT)
                 AS approx_within_5pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """)),

    // ---------------------------------------------------------------
    // q124: pareto frontier (2-D skyline) — the parts no other part
    // strictly dominates on (cheaper price, larger size): b dominates a
    // iff b.price ≤ a.price ∧ b.size ≥ a.size with one inequality
    // strict. The naive form is an all-pairs NOT EXISTS (the oracle, n²
    // — fine for DuckDB at sf0.01, fatal at 100 TB). Scale shape: parts
    // compress to one row per DISTINCT price (pmax = best size at that
    // price), then GlobalRank.withGlobalStrictCumMax computes each
    // price's best-size-among-strictly-cheaper via the two-phase
    // range-partitioned prefix max — no task ever windows over more
    // than one range partition, at any price cardinality. A price is a
    // frontier price iff pmax beats that strict prefix (ties lose:
    // an equal size at a cheaper price dominates); a part is on the
    // frontier iff it carries its price's pmax at a frontier price —
    // equal (price, size) duplicates all survive, matching the
    // dominance definition. Prices are compared in exact e2 cents on
    // both engines.
    Q("q124_pareto_frontier",
      (s, d) => {
        import graft.operators.GlobalRank
        val p = Tables.part(s, d)
          .select(col("p_partkey"), e2(col("p_retailprice")).as("price_e2"),
                  col("p_size"))
        val perPrice = p.groupBy(col("price_e2"))
          .agg(max(col("p_size")).as("pmax"))
        val frontierPrices = GlobalRank.withGlobalStrictCumMax(
            perPrice, Seq(col("price_e2")), col("pmax").cast("long"), "best_cheaper")
          .filter(col("best_cheaper").isNull || col("pmax") > col("best_cheaper"))
          .select(col("price_e2"), col("pmax"))
        p.join(frontierPrices, Seq("price_e2"))
          .filter(col("p_size") === col("pmax"))
          .select(col("p_partkey"), col("price_e2"), col("p_size"))
          .orderBy(col("price_e2"), col("p_partkey"))
      },
      Some("""
        WITH p AS (
          SELECT p_partkey,
                 CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price_e2,
                 p_size
          FROM part
        )
        SELECT p_partkey, price_e2, p_size FROM p a
        WHERE NOT EXISTS (
          SELECT 1 FROM p b
          WHERE b.price_e2 <= a.price_e2 AND b.p_size >= a.p_size
            AND (b.price_e2 < a.price_e2 OR b.p_size > a.p_size))
        ORDER BY price_e2, p_partkey
      """)),

    // ---------------------------------------------------------------
    // q130: pivot / cross-tab — the wide reshape (`groupBy().pivot()`)
    // the rollup/cube family (q11/q12/q29) doesn't cover: documents
    // counted source × language with languages AS COLUMNS. The pivot
    // value list is EXPLICIT — the scale contract: without it Spark
    // first runs a distinct scan over the pivot column AND the output
    // schema becomes data-dependent (a driver-side collect of
    // unbounded width); with it the reshape is one ordinary hash
    // aggregate producing 5 conditional counts. Missing combinations
    // land as 0, not null (na.fill — the cross-tab convention, and it
    // keeps both engines' hash types identical).
    Q("q130_pivot_source_lang",
      (s, d) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        Tables.documents(s, d)
          .groupBy(col("source"))
          .pivot("lang", langs)
          .agg(count(lit(1)))
          .na.fill(0L, langs)
          .orderBy(col("source"))
      },
      Some("""
        SELECT source,
               CAST(COALESCE(SUM(CASE WHEN lang = 'de' THEN 1 END), 0) AS BIGINT) AS de,
               CAST(COALESCE(SUM(CASE WHEN lang = 'en' THEN 1 END), 0) AS BIGINT) AS en,
               CAST(COALESCE(SUM(CASE WHEN lang = 'es' THEN 1 END), 0) AS BIGINT) AS es,
               CAST(COALESCE(SUM(CASE WHEN lang = 'fr' THEN 1 END), 0) AS BIGINT) AS fr,
               CAST(COALESCE(SUM(CASE WHEN lang = 'zh' THEN 1 END), 0) AS BIGINT) AS zh
        FROM documents GROUP BY source ORDER BY source
      """)),

    // ---------------------------------------------------------------
    // q134: unpivot / melt — the inverse reshape of q130: per-flag
    // lineitem measures (count, total qty, total price) melted from
    // columns into (measure, value) rows via `stack()`. Stack is a
    // GENERATOR (one codegen'd pass, fan-out = #measures per row), not
    // a union of re-scans — the aggregate runs once and the melt costs
    // #groups·#measures rows, which is why melting AFTER the reduce is
    // the scale order (melting raw rows first would triple the shuffle
    // volume for identical output). Values share one bigint domain
    // (counts, e0 qty, e2 cents) — the long-format contract.
    Q("q134_unpivot_measures",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("long")).as("qty_total"),
            sum(e2(col("l_extendedprice"))).as("price_e2_total"))
          .selectExpr("l_returnflag",
            """stack(3, 'n_items', n_items, 'qty_total', qty_total,
                     'price_e2_total', price_e2_total) AS (measure, value)""")
          .orderBy(col("l_returnflag"), col("measure"))
      },
      Some("""
        WITH a AS (
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total,
                 CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS BIGINT) AS price_e2_total
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, measure, value FROM (
          SELECT l_returnflag, 'n_items' AS measure, n_items AS value FROM a
          UNION ALL
          SELECT l_returnflag, 'qty_total', qty_total FROM a
          UNION ALL
          SELECT l_returnflag, 'price_e2_total', price_e2_total FROM a)
        ORDER BY l_returnflag, measure
      """))
  )
}
