package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.ColumnOps.let

/** Corpus-curation operators a production training-data pipeline runs
  * around the cleaning/dedup core: rule-based quality gating with
  * per-document failure reasons (the Gopher/C4 filter pattern),
  * right-to-be-forgotten purge propagation across linked tables, and a
  * one-scan data-quality profile (the Deequ/metrics-gate pattern that
  * decides whether a snapshot is fit to train on).
  *
  * All three are scan-shaped or broadcast-anti-join-shaped: at 100 TB
  * the gate and the profile cost exactly one pass over the corpus and
  * the purge costs one broadcast of the (small) deletion list per
  * downstream table — no corpus shuffle anywhere.
  */
object CurationQueries {

  /** Rule names shared between the Spark gate and its DuckDB twin. */
  private val StopSample = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  // ---- shared rule-gate / classifier core (q75 · q82 · q102 · q105) —
  // the thresholds, the per-doc feature scan, the gate predicate and
  // the classifier score each exist ONCE (with one DuckDB twin each),
  // so a threshold or coefficient change cannot desynchronize queries
  // that claim to share semantics (q102 calibrates q82 against q75;
  // q105's quality stage IS q75's gate).
  private val MinTok = 20L
  private val MaxTok = 2000L
  private val MinLenX = 2L
  private val MaxLenX = 12L
  private val PunctFactor = 5L
  private val ScoreCut = 600L

  /** Exact integer division: (a - a mod b) / b — the subtraction makes
    * the numerator an exact multiple, so the double divide is exact
    * (both engines; positive operands only). */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** One-scan per-doc integer features + content digest: doc_id,
    * source, h, n_tok, len_sum, n_stop, punct, n_chars. Columns a
    * caller doesn't use prune away at the parquet scan. */
  private def gateFeatures(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("source"), col("text"),
        let(graft.text.TextAnalysis.tokens(col("text"))) { ts =>
          struct(size(ts).cast("long").as("n_tok"),
            aggregate(transform(ts, t => length(t).cast("long")),
              lit(0L), (a, l) => a + l).as("len_sum"),
            size(filter(ts, t => t.isin(StopSample: _*)))
              .cast("long").as("n_stop"))
        }.as("f"),
        md5(lower(trim(col("text")))).as("h"))
      .select(col("doc_id"), col("source"), col("h"),
        col("f.n_tok").as("n_tok"), col("f.len_sum").as("len_sum"),
        col("f.n_stop").as("n_stop"),
        regexp_count(col("text"), lit("[^\\w\\s]")).cast("long").as("punct"),
        length(col("text")).cast("long").as("n_chars"))

  /** The rule-gate predicate over [[gateFeatures]] columns. */
  private def ruleKeep: Column =
    col("n_tok") >= MinTok && col("n_tok") <= MaxTok &&
      col("len_sum") >= col("n_tok") * MinLenX &&
      col("len_sum") <= col("n_tok") * MaxLenX &&
      col("punct") * PunctFactor < col("n_chars") && col("n_stop") > 0

  /** q82's linear classifier score over [[gateFeatures]] columns —
    * exact integer domain (per-mille rates via [[idiv]]). */
  private def classifierScore: Column =
    lit(10L) * col("n_tok") +
      lit(5L) * idiv(col("n_stop") * 1000L, col("n_tok")) -
      lit(2L) * abs(idiv(col("len_sum") * 1000L, col("n_tok")) - 4500L)

  /** DuckDB twin of [[gateFeatures]]: a complete CTE body over
    * `documents`; embed as `m AS ($gateFeaturesSql)`. */
  private def gateFeaturesSql: String =
    s"""SELECT doc_id, source,
       |                 CAST(len(ts) AS BIGINT) AS n_tok,
       |                 CAST(list_sum(list_transform(ts, x -> len(x))) AS BIGINT) AS len_sum,
       |                 CAST(len(list_filter(ts,
       |                   x -> x IN (${StopSample.map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS n_stop,
       |                 CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS punct,
       |                 CAST(len(text) AS BIGINT) AS n_chars,
       |                 md5(lower(trim(text))) AS h
       |          FROM (SELECT doc_id, source, text, ${OracleSql.DTokens} AS ts
       |                FROM documents)""".stripMargin

  /** DuckDB twin of [[ruleKeep]]. */
  private def ruleKeepSql: String =
    s"n_tok >= $MinTok AND n_tok <= $MaxTok" +
      s" AND len_sum >= n_tok * $MinLenX AND len_sum <= n_tok * $MaxLenX" +
      s" AND punct * $PunctFactor < n_chars AND n_stop > 0"

  /** DuckDB twin of [[classifierScore]]. */
  private def classifierScoreSql: String =
    "10 * n_tok + 5 * ((n_stop * 1000) // n_tok)" +
      " - 2 * abs(((len_sum * 1000) // n_tok) - 4500)"

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // q75: composite quality gate with reasons — every rule evaluates
    // per document in one projection (no shuffle; the orderBy is only
    // the registered-output determinism contract). Thresholds compare
    // in the integer domain (len_sum vs k*n_tok, 5*punct vs n_chars)
    // so the gate is bit-reproducible across engines — no ratio
    // doubles anywhere. A kept doc carries reasons = ''; a dropped doc
    // lists every rule it failed (the audit trail curation teams keep).
    Q("q75_quality_gate",
      (s, d) => {
        val fails = array(
          when(col("n_tok") < MinTok, lit("too_short")),
          when(col("n_tok") > MaxTok, lit("too_long")),
          when(col("len_sum") < col("n_tok") * MinLenX
            || col("len_sum") > col("n_tok") * MaxLenX, lit("word_len")),
          when(col("punct") * PunctFactor >= col("n_chars"),
            lit("symbol_soup")),
          when(col("n_stop") === 0, lit("no_stopwords")))
        gateFeatures(s, d)
          .select(col("doc_id"), col("n_tok"),
            concat_ws(",", filter(fails, f => f.isNotNull)).as("reasons"))
          .select(col("doc_id"), col("n_tok"),
            when(col("reasons") === "", lit(1L)).otherwise(lit(0L)).as("keep"),
            col("reasons"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH m AS (
          $gateFeaturesSql
        ), r AS (
          SELECT doc_id, n_tok,
                 COALESCE(array_to_string(list_filter([
                   CASE WHEN n_tok < $MinTok THEN 'too_short' END,
                   CASE WHEN n_tok > $MaxTok THEN 'too_long' END,
                   CASE WHEN len_sum < n_tok * $MinLenX
                          OR len_sum > n_tok * $MaxLenX THEN 'word_len' END,
                   CASE WHEN punct * $PunctFactor >= n_chars THEN 'symbol_soup' END,
                   CASE WHEN n_stop = 0 THEN 'no_stopwords' END
                 ], x -> x IS NOT NULL), ','), '') AS reasons
          FROM m
        )
        SELECT doc_id, n_tok,
               CASE WHEN reasons = '' THEN 1 ELSE 0 END AS keep, reasons
        FROM r ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q82: quality-classifier scoring — the learned-gate companion to
    // q75's rule gate: a linear model over handcrafted per-document
    // features (the fasttext/logistic-regression pattern corpus teams
    // train on labeled quality judgments), applied map-side in one
    // scan. Weights here are fixed constants — training is offline;
    // what the ENGINE owns is exact, scalable scoring — and every
    // feature is integer-domain (per-mille rates via exact integer
    // division, never a double ratio), so score and label are
    // bit-reproducible cross-engine. At 100 TB: one scan, no shuffle
    // except the output ordering contract.
    Q("q82_quality_classifier",
      (s, d) => {
        gateFeatures(s, d)
          .select(col("doc_id"), col("n_tok"),
            idiv(col("n_stop") * 1000L, col("n_tok")).as("stop_pm"),
            classifierScore.as("score"))
          .select(col("doc_id"), col("n_tok"), col("stop_pm"), col("score"),
            (col("score") >= ScoreCut).cast("int").as("label"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH m AS (
          $gateFeaturesSql
        ), sc AS (
          SELECT doc_id, n_tok,
                 (n_stop * 1000) // n_tok AS stop_pm,
                 $classifierScoreSql AS score
          FROM m
        )
        SELECT doc_id, n_tok, stop_pm, score,
               CAST(score >= $ScoreCut AS INT) AS label
        FROM sc ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q76: purge propagation (right-to-be-forgotten / takedown): a
    // small deletion list (doc_id % 97 = 0 stands in for the request
    // table) is BROADCAST and anti-joined against every table keyed by
    // the same identity — documents and the 1:1-linked embeddings —
    // so each downstream table pays one map-side anti-join, never a
    // corpus shuffle. Output: post-purge group counts per table, the
    // audit a deletion pipeline must produce.
    Q("q76_purge_cascade",
      (s, d) => {
        val purge = broadcast(
          Tables.documents(s, d).filter(col("doc_id") % 97 === 0)
            .select(col("doc_id").as("pid")))
        val docsAfter = Tables.documents(s, d)
          .join(purge, col("doc_id") === col("pid"), "left_anti")
          .groupBy(col("source").as("grp"))
          .agg(count(lit(1)).as("n"))
          .select(lit("documents").as("tbl"), col("grp"), col("n"))
        val embAfter = Tables.embeddings(s, d)
          .join(purge, col("vec_id") === col("pid"), "left_anti")
          .groupBy(col("label").cast("string").as("grp"))
          .agg(count(lit(1)).as("n"))
          .select(lit("embeddings").as("tbl"), col("grp"), col("n"))
        docsAfter.unionAll(embAfter).orderBy(col("tbl"), col("grp"))
      },
      Some("""
        WITH purge AS (SELECT doc_id AS pid FROM documents WHERE doc_id % 97 = 0),
        a AS (
          SELECT 'documents' AS tbl, source AS grp, COUNT(*) AS n
          FROM documents WHERE doc_id NOT IN (SELECT pid FROM purge)
          GROUP BY source
          UNION ALL
          SELECT 'embeddings', CAST(label AS VARCHAR), COUNT(*)
          FROM embeddings WHERE vec_id NOT IN (SELECT pid FROM purge)
          GROUP BY label
        )
        SELECT tbl, grp, n FROM a ORDER BY tbl, grp
      """)),

    // ---------------------------------------------------------------
    // q84: snapshot diff — the dataset-versioning primitive: compare
    // two corpus snapshots by (doc_id, content hash) and classify every
    // document added / removed / changed / unchanged — what an
    // incremental pipeline consumes to reprocess ONLY the delta, and
    // what an audit needs to explain a training set across releases.
    // The "old" snapshot is derived deterministically from the fixture
    // corpus (one-in-11 docs absent = later additions; one-in-13
    // carry a different content hash = edits) so both engines can
    // reconstruct it exactly. Scale shape: ONE full-outer join keyed
    // by doc_id (bucketed layout in production makes it shuffle-free);
    // content equality compares 32-char digests, never full text.
    Q("q84_snapshot_diff",
      (s, d) => {
        // one-in-17 absent from NEW = removals, so all four statuses occur
        val newSnap = Tables.documents(s, d)
          .filter(col("doc_id") % 17 =!= 16)
          .select(col("doc_id"), md5(col("text")).as("h"))
        val oldSnap = Tables.documents(s, d)
          .filter(col("doc_id") % 11 =!= 10)
          .select(col("doc_id"),
            when(col("doc_id") % 13 === 0, md5(concat(col("text"), lit(":prev"))))
              .otherwise(md5(col("text"))).as("h"))
        oldSnap.as("o")
          .join(newSnap.as("n"), col("o.doc_id") === col("n.doc_id"), "full_outer")
          .select(
            coalesce(col("n.doc_id"), col("o.doc_id")).as("doc_id"),
            when(col("o.doc_id").isNull, "added")
              .when(col("n.doc_id").isNull, "removed")
              .when(col("o.h") =!= col("n.h"), "changed")
              .otherwise("unchanged").as("status"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH n AS (SELECT doc_id, md5(text) AS h FROM documents
                   WHERE doc_id % 17 <> 16),
        o AS (SELECT doc_id,
                     CASE WHEN doc_id % 13 = 0 THEN md5(text || ':prev')
                          ELSE md5(text) END AS h
              FROM documents WHERE doc_id % 11 <> 10)
        SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.h <> n.h THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q77: data-quality profile — the metrics gate a pipeline computes
    // over every snapshot before training on it (Deequ/Great-
    // Expectations family): per-column completeness (null count),
    // exact cardinality, numeric min/max, and a domain-conformity
    // count, all from ONE wide aggregate over the table (the
    // count_distinct columns share the single Expand-based aggregate;
    // no per-metric rescans), then unpivoted to (metric, col, value)
    // rows via stack. Doubles enter the integer domain (floor*100)
    // before emission.
    Q("q77_dq_profile",
      (s, d) => {
        val o = Tables.orders(s, d)
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderpriority")
        val aggs =
          cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c")) ++
          cols.map(c => count_distinct(col(c)).as(s"dist_$c")) ++
          Seq(min(col("o_orderkey")).as("min_o_orderkey"),
            max(col("o_orderkey")).as("max_o_orderkey"),
            min(col("o_custkey")).as("min_o_custkey"),
            max(col("o_custkey")).as("max_o_custkey"),
            min(floor(col("o_totalprice") * 100).cast("long")).as("min_o_totalprice"),
            max(floor(col("o_totalprice") * 100).cast("long")).as("max_o_totalprice"),
            sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
              .as("conform_o_orderstatus"))
        val wide = o.agg(aggs.head, aggs.tail: _*)
        val pairs = (cols.map(c => ("null_count", c)) ++
          cols.map(c => ("distinct_count", c)) ++
          Seq(("min", "o_orderkey"), ("max", "o_orderkey"),
            ("min", "o_custkey"), ("max", "o_custkey"),
            ("min", "o_totalprice"), ("max", "o_totalprice"),
            ("nonconforming", "o_orderstatus")))
        val srcCol = Map("null_count" -> "null_", "distinct_count" -> "dist_",
          "min" -> "min_", "max" -> "max_", "nonconforming" -> "conform_")
        val stackArgs = pairs.map { case (m, c) =>
          s"'$m', '$c', cast(${srcCol(m) + c} as bigint)"
        }.mkString(", ")
        wide.selectExpr(
            s"stack(${pairs.size}, $stackArgs) as (metric, col, value)")
          .orderBy(col("metric"), col("col"))
      },
      Some("""
        SELECT metric, col, value FROM (
          SELECT 'null_count' AS metric, 'o_orderkey' AS col,
                 CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS value FROM orders
          UNION ALL SELECT 'null_count', 'o_custkey',
                 CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) FROM orders
          UNION ALL SELECT 'null_count', 'o_orderstatus',
                 CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) FROM orders
          UNION ALL SELECT 'null_count', 'o_totalprice',
                 CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) FROM orders
          UNION ALL SELECT 'null_count', 'o_orderpriority',
                 CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT) FROM orders
          UNION ALL SELECT 'distinct_count', 'o_orderkey',
                 CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
          UNION ALL SELECT 'distinct_count', 'o_custkey',
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
          UNION ALL SELECT 'distinct_count', 'o_orderstatus',
                 CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
          UNION ALL SELECT 'distinct_count', 'o_totalprice',
                 CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
          UNION ALL SELECT 'distinct_count', 'o_orderpriority',
                 CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
          UNION ALL SELECT 'min', 'o_orderkey',
                 CAST(MIN(o_orderkey) AS BIGINT) FROM orders
          UNION ALL SELECT 'max', 'o_orderkey',
                 CAST(MAX(o_orderkey) AS BIGINT) FROM orders
          UNION ALL SELECT 'min', 'o_custkey',
                 CAST(MIN(o_custkey) AS BIGINT) FROM orders
          UNION ALL SELECT 'max', 'o_custkey',
                 CAST(MAX(o_custkey) AS BIGINT) FROM orders
          UNION ALL SELECT 'min', 'o_totalprice',
                 CAST(MIN(floor(o_totalprice * 100)) AS BIGINT) FROM orders
          UNION ALL SELECT 'max', 'o_totalprice',
                 CAST(MAX(floor(o_totalprice * 100)) AS BIGINT) FROM orders
          UNION ALL SELECT 'nonconforming', 'o_orderstatus',
                 CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                               THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        ) ORDER BY metric, col
      """)),

    // ---------------------------------------------------------------
    // q102: classifier calibration — the table read BEFORE picking
    // q82's deployment threshold: sweep candidate thresholds over the
    // classifier score with the q75 rule gate as ground truth, and
    // report TP/FP/FN + precision/recall per threshold (the q93
    // calibration pattern applied to quality classification). All
    // features integer, both engines compute the IDENTICAL exact
    // divisions; zero-denominator cells emit NULL on both sides.
    //
    // Scale: one text scan computing the per-doc features, a
    // broadcast nested-loop against the 4-row threshold frame, one
    // threshold-keyed aggregate — nothing ∝ N² and the cross join's
    // build side is constant-size.
    Q("q102_classifier_calibration",
      (s, d) => {
        import s.implicits._
        // q82's score and q75's gate, over one shared feature pass
        val scored = gateFeatures(s, d).select(col("doc_id"),
          classifierScore.as("score"),
          ruleKeep.cast("long").as("keep"))
        val ths = Seq(400L, 600L, 800L, 1000L).toDF("threshold")
        scored.crossJoin(broadcast(ths))
          .select(col("threshold"),
            (col("score") >= col("threshold")).cast("long").as("pred"),
            col("keep"))
          .groupBy(col("threshold"))
          .agg(sum(col("pred") * col("keep")).as("tp"),
            sum(col("pred") * (lit(1L) - col("keep"))).as("fp"),
            sum((lit(1L) - col("pred")) * col("keep")).as("fn"))
          .select(col("threshold"), col("tp"), col("fp"), col("fn"),
            when(col("tp") + col("fp") > 0,
              expr("(tp * 10000) div (tp + fp)")).as("precision_e4"),
            when(col("tp") + col("fn") > 0,
              expr("(tp * 10000) div (tp + fn)")).as("recall_e4"))
          .orderBy(col("threshold"))
      },
      Some(s"""
        WITH m AS (
          $gateFeaturesSql
        ), sc AS (
          SELECT doc_id,
                 $classifierScoreSql AS score,
                 CASE WHEN $ruleKeepSql THEN 1 ELSE 0 END AS keep
          FROM m
        ), th AS (
          SELECT unnest(CAST([400, 600, 800, 1000] AS BIGINT[])) AS threshold
        ), a AS (
          SELECT threshold,
                 CAST(SUM(CASE WHEN score >= threshold THEN keep ELSE 0 END)
                      AS BIGINT) AS tp,
                 CAST(SUM(CASE WHEN score >= threshold THEN 1 - keep ELSE 0 END)
                      AS BIGINT) AS fp,
                 CAST(SUM(CASE WHEN score < threshold THEN keep ELSE 0 END)
                      AS BIGINT) AS fn
          FROM sc CROSS JOIN th GROUP BY threshold
        )
        SELECT threshold, tp, fp, fn,
               CASE WHEN tp + fp > 0
                    THEN CAST((tp * 10000) // (tp + fp) AS BIGINT)
               END AS precision_e4,
               CASE WHEN tp + fn > 0
                    THEN CAST((tp * 10000) // (tp + fn) AS BIGINT)
               END AS recall_e4
        FROM a ORDER BY threshold
      """)),

    // ---------------------------------------------------------------
    // q105: end-to-end curation yield report (r8) — the capstone
    // integration query: run the full curation chain
    //   raw → exact-dedup keepers (q39 semantics)
    //       → rule quality gate (q75 predicate)
    //       → decontamination (q61 semantics: drop the held-out
    //         benchmark docs AND anything sharing a 4-gram with them)
    // and report per-source doc counts at every stage plus the final
    // token yield — the one table a dataset owner reads to see where
    // each source's data went.
    //
    // Scale: one corpus scan computes all per-doc features + the
    // digest; the only corpus-sized shuffles are the digest-keyed
    // keeper aggregate and its doc_id-keyed join back. The benchmark
    // gram set and the contaminated-id list are both tiny → broadcast
    // joins. Stage membership is FLAGS, not filters, so the per-source
    // rollup is a single aggregate of one annotated frame.
    Q("q105_curation_yield",
      (s, d) => {
        // feats feeds both the keeper aggregate and the final rollup;
        // grams feeds both the benchmark set and the contamination
        // probe — persist the small derived frames (no text column)
        // so the corpus text is scanned/tokenized exactly twice, not
        // four times
        val feats = gateFeatures(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val keepers = feats.groupBy(col("h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), lit(1L).as("is_keeper"))
        val grams = Tables.documents(s, d).select(col("doc_id"),
          transform(
            array_distinct(graft.text.TextAnalysis.wordNgrams(col("text"), 4)),
            x => xxhash64(x)).as("grams"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bench = grams.filter(col("doc_id") % 50 === 0)
          .select(explode(col("grams")).as("gram")).distinct()
        val contaminated = grams.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), explode(col("grams")).as("gram"))
          .join(broadcast(bench), "gram")
          .select(col("doc_id")).distinct()
          .withColumn("is_contam", lit(1L))
        feats
          .join(keepers, Seq("doc_id"), "left")
          .join(broadcast(contaminated), Seq("doc_id"), "left")
          .select(col("source"), col("n_tok"),
            coalesce(col("is_keeper"), lit(0L)).as("keeper"),
            ruleKeep.cast("long").as("gate"),
            (col("doc_id") % 50 === 0
              || coalesce(col("is_contam"), lit(0L)) === 1L)
              .cast("long").as("dropped"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_raw"),
            sum(col("keeper")).as("n_dedup"),
            sum(col("keeper") * col("gate")).as("n_quality"),
            sum(col("keeper") * col("gate") * (lit(1L) - col("dropped")))
              .as("n_final"),
            coalesce(sum(when(
                col("keeper") * col("gate") * (lit(1L) - col("dropped")) === 1L,
                col("n_tok"))), lit(0L)).as("tok_final"))
          .select(col("source"), col("n_raw"), col("n_dedup"),
            col("n_quality"), col("n_final"),
            expr("(n_final * 10000) div n_raw").as("yield_e4"),
            col("tok_final"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH m AS (
          $gateFeaturesSql
        ), k AS (
          SELECT h, MIN(doc_id) AS keeper FROM m GROUP BY h
        ), g AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(ts) - 2),
                   i -> ts[i]||' '||ts[i+1]||' '||ts[i+2]||' '||ts[i+3])) AS grams
          FROM (SELECT doc_id, ${OracleSql.DTokens} AS ts FROM documents)
        ), bench AS (
          SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0
        ), cont AS (
          SELECT DISTINCT doc_id
          FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0)
          WHERE gram IN (SELECT gram FROM bench)
        ), f AS (
          SELECT m.source, m.n_tok,
                 CASE WHEN m.doc_id = k.keeper THEN 1 ELSE 0 END AS keeper,
                 CASE WHEN $ruleKeepSql THEN 1 ELSE 0 END AS gate,
                 CASE WHEN m.doc_id % 50 = 0
                       OR m.doc_id IN (SELECT doc_id FROM cont)
                      THEN 1 ELSE 0 END AS dropped
          FROM m JOIN k USING (h)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_raw,
               CAST(SUM(keeper) AS BIGINT) AS n_dedup,
               CAST(SUM(keeper * gate) AS BIGINT) AS n_quality,
               CAST(SUM(keeper * gate * (1 - dropped)) AS BIGINT) AS n_final,
               CAST((SUM(keeper * gate * (1 - dropped)) * 10000) // COUNT(*)
                    AS BIGINT) AS yield_e4,
               CAST(COALESCE(SUM(CASE WHEN keeper * gate * (1 - dropped) = 1
                                      THEN n_tok END), 0) AS BIGINT) AS tok_final
        FROM f GROUP BY source ORDER BY source
      """)),

    // ---------------------------------------------------------------
    // q136: declarative DQ expectations — the gating layer ABOVE
    // q77's profile: a rule table (metric, op, threshold) evaluated
    // against corpus metrics, emitting per-expectation pass/fail (the
    // Deequ/Great-Expectations "constraint suite" a pipeline runs
    // before promoting a snapshot). ONE wide aggregate computes every
    // metric in a single scan; the single metrics row is melted with
    // stack() and equi-joined to the broadcast literal rule table —
    // adding an expectation costs one rule row, never another pass.
    // All ratios are exact e4 integers; pass is an int (1/0) so both
    // engines hash identically.
    Q("q136_dq_expectations",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val rules = Seq(
          ("min_n_chars", "ge", 1L), ("max_n_chars", "le", 10000L),
          ("unique_doc_id_e4", "ge", 10000L), ("null_lang_e4", "le", 0L),
          ("nonempty_text_e4", "ge", 9500L))
          .toDF("metric", "op", "threshold")
        val m = Tables.documents(s, d).agg(
          count(lit(1)).as("n"),
          min(col("n_chars")).as("min_n_chars"),
          max(col("n_chars")).as("max_n_chars"),
          countDistinct(col("doc_id")).as("nd"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).as("nl"),
          sum(when(length(trim(col("text"))) > 0, 1L).otherwise(0L)).as("ne"))
        val melted = m.selectExpr(
          """stack(5,
               'min_n_chars', min_n_chars,
               'max_n_chars', max_n_chars,
               'unique_doc_id_e4', nd * 10000 DIV n,
               'null_lang_e4', nl * 10000 DIV n,
               'nonempty_text_e4', ne * 10000 DIV n) AS (metric, value)""")
        melted.join(broadcast(rules), "metric")
          .withColumn("pass",
            when(col("op") === "ge", col("value") >= col("threshold"))
              .otherwise(col("value") <= col("threshold")).cast("int"))
          .select(col("metric"), col("op"), col("threshold"), col("value"),
            col("pass"))
          .orderBy(col("metric"))
      },
      Some("""
        WITH m AS (
          SELECT COUNT(*) AS n,
                 MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars,
                 COUNT(DISTINCT doc_id) AS nd,
                 SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS nl,
                 SUM(CASE WHEN LENGTH(TRIM(text)) > 0 THEN 1 ELSE 0 END) AS ne
          FROM documents
        ), v AS (
          SELECT 'min_n_chars' AS metric, CAST(min_n_chars AS BIGINT) AS value FROM m
          UNION ALL SELECT 'max_n_chars', CAST(max_n_chars AS BIGINT) FROM m
          UNION ALL SELECT 'unique_doc_id_e4', CAST(nd * 10000 // n AS BIGINT) FROM m
          UNION ALL SELECT 'null_lang_e4', CAST(nl * 10000 // n AS BIGINT) FROM m
          UNION ALL SELECT 'nonempty_text_e4', CAST(ne * 10000 // n AS BIGINT) FROM m
        ), r AS (
          SELECT * FROM (VALUES
            ('min_n_chars', 'ge', 1), ('max_n_chars', 'le', 10000),
            ('unique_doc_id_e4', 'ge', 10000), ('null_lang_e4', 'le', 0),
            ('nonempty_text_e4', 'ge', 9500)) AS t(metric, op, threshold)
        )
        SELECT v.metric AS metric, op, CAST(threshold AS BIGINT) AS threshold,
               value,
               CAST(CASE WHEN op = 'ge' THEN value >= threshold
                         ELSE value <= threshold END AS INT) AS pass
        FROM v JOIN r ON v.metric = r.metric
        ORDER BY 1
      """))
  )
}
