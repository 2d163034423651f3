package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-Pair-Encoding tokenizer TRAINING as relational sweeps — the
  * missing half of the tokenizer tier (q31/q91 count and budget
  * tokens; this LEARNS the merge table a tokenizer is made of).
  * Classic trainer design (Sennrich et al. 2016, and how HF
  * `tokenizers` does it): train on the WORD-FREQUENCY table, not the
  * corpus — the corpus is scanned once for (word, freq) and every
  * sweep after that is vocabulary-bounded, which is what makes BPE
  * training feasible at 100 TB (pair-count state ∝ vocab·avg-len,
  * never ∝ corpus).
  *
  * Each sweep: (1) count weighted adjacent symbol pairs over the
  * current segmentations (explode → (a,b)-keyed integer SUM);
  * (2) pick the most frequent pair, ties broken lexicographically —
  * a 1-row frame, broadcast; (3) merge every occurrence in every
  * word. Merge application is the subtle step: with the self-pair
  * exclusion a ≠ b (see below) no two adjacent positions can both
  * match (s[i+1]=b ≠ a ⟹ positions i, i+1 never both match), so
  * "greedy left-to-right non-overlapping" equals "merge all match
  * positions simultaneously" — the Spark side applies it as a
  * codegen'd `aggregate` fold, the SQL twin as a lag-window skip over
  * the same match positions, and the two are provably identical.
  * A freshly merged symbol a||b can never re-match within the sweep
  * (a||b ≠ a since b is nonempty), matching standard BPE's
  * one-pass-per-rule semantics.
  *
  * Contract: self-pairs (a = b, e.g. "aa" runs) are excluded from
  * SELECTION — merging a run of identical symbols is inherently
  * sequential (parity within the run), which is exactly the
  * order-dependent semantics a cross-engine hash-compare cannot pin
  * without a per-run parity construction; production trainers do
  * handle them (runs merge at offsets 0,2,4…), and the extension here
  * is a parity flag on match runs, same plan shape. Every quantity is
  * an order-independent integer sum, so the twin is bit-identical.
  *
  * Scale shape: sweep state (the segmentation frame) is
  * vocab-keyed; pair counting shuffles on (a,b) (bounded by
  * vocab·avg-len); the 1-row winner broadcasts; lineage is truncated
  * per sweep ([[Reliable.barrier]] — the PageRank/KMeans iteration
  * discipline). Raising merges to a real 30k-vocab budget changes
  * the sweep COUNT, not any per-sweep shape.
  */
object BpeTrain {

  /** Learn `merges` merge rules from a (word, freq) frame. Returns
    * (sweep, lsym, rsym, n) — the ordered merge table (sweep 1-based,
    * n = weighted occurrence count that won the sweep).
    */
  def run(words: DataFrame, merges: Int): DataFrame =
    trainState(words, merges)._1

  /** Full train state: (merge table, final segmentation frame
    * (word, freq, syms)) — the encode side (q149 fertility) reads the
    * trained segmentations; [[run]] keeps the table-only surface.
    */
  def trainState(words: DataFrame, merges: Int): (DataFrame, DataFrame) = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    var w = words.select(col("word"), col("freq"),
      expr("transform(sequence(1, length(word)), j -> substring(word, j, 1))")
        .as("syms"))
    var table: DataFrame = null
    (1 to merges).foreach { i =>
      val pairs = w
        .select(col("freq"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
                      slice(syms, 2, size(syms) - 1),
                      (x, y) -> named_struct('a', x, 'b', y))""")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"), col("freq"))
        .filter(col("a") =!= col("b"))
        .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("n"))
      // the winner is consumed twice (merge table + broadcast into the
      // merge application) — checkpoint the 1-row frame so the sweep's
      // pair count runs once and the lineage stays flat
      val best = Reliable.barrier(
        pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1))(
        _.localCheckpoint())
      val sweepRow = best.select(lit(i).as("sweep"), col("a").as("lsym"),
        col("b").as("rsym"), col("n"))
      table = if (table == null) sweepRow else table.unionAll(sweepRow)
      val merged = w.crossJoin(broadcast(best))
        .withColumn("syms", expr(
          """aggregate(syms, cast(array() as array<string>), (acc, x) ->
               CASE WHEN size(acc) > 0 AND element_at(acc, -1) = a AND x = b
                    THEN concat(slice(acc, 1, size(acc) - 1),
                                array(concat(a, b)))
                    ELSE concat(acc, array(x)) END)"""))
        .select(col("word"), col("freq"), col("syms"))
      w = Reliable.barrier(merged)(_.localCheckpoint())
    }
    (table, w)
  }

  /** Oracle twin: the same sweeps as generated CTEs over a
    * `w0(word, freq, syms)` CTE — per sweep a pair-count CTE, a
    * LIMIT-1 winner CTE, and a lag-window merge-application CTE
    * (merge-all-matches, identical to the fold under a ≠ b). Leaves
    * the winners as `m1..mN`.
    */
  def oracleCtes(merges: Int): String =
    (1 to merges).map { i =>
      s"""p$i AS (
         |          SELECT a, b, CAST(SUM(freq) AS BIGINT) AS n FROM (
         |            SELECT syms[j] AS a, syms[j + 1] AS b, freq
         |            FROM w${i - 1}, LATERAL (
         |              SELECT UNNEST(range(1, len(syms))) AS j)
         |          ) WHERE a <> b GROUP BY a, b
         |        ), m$i AS (
         |          SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1
         |        ), w$i AS (
         |          SELECT word, freq,
         |                 list(CASE WHEN hit THEN a || b ELSE s END
         |                      ORDER BY pos) AS syms
         |          FROM (
         |            SELECT word, freq, pos, s, a, b, hit,
         |                   COALESCE(lag(hit) OVER (
         |                     PARTITION BY word ORDER BY pos), FALSE) AS prev
         |            FROM (
         |              SELECT w.word, w.freq, j AS pos, syms[j] AS s,
         |                     m.a, m.b,
         |                     COALESCE(syms[j] = m.a AND syms[j + 1] = m.b,
         |                              FALSE) AS hit
         |              FROM w${i - 1} w CROSS JOIN m$i m, LATERAL (
         |                SELECT UNNEST(range(1, len(syms) + 1)) AS j)
         |            )
         |          ) WHERE NOT prev GROUP BY word, freq
         |        )""".stripMargin
    }.mkString(", ")
}
