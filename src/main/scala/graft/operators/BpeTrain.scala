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
  * current segmentations (explode → (a,b)-keyed integer SUM; a run of
  * k identical symbols contributes k−1 overlapping (x,x) pairs,
  * exactly as the sequential trainer's sliding window counts);
  * (2) pick the most frequent pair, ties broken lexicographically —
  * a 1-row frame, broadcast; (3) merge every occurrence in every word
  * under GREEDY LEFT-TO-RIGHT NON-OVERLAPPING semantics — the
  * standard one-pass-per-rule BPE application, self-pairs included
  * (r10; the a ≠ b selection exclusion of r9 is lifted).
  *
  * Merge application is the subtle step. The Spark side applies the
  * rule as a codegen'd `aggregate` fold that merges when the
  * accumulator's last symbol is `a` and the incoming symbol is `b`;
  * that fold IS greedy left-to-right for ANY rule, self-pairs
  * included, because a freshly merged symbol a||b can never re-match
  * as the left side within the sweep (a||b ≠ a since b is nonempty) —
  * so in a run of identical symbols the merges land at even offsets
  * 0,2,4… of the run, the production-trainer behavior. The SQL twin
  * mirrors this with a per-run PARITY construction: hit positions
  * (s[i]=a ∧ s[i+1]=b) are grouped into maximal consecutive runs
  * (gaps-and-islands over the position order), a hit is APPLIED iff
  * its offset from the run start is even, and a position is consumed
  * iff its predecessor was applied. For a ≠ b no two hits are ever
  * adjacent (s[i+1]=b≠a), so every hit sits at offset 0 of its own
  * run and the construction degenerates to the simple lag-skip — the
  * two engines are provably identical in both regimes. Every quantity
  * is an order-independent integer sum, so the twin is bit-identical.
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
    * n = weighted occurrence count that won the sweep). Stops early —
    * keeping the rules learned so far — if the vocabulary runs out of
    * pairs before `merges` sweeps (e.g. every word merged to one
    * symbol): continuing would cross-join against an empty winner and
    * silently wipe the segmentation frame.
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
    var i = 1
    var exhausted = false
    while (i <= merges && !exhausted) {
      val pairs = w
        .select(col("freq"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
                      slice(syms, 2, size(syms) - 1),
                      (x, y) -> named_struct('a', x, 'b', y))""")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"), col("freq"))
        .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("n"))
      // the winner is consumed twice (merge table + broadcast into the
      // merge application) — checkpoint the 1-row frame so the sweep's
      // pair count runs once and the lineage stays flat
      val best = Reliable.barrier(
        pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1))(
        _.localCheckpoint())
      if (best.isEmpty) {
        // merges exceeded the available pairs: stop, keeping w and the
        // merge table learned so far intact (ADVICE r9)
        exhausted = true
      } else {
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
        i += 1
      }
    }
    require(table != null,
      "no mergeable pair exists in the input (all words are single symbols)")
    (table, w)
  }

  /** Oracle twin: the same sweeps as generated CTEs over a
    * `w0(word, freq, syms)` CTE — per sweep a pair-count CTE, a
    * LIMIT-1 winner CTE, and a merge-application CTE implementing
    * greedy left-to-right via the per-run parity construction
    * (hit runs = gaps-and-islands over consecutive hit positions;
    * applied = even offset within the run; consumed = predecessor
    * applied — identical to the fold for all rules, self-pairs
    * included). Leaves the winners as `m1..mN`.
    */
  def oracleCtes(merges: Int): String =
    (1 to merges).map { i =>
      s"""p$i AS (
         |          SELECT a, b, CAST(SUM(freq) AS BIGINT) AS n FROM (
         |            SELECT syms[j] AS a, syms[j + 1] AS b, freq
         |            FROM w${i - 1}, LATERAL (
         |              SELECT UNNEST(range(1, len(syms))) AS j)
         |          ) GROUP BY a, b
         |        ), m$i AS (
         |          SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1
         |        ), w$i AS (
         |          SELECT word, freq,
         |                 list(CASE WHEN app THEN a || b ELSE s END
         |                      ORDER BY pos) AS syms
         |          FROM (
         |            SELECT word, freq, pos, s, a, b,
         |                   hit AND (pos - rs) % 2 = 0 AS app,
         |                   COALESCE(lag(hit AND (pos - rs) % 2 = 0) OVER (
         |                     PARTITION BY word ORDER BY pos), FALSE) AS prev
         |            FROM (
         |              SELECT *, MIN(CASE WHEN hit THEN pos END) OVER (
         |                          PARTITION BY word, nh) AS rs
         |              FROM (
         |                SELECT *, SUM(CASE WHEN hit THEN 0 ELSE 1 END) OVER (
         |                            PARTITION BY word ORDER BY pos
         |                            ROWS UNBOUNDED PRECEDING) AS nh
         |                FROM (
         |                  SELECT w.word, w.freq, j AS pos, syms[j] AS s,
         |                         m.a, m.b,
         |                         COALESCE(syms[j] = m.a AND syms[j + 1] = m.b,
         |                                  FALSE) AS hit
         |                  FROM w${i - 1} w CROSS JOIN m$i m, LATERAL (
         |                    SELECT UNNEST(range(1, len(syms) + 1)) AS j)
         |                )
         |              )
         |            )
         |          ) WHERE NOT prev GROUP BY word, freq
         |        )""".stripMargin
    }.mkString(", ")
}
