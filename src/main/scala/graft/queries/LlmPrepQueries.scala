package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.ColumnOps.let
import graft.text.TextAnalysis

/** Pretraining-corpus preparation operators beyond dedup/quality:
  * PII redaction, repetition signals, and benchmark-contamination
  * screening — the standard cleanup passes (C4/Gopher-family) a
  * training-data pipeline runs before packing. All are oracle-checked
  * against DuckDB computing the identical expressions.
  */
object LlmPrepQueries {

  /** DuckDB twin of TextAnalysis.tokens. */
  private val DTokens = OracleSql.DTokens // shared oracle fragment

  // Patterns restricted to the Java-regex ∩ RE2 common subset so both
  // engines compile them identically (no lookarounds, no backrefs).
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\d{3}[-.]\\d{3}[-.]\\d{4}"

  /** (doc_id, word) token stream over the corpus — the shared front of
    * the vocabulary/LM operators (q63, q65).
    */
  private def tokenStream(s: SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("word"))

  /** Global (word, cnt) counts — one shuffle keyed by word; map-side
    * partial aggregation absorbs the per-doc repetition.
    */
  private def wordCounts(toks: DataFrame) =
    toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // q59: PII redaction — detect + mask emails and phone numbers, the
    // C4-style scrub pass. The synthetic corpus carries no PII, so both
    // engines first append a deterministic doc_id-derived email+phone
    // to every document (identical string expression on both sides) —
    // the redaction is then REAL work the oracle verifies byte-exactly
    // via md5 of the redacted text. One scan, no shuffle: the 100 TB
    // cost is the regex pass itself.
    Q("q59_pii_redact",
      (s, d) => {
        val pii = concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com tel 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
        val redacted = regexp_replace(
          regexp_replace(pii, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
        Tables.documents(s, d)
          .select(col("doc_id"),
            regexp_count(pii, lit(EmailRe)).as("n_emails"),
            regexp_count(pii, lit(PhoneRe)).as("n_phones"),
            md5(redacted).as("redacted_md5"),
            length(redacted).as("n_chars_redacted"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH pii AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com tel 555-'
                      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
          FROM documents
        ),
        red AS (
          SELECT doc_id,
                 len(regexp_extract_all(t, '$EmailRe')) AS n_emails,
                 len(regexp_extract_all(t, '$PhoneRe')) AS n_phones,
                 regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
                                '$PhoneRe', '<PHONE>', 'g') AS r
          FROM pii
        )
        SELECT doc_id, CAST(n_emails AS INT) AS n_emails,
               CAST(n_phones AS INT) AS n_phones,
               md5(r) AS redacted_md5, CAST(len(r) AS INT) AS n_chars_redacted
        FROM red ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q60: repetition signal — duplicate word-bigram fraction per doc
    // (the Gopher "repetition" quality gate: high ratio ⟹ boilerplate /
    // degenerate text). One scan; `let`-bound so the bigram array is
    // built once per row. Ratio emitted as floor(x*1e4) of an identical
    // IEEE double expression on both engines.
    Q("q60_repetition",
      (s, d) => {
        val rep: Column = let(TextAnalysis.wordNgrams(col("text"), 2)) { gs =>
          struct(size(gs).as("n"), size(array_distinct(gs)).as("nd"))
        }
        Tables.documents(s, d)
          // filter on the CHEAP equivalent predicate (n_bigrams > 0 ⟺
          // tokenCount ≥ 2) BEFORE the expensive projection: a filter on
          // r.n between the two selects would be predicate-pushed below
          // the projection with alias substitution and evaluate the whole
          // bigram struct twice per row
          .filter(TextAnalysis.tokenCount(col("text")) >= 2)
          .select(col("doc_id"), rep.as("r"))
          .select(col("doc_id"),
            col("r.n").cast("bigint").as("n_bigrams"),
            col("r.nd").cast("bigint").as("n_distinct"),
            floor((col("r.n") - col("r.nd")).cast("double") / col("r.n") * 10000)
              .as("dup_ratio_e4"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id,
                 list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1]) AS gs
          FROM (SELECT doc_id, $DTokens AS ts FROM documents)
        )
        SELECT doc_id,
               CAST(len(gs) AS BIGINT) AS n_bigrams,
               CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct,
               CAST(floor(CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE)
                          / len(gs) * 10000) AS BIGINT) AS dup_ratio_e4
        FROM b WHERE len(gs) > 0 ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q61: benchmark-contamination screen — corpus documents sharing
    // any word-4-gram with a held-out "benchmark" set (here: the
    // deterministic doc_id%50=0 slice standing in for an eval suite).
    // Scale shape: the benchmark gram set is small (eval suites are
    // KBs-MBs, not TBs), so it BROADCASTS and contamination is a
    // map-side semi-join per (doc, gram) — no shuffle of the corpus;
    // the only shuffle is the per-doc count aggregate of the few hits.
    // Grams are carried as xxhash64 longs (8 bytes vs ~25-byte strings
    // in the broadcast + per-row probes); like DedupQueries' shingles,
    // matches are exact only whp — a 64-bit collision (P ≈ n²/2⁶⁵,
    // ~1e-11 even at a billion distinct grams) would flag a spurious
    // hit. The oracle joins raw strings, so a collision surfaces as a
    // hash mismatch rather than passing silently.
    Q("q61_contamination",
      (s, d) => {
        // persisted (r17): the benchmark side and the probe side both
        // consume this frame, and the 4-gram tokenize+hash dominates
        // either pass — unpersisted, the corpus was shingled twice per
        // run (the broadcast build materializes the cache first, so the
        // probe stage reads cached blocks; no race guard needed)
        val g = Tables.documents(s, d)
          .select(col("doc_id"),
            transform(array_distinct(TextAnalysis.wordNgrams(col("text"), 4)),
              x => xxhash64(x)).as("grams"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bench = g.filter(col("doc_id") % 50 === 0)
          .select(explode(col("grams")).as("gram")).distinct()
        val out = g.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), explode(col("grams")).as("gram"))
          .join(broadcast(bench), "gram")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy(col("doc_id"))
        // r18 (r17 verdict #10 — persist lifecycle): materialize the
        // contaminated-doc report (corpus-tiny) eagerly, then release
        // the gram cache — the returned frame reads the checkpointed
        // blocks, so a long-lived embedding caller no longer inherits
        // a session-lifetime cache of the full shingled corpus.
        // Bench/Verify sweep checkpoint blocks per query, so nothing
        // persists across timed runs.
        val mat = out.localCheckpoint()
        g.unpersist(false)
        mat
      },
      Some("""
        WITH g AS (
          SELECT doc_id, list_distinct(list_transform(range(1, len(ts) - 2),
                   i -> ts[i]||' '||ts[i+1]||' '||ts[i+2]||' '||ts[i+3])) AS grams
          FROM (SELECT doc_id,
                       list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                   x -> x <> '') AS ts
                FROM documents)
        ),
        bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0)
        SELECT doc_id, COUNT(*) AS n_shared
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0)
        WHERE gram IN (SELECT gram FROM bench)
        GROUP BY doc_id ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q62: sequence packing — assign documents to fixed token-budget
    // training sequences (the step between cleaning and training).
    // Distributed shape: docs are sharded (doc_id % S); packing is
    // contiguous-fill per shard via a running token count, so each
    // shard packs independently — the window never sees more than one
    // shard, S scales with the cluster, and assignment is deterministic
    // (doc_id order). Output is the per-sequence manifest.
    Q("q62_seq_packing",
      (s, d) => {
        val B = 512 // token budget per packed sequence
        val S = 8   // shards (cluster-parallelism knob)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), (col("doc_id") % S).as("shard"),
            TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          // start-offset binning: a doc belongs to the sequence its
          // PRECEDING tokens fill into (docs larger than B still get a
          // bin; real packers would split them — out of scope here)
          .select(col("shard"), floor((col("cum") - col("n_tok")) / B).as("seq_id"),
            col("n_tok"))
          .groupBy(col("shard"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("bigint").as("total_tokens"))
          .orderBy(col("shard"), col("seq_id"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, doc_id % 8 AS shard,
                 CAST(len($DTokens) AS BIGINT) AS n_tok
          FROM documents
        ),
        c AS (
          SELECT shard, n_tok,
                 SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
          FROM t
        )
        SELECT shard, CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 512) AS BIGINT) AS seq_id,
               COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
        FROM c GROUP BY shard, seq_id ORDER BY shard, seq_id
      """)),

    // ---------------------------------------------------------------
    // q63: vocabulary construction — global token counts, min-frequency
    // cutoff, contiguous frequency-ranked ids (the tokenizer-vocab
    // step between corpus cleaning and training). Scale shape: one
    // explode + one shuffle keyed on word for the counts (map-side
    // partial agg absorbs the per-doc repetition); id assignment is
    // GlobalRank's two-phase range partition — no single-task window
    // over the vocabulary, which at web scale is itself millions of
    // rows.
    Q("q63_vocab",
      (s, d) => {
        val words = wordCounts(tokenStream(s, d)).filter(col("cnt") >= 5)
        graft.operators.GlobalRank
          .withGlobalRank(words, Seq(col("cnt").desc, col("word")), "vocab_id")
          .select(col("word"), col("cnt"), col("vocab_id"))
          .orderBy(col("vocab_id"))
      },
      Some(s"""
        WITH w AS (SELECT unnest($DTokens) AS word FROM documents),
        c AS (SELECT word, COUNT(*) AS cnt FROM w
              GROUP BY word HAVING COUNT(*) >= 5)
        SELECT word, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT)
                 AS vocab_id
        FROM c ORDER BY vocab_id
      """)),

    // ---------------------------------------------------------------
    // q64: corpus length profile — exact continuous percentiles
    // (p25/p50/p75/p95) of document length per language, the stats pass
    // that sizes packing budgets and length filters. EXACT `percentile`
    // so the oracle can match (approx sketches differ by algorithm
    // across engines by construction); the percentile_approx sketch
    // companion — the 100 TB path, one pass, bounded memory — is
    // asserted against the exact values in LlmPrepSpec instead.
    Q("q64_len_quantiles",
      (s, d) => {
        def pE2(p: Double, name: String) =
          floor(percentile(col("n_chars"), lit(p)) * 100)
            .cast("bigint").as(name)
        Tables.documents(s, d)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            pE2(0.25, "p25_e2"), pE2(0.5, "p50_e2"),
            pE2(0.75, "p75_e2"), pE2(0.95, "p95_e2"))
          .orderBy(col("lang"))
      },
      Some("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(floor(quantile_cont(n_chars, 0.25) * 100) AS BIGINT) AS p25_e2,
               CAST(floor(quantile_cont(n_chars, 0.5)  * 100) AS BIGINT) AS p50_e2,
               CAST(floor(quantile_cont(n_chars, 0.75) * 100) AS BIGINT) AS p75_e2,
               CAST(floor(quantile_cont(n_chars, 0.95) * 100) AS BIGINT) AS p95_e2
        FROM documents GROUP BY lang ORDER BY lang
      """)),

    // ---------------------------------------------------------------
    // q65: unigram-LM scoring — the CCNet-style "does this doc look
    // like the corpus" quality filter: train a unigram model on the
    // corpus (word → frequency), score each doc by its tokens' mean
    // corpus frequency and rare-token fraction. Scale shape: the LM is
    // vocabulary-sized (MBs at web scale) → BROADCAST; scoring is a
    // map-side join + one per-doc aggregate — the corpus shuffles once,
    // keyed by doc_id. Scores stay in the INTEGER frequency domain
    // (exact long sums + one correctly-rounded IEEE division) rather
    // than log-probability: +,-,*,/ are identically rounded on both
    // engines but libm/StrictMath `log` can differ in the last ulp,
    // which a floor-scaled oracle hash would surface as flakes. (A
    // production build would broadcast a KenLM-style model the same
    // way; only the per-token score column changes.)
    Q("q65_unigram_lm",
      (s, d) => {
        // persisted: the token stream feeds BOTH the LM aggregate and
        // the probe side of the join — without the barrier the corpus
        // is scanned and tokenized twice per run
        val toks = tokenStream(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val lm = wordCounts(toks).withColumnRenamed("cnt", "freq")
        toks.join(broadcast(lm), "word")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tok"),
            sum(col("freq")).as("sum_freq"),
            sum(when(col("freq") < 20, 1L).otherwise(0L)).as("n_rare"))
          .select(col("doc_id"), col("n_tok"), col("sum_freq"),
            floor((col("sum_freq") * 100) / col("n_tok"))
              .cast("bigint").as("mean_freq_e2"),
            floor((col("n_rare") * 10000) / col("n_tok"))
              .cast("bigint").as("rare_frac_e4"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, unnest($DTokens) AS word FROM documents),
        lm AS (SELECT word, COUNT(*) AS freq FROM t GROUP BY word),
        sc AS (
          SELECT doc_id, COUNT(*) AS n_tok,
                 CAST(SUM(freq) AS BIGINT) AS sum_freq,
                 CAST(SUM(CASE WHEN freq < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
          FROM t JOIN lm USING (word) GROUP BY doc_id
        )
        SELECT doc_id, n_tok, sum_freq,
               CAST(floor(CAST(sum_freq * 100 AS DOUBLE) / n_tok) AS BIGINT)
                 AS mean_freq_e2,
               CAST(floor(CAST(n_rare * 10000 AS DOUBLE) / n_tok) AS BIGINT)
                 AS rare_frac_e4
        FROM sc ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q68: data mixture rebalancing — cap each source at its target
    // mixture weight (the Pile/Dolma-style mixing step between curation
    // and packing). Selection is DETERMINISTIC sampling: keep the cap
    // smallest md5-hash-ordered docs per source — unbiased like a
    // seeded random sample, but bit-reproducible on both engines, so
    // the oracle checks the achieved mixture exactly. Weights are
    // integer per-mille (a DuckDB 0.30 literal is DECIMAL while
    // Spark's is double — floor(200*0.30) would differ; 200*300/1000
    // is the same correctly-rounded division on both). Scale shape:
    // one window partitioned by source (sources ≫ executors at corpus
    // scale would switch to GlobalRank per source) + one agg.
    Q("q68_mixture",
      (s, d) => {
        val B = 200 // total doc budget for the mixture
        val wPm = when(col("source") === "src1", 300L)
          .when(col("source") === "src2", 250L).otherwise(25L)
        val h = conv(substring(md5(encode(
          concat(lit("mix"), col("doc_id").cast("string")), "utf-8")),
          1, 14), 16, 10).cast("bigint")
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), wPm.as("w_pm"), h.as("h"))
          .withColumn("rn", row_number().over(win))
          .withColumn("cap", floor(lit(B) * col("w_pm") / 1000).cast("bigint"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_available"),
            max(col("cap")).as("cap"),
            sum(when(col("rn") <= col("cap"), 1L).otherwise(0L)).as("n_kept"))
          .orderBy(col("source"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, source,
                 CASE source WHEN 'src1' THEN 300 WHEN 'src2' THEN 250
                      ELSE 25 END AS w_pm,
                 CAST('0x' || substring(md5('mix' || doc_id), 1, 14) AS BIGINT)
                   AS h
          FROM documents
        ),
        r AS (
          SELECT source, w_pm,
                 row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                   AS rn,
                 CAST(floor(200 * w_pm / 1000) AS BIGINT) AS cap
          FROM t
        )
        SELECT source, COUNT(*) AS n_available, MAX(cap) AS cap,
               CAST(SUM(CASE WHEN rn <= cap THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept
        FROM r GROUP BY source ORDER BY source
      """)),

    // ---------------------------------------------------------------
    // q83: training-order shuffle + sharding — the EXPORT step after
    // curation/mixing: give every document a reproducible pseudorandom
    // position (order by a seeded hash — a deterministic permutation,
    // not engine `rand()` whose stream is partitioning-dependent),
    // then round-robin positions into S shards so every shard is a
    // uniform sample of the shuffled order and shard sizes differ by
    // at most one (what a data loader wants: any shard prefix is an
    // unbiased curriculum slice).
    //
    // Scale shape: the global position comes from the two-phase
    // GlobalRank (range repartition on the hash key + broadcast
    // offsets) — no single-task sort of the corpus anywhere; S is a
    // free knob and the shard assignment is arithmetic on the rank.
    // Bit-reproducible (md5 order, integer arithmetic) ⟹ exact oracle.
    Q("q83_train_shuffle",
      (s, d) => {
        val S = 8
        val keyed = Tables.documents(s, d).select(col("doc_id"),
          md5(concat(lit("shuf42:"), col("doc_id").cast("string"))).as("k"))
        graft.operators.GlobalRank
          .withGlobalRank(keyed, Seq(col("k"), col("doc_id")), "pos")
          .withColumn("p", col("pos") - 1)
          .select(col("doc_id"),
            (col("p") % S).as("shard"),
            ((col("p") - col("p") % S) / S).cast("long").as("pos_in_shard"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH r AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (
                   ORDER BY md5('shuf42:' || CAST(doc_id AS VARCHAR)), doc_id)
                   - 1 AS p
          FROM documents
        )
        SELECT doc_id, p % 8 AS shard, p // 8 AS pos_in_shard
        FROM r ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q89: overlapping document chunking — the windowing step between
    // cleaning and packing/embedding: split each document's token
    // stream into fixed-width chunks (W=32) with stride S=24, so
    // consecutive chunks overlap by 8 tokens and no boundary loses
    // context (the RAG-indexing / long-doc-pretraining shape). The
    // final short chunk is kept — dropping tail tokens is a silent
    // data loss this operator must not commit.
    //
    // Scale shape: one scan, one explode whose fan-out is ceil(len/S)
    // per doc — output volume is governed by the stride knob, and
    // chunk text is rebuilt from the SAME canonical whitespace tokens
    // both engines split on, so reconstruction is byte-exact.
    Q("q89_chunking",
      (s, d) => {
        val W = 32
        val S = 24
        val chunks = let(TextAnalysis.tokens(col("text"))) { ts =>
          transform(sequence(lit(1), greatest(size(ts), lit(1)), lit(S)),
            (start, j) => struct(
              j.as("chunk_idx"),
              start.as("start"),
              least(size(ts) - start + 1, lit(W)).as("n_tok"),
              concat_ws(" ", slice(ts, start, lit(W))).as("chunk")))
        }
        Tables.documents(s, d)
          .select(col("doc_id"), explode(chunks).as("c"))
          .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
            col("c.start").as("start"), col("c.n_tok").as("n_tok"),
            col("c.chunk").as("chunk"))
          .filter(col("n_tok") > 0) // token-less docs emit no chunks
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             x -> x <> '') AS ts
          FROM documents
        ), c AS (
          SELECT doc_id, ts,
                 list_transform(range(1, greatest(len(ts), 1) + 1, 24),
                                s -> s) AS starts
          FROM t
        ), e AS (
          -- unnest + generate_subscripts expand in lockstep, so the
          -- enumeration is exactly len(starts) per document — no
          -- hard-coded chunk cap that a long document could overflow
          SELECT doc_id, ts,
                 generate_subscripts(starts, 1) - 1 AS chunk_idx,
                 unnest(starts) AS start
          FROM c
        )
        SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
               CAST(start AS INT) AS start,
               CAST(least(len(ts) - start + 1, 32) AS INT) AS n_tok,
               array_to_string(list_slice(ts, start, start + 31), ' ') AS chunk
        FROM e WHERE least(len(ts) - start + 1, 32) > 0
        ORDER BY doc_id, chunk_idx
      """)),

    // ---------------------------------------------------------------
    // q126: size-weighted Bernoulli sample — each document is kept with
    // probability n_chars / max(n_chars), the standard
    // probability-proportional-to-size corpus subsample (longer docs
    // carry more training signal per row of overhead). The coin is a
    // DETERMINISTIC seeded hash — h = (doc_id mod M)·K mod M, M =
    // 1000003 (prime), K = 2654435761 (Knuth's multiplicative constant)
    // — so the sample is reproducible across runs AND engines, and the
    // inclusion test h·w_max < w·M is exact integer arithmetic (fits
    // long: M·K ≈ 2.7·10¹⁵). Scale shape: one tiny max() broadcast +
    // a pure map-side filter — the corpus never shuffles; the per-source
    // report is a vocabulary-bounded agg. This is the sampling design
    // where inclusion must be auditable (reproducing which docs made a
    // training mix); for statistically independent draws swap h for
    // rand() with a per-run seed — same plan shape.
    Q("q126_weighted_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val mx = docs.agg(max(col("n_chars")).as("wmax"))
        docs.crossJoin(broadcast(mx))
          .withColumn("h", expr("((doc_id % 1000003) * 2654435761) % 1000003"))
          .filter(col("h") * col("wmax") < col("n_chars") * lit(1000003L))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"),
               sum(col("n_chars")).as("chars_sampled"))
          .orderBy(col("source"))
      },
      Some("""
        WITH mx AS (SELECT MAX(n_chars) AS wmax FROM documents)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
        FROM documents, mx
        WHERE ((doc_id % 1000003) * 2654435761) % 1000003 * wmax
              < n_chars * 1000003
        GROUP BY source ORDER BY source
      """)),

    // ---------------------------------------------------------------
    // q148: BPE tokenizer TRAINING (r9) — learn the first 5 merge
    // rules from the corpus (operators/BpeTrain): one corpus scan for
    // the word-frequency table, then every sweep is vocabulary-bounded
    // (the Sennrich/HF trainer design — the property that makes BPE
    // training feasible at 100 TB). Weighted pair counts are integer
    // sums, the winner is lexicographically tie-broken, and merge
    // application is the fold≡window construction proven in the
    // operator's scaladoc — as of r10 INCLUDING self-pairs
    // (identical-symbol runs merge greedily at even run offsets; the
    // twin mirrors this with the per-run parity CTE). The natural
    // corpus never elects a self-pair within 5 sweeps, so two
    // synthetic run words dominate sweeps 1-3 by construction
    // ([[bpeWords]]) to keep the parity path under the oracle gate.
    // Output: the ordered merge table, i.e. the tokenizer artifact
    // itself, hash-compared against a DuckDB twin that unrolls the
    // same 5 sweeps as generated CTEs.
    Q("q148_bpe_train",
      (s, d) => {
        graft.operators.BpeTrain.run(bpeWords(s, d), merges = 5)
          .orderBy(col("sweep"))
      },
      Some(s"""
        WITH $BpeBaseSql, ${graft.operators.BpeTrain.oracleCtes(5)}
        SELECT * FROM (
          ${(1 to 5).map(i =>
            s"SELECT $i AS sweep, a AS lsym, b AS rsym, n FROM m$i")
            .mkString("\n          UNION ALL ")}
        ) ORDER BY sweep
      """)),

    // ---------------------------------------------------------------
    // q149: BPE fertility — the APPLY side closing q148's train loop:
    // encode the corpus with the learned merge table and report the
    // tokenizer-evaluation numbers a vocab decision is made on —
    // total chars vs total post-merge tokens (weighted by word freq)
    // and chars-per-token (the compression/fertility metric). Encoding
    // happens on the same vocabulary-bounded segmentation frame the
    // trainer already holds (corpus-weighted by freq), so the apply
    // pass adds NO corpus scan — the q148 scale argument verbatim.
    Q("q149_bpe_fertility",
      (s, d) => {
        val (_, segs) =
          graft.operators.BpeTrain.trainState(bpeWords(s, d), merges = 5)
        segs.agg(
            count(lit(1)).as("n_words"),
            sum(expr("freq * length(word)")).as("total_chars"),
            sum(expr("freq * size(syms)")).as("total_tokens"))
          .select(col("n_words"), col("total_chars"), col("total_tokens"),
            expr("total_chars * 10000 div total_tokens")
              .as("chars_per_token_e4"))
      },
      Some(s"""
        WITH $BpeBaseSql, ${graft.operators.BpeTrain.oracleCtes(5)}
        SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(freq * length(word)) AS BIGINT) AS total_chars,
               CAST(SUM(freq * len(syms)) AS BIGINT) AS total_tokens,
               CAST(SUM(freq * length(word)) * 10000
                    // SUM(freq * len(syms)) AS BIGINT)
                 AS chars_per_token_e4
        FROM w5
      """))
  )

  /** Self-pair coverage words for the BPE pair (q148/q149): the
    * natural corpus never elects an identical-symbol pair within 5
    * sweeps, so these two run words — one even run (composite
    * self-pair (zz,zz) reachable), one odd run (trailing-singleton
    * parity) — carry a frequency that dominates every corpus pair
    * count at any graded SF (corpus adjacent-pair totals are bounded
    * by total chars ≪ 10⁹), pinning sweeps 1-3 to (z,z) → (zz,z) (the
    * lexicographic tie-break) → (zz,zz) on BOTH engines and leaving
    * sweeps 4-5 organic.
    */
  // def, not val: referenced from `all`'s eager oracle strings, which
  // initialize before any val declared below `all` in this object
  private def RunWords = Seq(("zzzz", 1000000000L), ("zzz", 1000000000L))

  /** Shared Spark-side word-frequency front of the BPE pair: corpus
    * token counts ∪ [[RunWords]] (re-summed — the vocab-sized second
    * aggregate is noise next to the corpus scan).
    */
  private def bpeWords(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val corpus = Tables.documents(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    corpus.unionByName(RunWords.toDF("word", "freq"))
      .groupBy(col("word")).agg(sum(col("freq")).as("freq"))
  }

  /** Shared oracle front of the BPE pair (q148 train / q149 apply):
    * word frequencies (∪ the same run words) + initial character
    * segmentations.
    */
  private def BpeBaseSql: String =
    s"""toks AS (
       |          SELECT unnest($DTokens) AS tok FROM documents
       |        ), wf0 AS (
       |          SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
       |          FROM toks GROUP BY tok
       |          UNION ALL SELECT * FROM (VALUES
       |            ${RunWords.map { case (w, f) =>
                      s"('$w', CAST($f AS BIGINT))" }.mkString(", ")})
       |            v(word, freq)
       |        ), wf AS (
       |          SELECT word, CAST(SUM(freq) AS BIGINT) AS freq
       |          FROM wf0 GROUP BY word
       |        ), w0 AS (
       |          SELECT word, freq,
       |                 list_transform(range(1, length(word) + 1),
       |                   j -> substring(word, j, 1)) AS syms
       |          FROM wf
       |        )""".stripMargin
}
