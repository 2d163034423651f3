package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.text.TextAnalysis

/** Text-analysis surface over the `documents` table — the training-data
  * pipeline operators (token counting, quality scoring, language ID,
  * n-gram profiling, fingerprinting) registered as driver-checkable
  * queries. All per-document work is codegen'd column expressions: the
  * 100 TB cost of q31-q33/q35 is one scan, q34 is one scan + one
  * aggregate shuffle keyed by n-gram.
  *
  * Determinism for the double-valued scores: both engines compute the
  * identical IEEE-754 expression tree, and results are emitted as
  * `floor(x * 10000)` bigints — floor of identical doubles is identical,
  * sidestepping engine round()-formatting differences.
  */
object TextQueries {

  // one shared definition of the oracle fragments — see OracleSql
  private val DTokens = OracleSql.DTokens
  private def sqlList(xs: Seq[String]): String = OracleSql.sqlList(xs)

  /** The q145 query-term set — also the text leg of the hybrid fusion
    * (q152); one definition so the two rankings stay the same query.
    */
  private[queries] val Bm25Terms = Seq("vector", "stream", "hash")

  /** q145's scoring core — e6 BM25 (k1=1.2, b=0.75) per matching doc
    * for [[Bm25Terms]]: (doc_id, n_matched, score_e6). Shared with
    * q152's hybrid fusion; arithmetic documented at the q145 entry.
    */
  private[queries] def bm25Scored(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
    val corpus = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(col("ts")).cast("bigint")).as("t_tokens"))
    val tf = docs
      .select(col("doc_id"), size(col("ts")).cast("bigint").as("dl"),
        explode(col("ts")).as("tok"))
      .filter(col("tok").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(corpus))
      .withColumn("idf_e6", expr(
        "cast(floor(ln((2.0D * n_docs - 2*df + 1) / (2*df + 1) + 1.0D)" +
          " * 1000000) as bigint)"))
      .withColumn("denom_e3",
        expr("1000*tf + 300 + (dl * 900 * n_docs) div t_tokens"))
      .withColumn("contrib_e6",
        expr("(idf_e6 * ((tf * 2200000) div denom_e3)) div 1000"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"),
        sum(col("contrib_e6")).as("score_e6"))
  }

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // q31: token statistics — whitespace tokens, distinct tokens, and
    // the BPE-ish pre-tokenizer symbol count, per document.
    Q("q31_token_stats",
      (s, d) => {
        val text = col("text")
        Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.tokenCount(text).cast("bigint").as("n_tokens"),
          TextAnalysis.distinctTokenCount(text).cast("bigint").as("n_distinct"),
          TextAnalysis.bpeTokenCount(text).cast("bigint").as("n_bpe"),
          col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        SELECT doc_id,
               CAST(len($DTokens) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct($DTokens)) AS BIGINT) AS n_distinct,
               CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpe,
               n_chars
        FROM documents ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q32: quality scoring — stopword ratio, punctuation ratio, mean
    // token length, and the composite score, scaled to floor(x*1e4).
    Q("q32_quality_score",
      (s, d) => {
        val text = col("text")
        def scaled(c: org.apache.spark.sql.Column) = floor(c * 10000)
        Tables.documents(s, d).select(
          col("doc_id"),
          scaled(TextAnalysis.stopwordRatio(text)).as("stop_ratio_e4"),
          scaled(TextAnalysis.punctRatio(text)).as("punct_ratio_e4"),
          scaled(TextAnalysis.meanTokenLen(text)).as("mean_tok_len_e4"),
          scaled(TextAnalysis.qualityScore(text)).as("quality_e4"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, text, $DTokens AS ts FROM documents
        ), m AS (
          SELECT doc_id,
            len(ts) AS n_tok,
            len(list_filter(ts, x -> list_contains(${sqlList(TextAnalysis.EnglishStopwords)}, x))) AS n_stop,
            len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
            length(text) AS n_chars,
            coalesce(list_sum(list_transform(ts, x -> length(x))), 0) AS tok_chars
          FROM t
        ), r AS (
          SELECT doc_id,
            CAST(n_stop AS DOUBLE) / greatest(n_tok, 1) AS stop_ratio,
            CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
            CAST(tok_chars AS DOUBLE) / greatest(n_tok, 1) AS mean_tok_len,
            n_tok
          FROM m
        )
        SELECT doc_id,
               CAST(floor(stop_ratio * 10000) AS BIGINT) AS stop_ratio_e4,
               CAST(floor(punct_ratio * 10000) AS BIGINT) AS punct_ratio_e4,
               CAST(floor(mean_tok_len * 10000) AS BIGINT) AS mean_tok_len_e4,
               CAST(floor(((least(CAST(n_tok AS DOUBLE) / 20.0, 1.0)
                          + least(stop_ratio * 4.0, 1.0)
                          + greatest(0.0, 1.0 - punct_ratio * 4.0)) / 3.0) * 10000) AS BIGINT) AS quality_e4
        FROM r ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q33: language identification — marker-token argmax, checked
    // against the table's labeled lang, with per-language accuracy.
    Q("q33_lang_id",
      (s, d) => {
        // corpus form of TextAnalysis.langId: explode tokens once and
        // take all marker counts in one codegen'd aggregate (the
        // column form runs one interpreted filter pass per language per
        // row). explode_outer keeps token-less docs (pred = unknown).
        val markers = TextAnalysis.LangMarkers
        val scoreAggs = markers.map { case (lang, ms) =>
          count(when(col("tok").isin(ms: _*), lit(1))).as(s"s_$lang")
        }
        val best = greatest(markers.map { case (lang, _) => col(s"s_$lang") }: _*)
        val predChain = markers.foldLeft(when(best === 0, lit("unknown"))) {
          case (acc, (lang, _)) => acc.when(col(s"s_$lang") === best, lit(lang))
        }
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode_outer(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(scoreAggs.head, scoreAggs.tail: _*)
          .select(col("lang"), predChain.as("pred"))
          .groupBy(col("lang"), col("pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("pred"))
      },
      Some {
        val scores = TextAnalysis.LangMarkers.map { case (lang, ms) =>
          s"len(list_filter(ts, x -> list_contains(${sqlList(ms)}, x))) AS s_$lang"
        }.mkString(",\n            ")
        val langs = TextAnalysis.LangMarkers.map(_._1)
        val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
        val caseChain = langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
        s"""
        WITH t AS (
          SELECT doc_id, lang, $DTokens AS ts FROM documents
        ), sc AS (
          SELECT doc_id, lang,
            $scores
          FROM t
        )
        SELECT lang,
               CASE WHEN $best = 0 THEN 'unknown' $caseChain END AS pred,
               COUNT(*) AS n
        FROM sc GROUP BY lang, pred ORDER BY lang, pred
        """
      }),

    // ---------------------------------------------------------------
    // q34: corpus n-gram profile — top-50 word bigrams (count desc,
    // bigram asc: total order, so top-k is deterministic). One scan +
    // one agg shuffle keyed by bigram; top-k is TakeOrdered, no global
    // sort materialization.
    Q("q34_ngram_top",
      (s, d) => {
        Tables.documents(s, d)
          .select(explode(TextAnalysis.wordNgrams(col("text"), 2)).as("bigram"))
          .groupBy(col("bigram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(50)
      },
      Some(s"""
        SELECT bigram, COUNT(*) AS n
        FROM (
          SELECT unnest(list_transform(range(1, len(ts)),
                                       i -> ts[i] || ' ' || ts[i + 1])) AS bigram
          FROM (SELECT $DTokens AS ts FROM documents)
        )
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
      """)),

    // ---------------------------------------------------------------
    // q55: TF-IDF — term frequency per (doc, token) joined with smooth
    // inverse document frequency (ln((N+1)/(df+1)) + 1), top-3 terms
    // per document. Two aggregates keyed by (doc,token) and token — the
    // same shuffles at any corpus size; N broadcasts as a 1-row join.
    Q("q55_tfidf",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val tf = toks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("tok"))
        tf.join(df, "tok")
          .crossJoin(broadcast(n))
          .withColumn("tfidf",
            col("tf") * (log((col("n_docs") + 1).cast("double")
              / (col("df") + 1)) + 1))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("rn").as("rank"), col("tok"),
            floor(col("tfidf") * 10000).as("tfidf_e4"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest($DTokens) AS tok FROM documents
        ), tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
        ), df AS (
          SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.tok,
                 tf.tf * (ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)) + 1) AS tfidf
          FROM tf JOIN df USING (tok), n
        ), ranked AS (
          SELECT doc_id, tok, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, tok) AS rank
          FROM scored
        )
        SELECT doc_id, rank, tok, CAST(floor(tfidf * 10000) AS BIGINT) AS tfidf_e4
        FROM ranked WHERE rank <= 3
        ORDER BY doc_id, rank
      """)),

    // ---------------------------------------------------------------
    // q56: stratified sampling — class-balanced corpus subsetting (the
    // train-set curation step): downsample the dominant language to
    // ~30% while keeping the rest. The keep decision is a pure function
    // of the row — 56-bit md5 key hash under an integer threshold
    // (floor(0.3·2^56)) — so the sample is reproducible across runs,
    // partitionings, AND engines: the DuckDB oracle reproduces the
    // exact membership, checked via per-stratum counts + a doc_id-sum
    // witness. (sampleBy's seeded Bernoulli is engine-defined — it
    // could only ever be rows-only; at 100 TB hash-threshold sampling
    // is also re-runnable per partition with no RNG-state coupling.)
    // Proportion contract pinned by TextQueriesSpec.
    Q("q56_stratified_sample",
      (s, d) => {
        // floor(0.3 * 2^56): integer so both engines compare exactly
        val thresholdEn = 21617278211378380L
        val h56 = conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":q56"))), 1, 14), 16, 10).cast("bigint")
        Tables.documents(s, d)
          .filter(col("lang") =!= "en" || h56 < thresholdEn)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("doc_id")).as("sum_doc_id"))
          .orderBy(col("lang"))
      },
      Some("""
        SELECT lang, COUNT(*) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
        FROM documents
        WHERE lang <> 'en'
           OR CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':q56'), 1, 14) AS BIGINT)
              < 21617278211378380
        GROUP BY lang ORDER BY lang
      """)),

    // ---------------------------------------------------------------
    // q35: document fingerprinting — order-sensitive rolling hash over
    // normalized tokens, per doc. The hash is built from cross-engine
    // primitives (md5-derived 56-bit token hash, explicit mod-2^56
    // shift-xor combine — see TextAnalysis.fingerprint), so the DuckDB
    // oracle reproduces every fingerprint bit-exactly via list_reduce.
    Q("q35_fingerprint",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        SELECT doc_id,
               list_reduce(
                 list_concat([CAST(0 AS BIGINT)],
                   list_transform($DTokens,
                     t -> CAST('0x' || substring(md5(t), 1, 14) AS BIGINT))),
                 (h, c) -> xor(xor((h * 32) % 72057594037927936, h >> 51), c))
                 AS fp
        FROM documents ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q86: text normalization — the cleaning pass that PRECEDES every
    // dedup/quality operator in a real pipeline (C4-style): strip
    // URLs, collapse runs of whitespace, trim, lowercase. The fixture
    // corpus is already clean, so (the q59 pattern) each doc gets a
    // deterministic dirty suffix — a URL and ragged whitespace —
    // appended first; the normalizer must remove exactly that. Both
    // engines run the same regex chain (the patterns stay inside the
    // RE2 ∩ java.util.regex common dialect, like q59's) and results
    // are compared by md5, so one divergent character anywhere fails
    // the hash. One scan, no shuffle beyond the ordering contract.
    Q("q86_text_normalize",
      (s, d) => {
        val raw = concat(col("text"),
          lit(" see https://site"), col("doc_id"),
          lit(".example/path?q=1&r=2 "), lit("  trailing   runs "))
        val noUrl = regexp_replace(raw, "https?://\\S+", " ")
        val norm = lower(trim(regexp_replace(noUrl, "\\s+", " ")))
        Tables.documents(s, d)
          .select(col("doc_id"),
            regexp_count(raw, lit("https?://\\S+")).as("n_urls"),
            length(raw).cast("bigint").as("n_chars_raw"),
            length(norm).cast("bigint").as("n_chars_norm"),
            md5(norm).as("norm_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH raw AS (
          SELECT doc_id,
                 text || ' see https://site' || doc_id
                      || '.example/path?q=1&r=2 ' || '  trailing   runs '
                   AS t
          FROM documents
        ),
        norm AS (
          SELECT doc_id,
                 len(regexp_extract_all(t, 'https?://\S+')) AS n_urls,
                 CAST(len(t) AS BIGINT) AS n_chars_raw,
                 lower(trim(regexp_replace(
                   regexp_replace(t, 'https?://\S+', ' ', 'g'),
                   '\s+', ' ', 'g'))) AS nt
          FROM raw
        )
        SELECT doc_id, CAST(n_urls AS INT) AS n_urls, n_chars_raw,
               CAST(len(nt) AS BIGINT) AS n_chars_norm, md5(nt) AS norm_md5
        FROM norm ORDER BY doc_id
      """)),

    // ---------------------------------------------------------------
    // q88: exact heavy hitters over an UNBOUNDED key domain, two-pass —
    // the scale-safe form of "top tokens". q34/q63's word-keyed
    // aggregates are exact but carry reducer state ∝ |vocabulary|; at
    // web scale the vocabulary is corpus-sized, so pass 1 runs the
    // Misra-Gries sketch (O(capacity) state per partial, mergeable —
    // graft.expressions.MisraGriesAgg) to get ≤ capacity candidates
    // that PROVABLY include every token with frequency > N/(cap+1),
    // and pass 2 exact-counts ONLY the candidates via a broadcast
    // semi-join (reducer state ∝ capacity, never ∝ vocabulary). The
    // top-20 cutoff must sit above the guarantee line for the
    // two-pass result to equal the oracle's full exact top-20 —
    // MisraGriesSpec asserts the margin at BOTH the oracle scale
    // (sf0.01) and the bench scale (sf0.1), so corpus growth can't
    // silently void the equals-exact argument. Capacity 1024 (r10;
    // was 64): the sf1-amplified oracle sweep showed capacity must
    // track vocabulary growth — the parallel-universes cipher splits
    // every word into R equal-frequency variants (~10× vocabulary,
    // ties by construction), pushing the top-20 line below N/65;
    // 1024 restores a ≥3× margin at every validated scale while the
    // state stays parameter-bounded (1024 counters ≪ any vocabulary
    // the sketch exists for).
    Q("q88_heavy_hitters",
      (s, d) => {
        // persisted: both passes consume the exploded tokens, and the
        // regex tokenization dominates either pass alone
        val toks = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cands = toks
          .agg(graft.expressions.MisraGriesAgg.misraGries(col("tok"), 1024).as("mg"))
          .select(explode(map_keys(col("mg"))).as("tok"))
        toks.join(broadcast(cands), "tok")
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok"))
          .limit(20)
      },
      Some(s"""
        WITH toks AS (
          SELECT unnest($DTokens) AS tok FROM documents
        )
        SELECT tok, COUNT(*) AS n
        FROM toks GROUP BY tok ORDER BY n DESC, tok LIMIT 20
      """)),

    // ---------------------------------------------------------------
    // q91: vocabulary coverage — the tokenizer-budget planning query:
    // what fraction of all token OCCURRENCES do the k most frequent
    // token types cover, at the k's a vocab budget would consider. A
    // tokenizer team reads this table to pick vocab size; a data team
    // reads it as the corpus's Zipf head-heaviness.
    //
    // Scale shape: one vocabulary-keyed count (state ∝ vocab, the
    // q63 family), then the coverage curve through GlobalRank's
    // two-phase cumulative sum — exact global rank AND running sum
    // with no single-task window anywhere (the naive
    // `SUM(n) OVER (ORDER BY n DESC)` funnels the whole vocabulary
    // through one task at 100 TB). Integer-division scaling keeps the
    // fraction exact cross-engine.
    Q("q91_vocab_coverage",
      (s, d) => {
        // checkpoints sized to the synthetic corpus's 31-type
        // vocabulary so the report carries a real curve; a production
        // run passes the 2^10..2^17 ladder a tokenizer budget spans
        val ks = Seq(1L, 5L, 10L, 20L, 30L)
        val counts = Tables.documents(s, d)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        graft.operators.GlobalRank.withGlobalCumSum(counts,
            Seq(col("n").desc, col("tok")), col("n"),
            "k", "cum_tokens", "total_tokens")
          .filter(col("k").isin(ks: _*))
          .select(col("k"), col("n").as("kth_freq"), col("cum_tokens"),
            expr("(cum_tokens * 10000) div total_tokens").as("coverage_e4"))
          .orderBy(col("k"))
      },
      Some(s"""
        WITH toks AS (SELECT unnest($DTokens) AS tok FROM documents),
        counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
        ranked AS (
          SELECT tok, n,
                 ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS k,
                 CAST(SUM(n) OVER (ORDER BY n DESC, tok
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
                 CAST(SUM(n) OVER () AS BIGINT) AS total_tokens
          FROM counts
        )
        SELECT k, n AS kth_freq, cum_tokens,
               CAST((cum_tokens * 10000) // total_tokens AS BIGINT) AS coverage_e4
        FROM ranked WHERE k IN (1, 5, 10, 20, 30)
        ORDER BY k
      """)),

    // ---------------------------------------------------------------
    // q96: per-language heavy hitters — q88's two-pass pattern as a
    // GROUPED aggregate: one Misra-Gries sketch per language (the
    // per-key ObjectHashAggregate shape the pinned sort-fallback
    // threshold protects — Sessions.scala), then exact recount of the
    // per-language candidates via a broadcast semi-join, top-5 per
    // language through the two-phase TopK. Reducer state is
    // O(langs × capacity), never ∝ vocabulary. On this corpus the
    // capacity (32) exceeds the vocabulary (31), so the sketch is
    // exact by construction and the oracle equality is unconditional;
    // at web scale the same per-language N/(capacity+1) margin
    // argument as q88 applies.
    Q("q96_heavy_hitters_by_lang",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // capacity 512 (r10; was 32): the q88 sf1amp lesson applied
        // per-language — amplified vocabularies need sketch headroom
        val cands = toks.groupBy(col("lang"))
          .agg(graft.expressions.MisraGriesAgg.misraGries(col("tok"), 512).as("mg"))
          .select(col("lang"), explode(map_keys(col("mg"))).as("tok"))
        val counts = toks.join(broadcast(cands), Seq("lang", "tok"))
          .groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TopK.perKey(counts, Seq("lang"),
            Seq(col("n").desc, col("tok")), 5)
          .select(col("lang"), col("rank"), col("tok"), col("n"))
          .orderBy(col("lang"), col("rank"))
      },
      Some(s"""
        WITH toks AS (
          SELECT lang, unnest($DTokens) AS tok FROM documents
        ), counts AS (
          SELECT lang, tok, COUNT(*) AS n FROM toks GROUP BY lang, tok
        ), ranked AS (
          SELECT lang, tok, n,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY n DESC, tok) AS rank
          FROM counts
        )
        SELECT lang, CAST(rank AS INT) AS rank, tok, n
        FROM ranked WHERE rank <= 5
        ORDER BY lang, rank
      """)),

    // ---------------------------------------------------------------
    // q94: quality–length correlation — the curation diagnostic that
    // tells you whether a length floor and a quality gate are
    // REDUNDANT filters (r → 1: keep one) or independent signals
    // (r → 0: keep both), per language. Pearson r from exact integer
    // sums (token count and the q32 quality integer are bigints on
    // both engines; every Σ is exact long arithmetic, then ONE
    // identical double expression), so floor(r·1e4) is deterministic
    // cross-engine — never engine-native corr(), whose accumulation
    // order is unspecified. Scale: one scan, one lang-keyed aggregate.
    Q("q94_quality_length_corr",
      (s, d) => {
        val stats = Tables.documents(s, d).select(
            col("lang"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("x"),
            floor(TextAnalysis.qualityScore(col("text")) * 10000).as("y"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        // zero-variance guard: a language with one document (or one
        // constant feature) has an undefined r — emit NULL on BOTH
        // engines instead of Spark's floor(NaN)=0 vs DuckDB's
        // CAST(NaN) error
        val vx = col("n") * col("sxx") - col("sx") * col("sx")
        val vy = col("n") * col("syy") - col("sy") * col("sy")
        stats.select(col("lang"), col("n"),
            when(vx > 0 && vy > 0,
              floor(
                ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
                  / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
                * 10000)).as("pearson_e4"))
          .orderBy(col("lang"))
      },
      Some(s"""
        WITH t AS (
          SELECT lang, text, $DTokens AS ts FROM documents
        ), m AS (
          SELECT lang,
                 ${OracleSql.qualityMetrics(TextAnalysis.EnglishStopwords)}
          FROM t
        ), v AS (
          SELECT lang, CAST(n_tok AS BIGINT) AS x,
                 ${OracleSql.QualityE4} AS y
          FROM m
        ), a AS (
          SELECT lang, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM v GROUP BY lang
        )
        SELECT lang, n,
               CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                    THEN CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                         * 10000) AS BIGINT)
               END AS pearson_e4
        FROM a ORDER BY lang
      """)),

    // ---------------------------------------------------------------
    // q100: n-gram novelty curve — per document, the fraction of its
    // distinct 3-grams whose FIRST corpus occurrence (min doc_id over
    // containing docs) is this document. The dataset-ordering
    // diagnostic: a corpus whose late documents add no novel grams is
    // saturated (stop crawling / cut the source); near-zero novelty
    // for one doc flags it as assembled from existing content even
    // when no single near-dup pair fires.
    //
    // Scale shape: explode distinct grams once → one gram-keyed MIN
    // aggregate (the same inverted-index shuffle the dedup family
    // uses) → join back on gram → one doc-keyed count. No all-pairs
    // anything; exact integers end to end.
    Q("q100_ngram_novelty",
      (s, d) => {
        val dg = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(
              TextAnalysis.wordNgrams(col("text"), 3))).as("gram"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // cache-race guard: the firsts aggregate and the join probe are
        // independent shuffle stages over this frame
        dg.count()
        val firsts = dg.groupBy(col("gram"))
          .agg(min(col("doc_id")).as("first_doc"))
        dg.join(firsts, "gram")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum((col("doc_id") === col("first_doc")).cast("long")).as("novel"))
          .withColumn("novelty_e4", expr("(novel * 10000) div n_grams"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH g AS (
          SELECT doc_id, grams FROM (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(ts) - 1),
                     i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]))
                     AS grams
            FROM (SELECT doc_id, $DTokens AS ts FROM documents)
          ) WHERE len(grams) > 0
        ),
        dg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
        f AS (SELECT gram, MIN(doc_id) AS first_doc FROM dg GROUP BY gram)
        SELECT dg.doc_id,
               COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN dg.doc_id = f.first_doc THEN 1 ELSE 0 END)
                    AS BIGINT) AS novel,
               CAST((CAST(SUM(CASE WHEN dg.doc_id = f.first_doc
                                   THEN 1 ELSE 0 END) AS BIGINT) * 10000)
                    // COUNT(*) AS BIGINT) AS novelty_e4
        FROM dg JOIN f USING (gram)
        GROUP BY dg.doc_id
        ORDER BY dg.doc_id
      """)),

    // ---------------------------------------------------------------
    // q106: pairwise source-overlap matrix (r8) — shared distinct
    // 3-grams and Jaccard between every pair of sources: the
    // cross-source redundancy diagnostic read next to q99's dup rates
    // and q68's mixture weights (two sources with high overlap
    // shouldn't both be upweighted).
    //
    // Scale: posting-list shape, never all-pairs on documents — ONE
    // gram-keyed aggregate builds the distinct source set per gram
    // (collect_set; bounded by #sources, ~20), and source pairs are
    // emitted MAP-SIDE from each posting list by a HOF over the sorted
    // set — the gram-keyed self-equi-join this replaces (r8 shape,
    // 6.4 s driver-benched, the registry's slowest) paid a second
    // full shuffle of the (source, gram) frame plus the join itself.
    // Per-gram pair fan-out is still bounded by (#sources choose 2).
    // Source gram-set sizes fall out of the same aggregated frame (one
    // exploded pass over #grams rows — no rescan of documents). Grams
    // travel as xxhash64 longs (the q61 pattern; the oracle joins raw
    // strings, so a collision would surface as a hash mismatch, not
    // pass silently). Sizes are a #sources-row frame → broadcast joins.
    Q("q106_source_overlap",
      (s, d) => {
        val byGram = Tables.documents(s, d)
          .select(col("source"),
            explode(array_distinct(
              TextAnalysis.wordNgrams(col("text"), 3))).as("g"))
          .select(col("source"), xxhash64(col("g")).as("gram"))
          .groupBy(col("gram"))
          .agg(sort_array(collect_set(col("source"))).as("srcs"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // cache-race guard (the DedupQueries prefixIndex pattern): the
        // sizes aggregate and the pair explode are independent shuffle
        // stages that otherwise both recompute the cold gram aggregate
        byGram.count()
        val sizes = byGram.select(explode(col("srcs")).as("source"))
          .groupBy(col("source")).agg(count(lit(1)).as("n"))
        val inter = byGram
          .filter(size(col("srcs")) >= 2)
          .select(explode(expr(
            """flatten(transform(srcs, (a, i) ->
                 transform(slice(srcs, i + 2, size(srcs)),
                   b -> named_struct('src_a', a, 'src_b', b))))""")).as("p"))
          .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
          .agg(count(lit(1)).as("n_shared"))
        inter
          .join(broadcast(sizes.select(col("source").as("src_a"),
            col("n").as("n_a"))), "src_a")
          .join(broadcast(sizes.select(col("source").as("src_b"),
            col("n").as("n_b"))), "src_b")
          .select(col("src_a"), col("src_b"), col("n_shared"),
            col("n_a"), col("n_b"),
            expr("(n_shared * 10000) div (n_a + n_b - n_shared)")
              .as("jaccard_e4"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some(s"""
        WITH g AS (
          SELECT source,
                 list_distinct(list_transform(range(1, len(ts) - 1),
                   i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]))
                   AS grams
          FROM (SELECT source, $DTokens AS ts FROM documents)
        ),
        sg AS (SELECT DISTINCT source, unnest(grams) AS gram FROM g),
        sz AS (SELECT source, COUNT(*) AS n FROM sg GROUP BY source),
        p AS (
          SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
          FROM sg a JOIN sg b USING (gram)
          WHERE a.source < b.source GROUP BY 1, 2
        )
        SELECT p.src_a, p.src_b, CAST(p.n_shared AS BIGINT) AS n_shared,
               CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
               CAST((p.n_shared * 10000) // (za.n + zb.n - p.n_shared)
                    AS BIGINT) AS jaccard_e4
        FROM p
        JOIN sz za ON za.source = p.src_a
        JOIN sz zb ON zb.source = p.src_b
        ORDER BY src_a, src_b
      """)),

    // ---------------------------------------------------------------
    // q114: sentence-granularity dedup rate per source — a finer lens
    // than q39's whole-doc digests and q74's byte spans: a sentence is
    // duplicated when it occurs in ≥2 distinct documents anywhere in
    // the corpus, and each source is scored by the fraction of its
    // sentence occurrences that are corpus-duplicated (boilerplate
    // detector). Shape: one explode, one sentence-keyed aggregation,
    // one sentence-keyed equi-join back — all hash-partitioned on the
    // sentence, never all-pairs, so it scales like exact dedup.
    Q("q114_sentence_dedup",
      (s, d) => {
        val sent = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(split(col("text"), "\\. ")).as("s0"))
          .select(col("doc_id"), col("source"), trim(col("s0")).as("s"))
          .filter(col("s") =!= "")
        val dups = sent.groupBy(col("s"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2)
          .select(col("s"), lit(1L).as("isdup"))
        sent.join(dups, Seq("s"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sent"),
            sum(coalesce(col("isdup"), lit(0L))).as("n_dup"))
          .withColumn("dup_e4", expr("(n_dup * 10000) DIV n_sent"))
          .orderBy(col("source"))
      },
      Some("""
        WITH sent AS (
          SELECT doc_id, source, trim(s) AS s
          FROM (SELECT doc_id, source, unnest(string_split(text, '. ')) AS s
                FROM documents)
          WHERE trim(s) <> ''
        ), dups AS (
          SELECT s FROM sent GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
        )
        SELECT source, COUNT(*) AS n_sent,
               CAST(SUM(CASE WHEN dups.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup,
               CAST((SUM(CASE WHEN dups.s IS NOT NULL THEN 1 ELSE 0 END)
                     * 10000) // COUNT(*) AS BIGINT) AS dup_e4
        FROM sent LEFT JOIN dups ON sent.s = dups.s
        GROUP BY source ORDER BY source
      """)),

    // ---------------------------------------------------------------
    // q115: collocation extraction — the top-15 adjacent-token bigrams
    // by corpus frequency, scored with the Dice coefficient and the
    // conditional probability P(w2|w1), both as exact-integer e4
    // ((a·10000) div b — no floating point, hash-stable). Unigram and
    // bigram counts are two token-keyed aggregations; the score join
    // is bigram⋈unigram equi on each word; the top-15 is Spark's
    // native ORDER BY LIMIT (TakeOrderedAndProject — per-task heaps,
    // no global sort), so nothing funnels at scale.
    Q("q115_collocations",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val uni = docs
          .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        val bi = docs
          .select(explode(
            graft.text.TextAnalysis.wordNgrams(col("text"), 2)).as("g"))
          .select(split(col("g"), " ").getItem(0).as("w1"),
                  split(col("g"), " ").getItem(1).as("w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
        val scored = bi
          .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"),
                "w1")
          .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"),
                "w2")
          .select(col("w1"), col("w2"), col("n"), col("c1"), col("c2"),
            expr("(2 * n * 10000) DIV (c1 + c2)").as("dice_e4"),
            expr("(n * 10000) DIV c1").as("pcond_e4"))
        graft.operators.TopK.global(scored,
            Seq(col("n").desc, col("w1"), col("w2")), 15)
          .orderBy(col("rank"))
      },
      Some(s"""
        WITH t AS (SELECT $DTokens AS ts FROM documents),
        uc AS (
          SELECT w, COUNT(*) AS c FROM (SELECT unnest(ts) AS w FROM t)
          GROUP BY w
        ), bc AS (
          SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
                 COUNT(*) AS n
          FROM (SELECT unnest(list_transform(range(1, len(ts)),
                         i -> ts[i] || ' ' || ts[i + 1])) AS g
                FROM t WHERE len(ts) >= 2)
          GROUP BY 1, 2
        )
        SELECT w1, w2, n, c1, c2, dice_e4, pcond_e4,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w1, w2) AS INT) AS rank
        FROM (
          SELECT bc.w1, bc.w2, CAST(bc.n AS BIGINT) AS n,
                 CAST(u1.c AS BIGINT) AS c1, CAST(u2.c AS BIGINT) AS c2,
                 CAST((2 * bc.n * 10000) // (u1.c + u2.c) AS BIGINT) AS dice_e4,
                 CAST((bc.n * 10000) // u1.c AS BIGINT) AS pcond_e4
          FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w
        )
        ORDER BY n DESC, w1, w2 LIMIT 15
      """)),

    // ---------------------------------------------------------------
    // q116: deterministic per-source uniform sample — exactly k docs
    // per source, chosen by md5(doc_id) order. The hash is a fixed
    // pseudo-random permutation both engines compute identically, so
    // the "reservoir" is reproducible run-to-run and engine-to-engine
    // (the property that matters for training-data sampling: the same
    // corpus always yields the same sample). Runs through
    // [[graft.operators.TopK.perKey]] — the two-phase per-key top-k —
    // so a skewed source (one source = 90% of the corpus) cannot
    // funnel into a single task the way a bare ranking window would.
    Q("q116_sample_per_source",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"),
            md5(col("doc_id").cast("string")).as("skey"))
        graft.operators.TopK.perKey(docs, Seq("source"),
            Seq(col("skey"), col("doc_id")), 5)
          .select(col("source"), col("rank"), col("doc_id"), col("n_chars"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""
        SELECT source, rank, doc_id, n_chars
        FROM (SELECT source, doc_id, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
              FROM documents)
        WHERE rank <= 5
        ORDER BY source, rank
      """)),

    // ---------------------------------------------------------------
    // q145: BM25 ranked retrieval (r9) — the search side of the corpus
    // tooling: given a fixed query-term set, rank documents by
    // Okapi BM25 (k1=1.2, b=0.75) and return the top 10. q55's TF-IDF
    // profiles every document; this is the other direction — a
    // QUERY against the corpus (eval-set retrieval, curation
    // spot-checks, "which training docs match this probe" audits).
    //
    // Scale shape: the corpus is scanned ONCE; dl (doc length) is a
    // map-side array size, the query terms filter the exploded tokens
    // BEFORE any shuffle (posting-list selectivity — only rows for the
    // ≤ |Q| query terms survive), tf is (doc,term)-keyed, df/N/T are
    // term-keyed and scalar aggregates whose frames broadcast, and the
    // top-10 runs through TopK.global's TakeOrderedAndProject shape
    // (per-task heaps, no global sort). Nothing anywhere is keyed by
    // less than doc or term, so the plan survives any corpus size.
    //
    // Determinism: the saturating tf side is EXACT integer fixed-point
    // — denom_e3 = 1000·tf + 300 + (dl·900·N) div T is the e3-scaled
    // BM25 denominator tf + k1·(1−b+b·dl/avgdl), and the tf part
    // (tf·2200000) div denom_e3 is e3-scaled tf·(k1+1)/denom (all
    // terms nonnegative, so Spark `div` ≡ DuckDB `//`). The idf is
    // the one deliberate double: ln(odds+1) on identical IEEE inputs
    // floored at e6 — the q55 precedent (both engines evaluate the
    // same expression tree; floor of identical doubles is identical).
    Q("q145_bm25",
      (s, d) => {
        graft.operators.TopK.global(bm25Scored(s, d),
            Seq(col("score_e6").desc, col("doc_id")), 10)
          .select(col("rank"), col("doc_id"), col("n_matched"),
            col("score_e6"))
      },
      Some(s"""
        WITH ${OracleSql.bm25AggSql(Bm25Terms)}
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id) AS INT)
                 AS rank,
               doc_id, n_matched, score_e6
        FROM agg ORDER BY score_e6 DESC, doc_id LIMIT 10
      """))
  )
}
