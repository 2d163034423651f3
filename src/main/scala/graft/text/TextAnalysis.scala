package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.let

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, token counting (whitespace + BPE-ish regex), quality
  * scoring (length / punctuation / stopword ratios), n-gram-heuristic
  * language ID, and rolling-hash document fingerprinting. Every operator
  * is a codegen'd column expression — per-document work, embarrassingly
  * parallel, no shuffles — so the 100 TB cost is exactly one scan.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** BPE-ish subword proxy: word runs + individual non-space symbols —
    * the standard pre-tokenizer regex family used by byte-pair encoders.
    */
  val BpePattern = "\\w+|[^\\w\\s]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Word n-grams (as join-key strings). `let`-bound: the token array
    * is evaluated once per row, not once per gram position (which would
    * be O(tokens²) per document — see [[graft.functions.ColumnOps.let]]).
    */
  def wordNgrams(text: Column, n: Int): Column =
    let(tokens(text)) { ts =>
      val count = size(ts) - (n - 1)
      when(count > 0,
        transform(sequence(lit(0), count - 1),
          i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  /** Character n-gram shingles of the normalized text. `let`-bound so
    * the normalization runs once per row, not per shingle position.
    */
  def charShingles(text: Column, n: Int): Column =
    let(lower(trim(text))) { norm =>
      val count = length(norm) - (n - 1)
      when(count > 0,
        array_distinct(transform(sequence(lit(0), count - 1),
          i => substring(norm, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  // ---------------------------------------------------------------
  // Quality scoring

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "that", "this", "be", "are")

  def stopwordCount(text: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  def stopwordRatio(text: Column): Column =
    let(tokens(text)) { ts =>
      size(filter(ts, t => t.isin(EnglishStopwords: _*))).cast("double") /
        greatest(size(ts), lit(1))
    }

  def punctCount(text: Column): Column = regexp_count(text, lit("[^\\w\\s]"))

  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / greatest(length(text), lit(1))

  def meanTokenLen(text: Column): Column =
    let(tokens(text)) { ts =>
      aggregate(transform(ts, t => length(t)), lit(0),
        (acc, l) => acc + l).cast("double") / greatest(size(ts), lit(1))
    }

  /** Composite quality score in [0,1]: long-enough, some stopwords,
    * not punctuation-soup — the standard cheap pre-filter shape for
    * pretraining corpora. `let`-bound: one tokenization feeds all three
    * components (length, stopword-ratio, token count).
    */
  def qualityScore(text: Column): Column =
    let(tokens(text)) { ts =>
      val nTok = size(ts)
      val stopRatio =
        size(filter(ts, t => t.isin(EnglishStopwords: _*))).cast("double") /
          greatest(nTok, lit(1))
      val lenScore = least(nTok.cast("double") / 20.0, lit(1.0))
      val stopScore = least(stopRatio * 4.0, lit(1.0))
      val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
      (lenScore + stopScore + punctPenalty) / 3.0
    }

  // ---------------------------------------------------------------
  // Language identification (marker-token heuristic)

  /** Stopword markers per language — the classic cheap n-gram/stopword
    * heuristic (a real language profile table would be loaded the same
    * way; the mechanism — score per language, argmax — is identical).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "is", "are", "in", "it", "cat", "big"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "y", "de", "que", "gato", "grande"),
    "de" -> Seq("der", "die", "das", "ist", "und", "ein", "eine", "nicht", "mit", "hund", "gross"),
    "fr" -> Seq("le", "la", "les", "est", "et", "un", "une", "sur", "dans", "chat"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** Predicted language: argmax marker-hit count, ties broken by list
    * order, no hits at all → "unknown". Implemented as a max over
    * (score, priority) structs — one pass, no UDF.
    */
  def langId(text: Column): Column =
    let(tokens(text)) { ts =>
      val scored = LangMarkers.zipWithIndex.map { case ((lang, markers), i) =>
        struct(
          size(filter(ts, t => t.isin(markers: _*))).as("score"),
          lit(LangMarkers.size - i).as("prio"),
          lit(lang).as("lang"))
      }
      val best = array_max(array(scored: _*))
      when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(lit("unknown"))
    }

  // ---------------------------------------------------------------
  // Document fingerprinting

  /** 56-bit cross-engine token hash: the first 14 hex digits of the
    * token's md5 read as a big-endian integer. Chosen so DuckDB can
    * compute the identical value (`CAST('0x' || substring(md5(t), 1,
    * 14) AS BIGINT)`), and 56 bits keeps every intermediate of the
    * rolling combine below 2^61 — inside signed-64 range on both
    * engines, so there is no wraparound semantics to reconcile (DuckDB
    * raises on BIGINT overflow where the JVM wraps).
    */
  def tokenHash56(t: Column): Column =
    conv(substring(md5(encode(t, "utf-8")), 1, 14), 16, 10).cast("bigint")

  private val Mod56 = 72057594037927936L // 2^56

  /** Order-sensitive rolling fingerprint: shift-xor fold over the
    * 56-bit md5 hashes of the normalized tokens, wrapped mod 2^56 by an
    * explicit `%` (identical on both engines). Identical normalized
    * token sequences — and only those — collide (up to hash
    * collisions); whitespace/case variations do not change it.
    * NULL text fingerprints as 0, same as empty text — matching the
    * DuckDB twin, where `list_concat([0], NULL)` is `[0]` (a bare
    * fold over the NULL token array would return NULL here only).
    */
  def fingerprint(text: Column): Column =
    coalesce(
      aggregate(
        transform(tokens(text), tokenHash56(_)),
        lit(0L),
        (h, c) => ((h * 32) % Mod56)
          .bitwiseXOR(shiftrightunsigned(h, 51)).bitwiseXOR(c)),
      lit(0L))
}
