package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Near-duplicate signatures as pure column expressions — MinHash and
  * SimHash are computed per document in one projection (no explode, no
  * shuffle); only the tiny band keys are ever joined on. That is the
  * 100 TB shape: signature pass scans once, candidate generation is an
  * equi-join on band hash.
  */
object NearDup {

  /** k-permutation MinHash signature of a (distinct) shingle array:
    * sig[i] = min over shingles of xxhash64(i, shingle). Null-safe for
    * empty arrays (array_min of empty → null; callers filter).
    */
  def minhashSignature(grams: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(grams, g => xxhash64(lit(i), g)))): _*)

  /** Aggregate form of [[minhashSignature]] for exploded (id, gram)
    * rows: all k mins in ONE codegen'd hash aggregate — the array form
    * evaluates k interpreted higher-order passes per row, which
    * dominates at corpus scale. Same hash expressions, same values.
    */
  def minhashAggs(gram: Column, k: Int): Seq[Column] =
    (0 until k).map(i => min(xxhash64(lit(i), gram)).as(s"__mh$i"))

  def minhashAggsToSig(k: Int): Column =
    array((0 until k).map(i => col(s"__mh$i")): _*)

  /** LSH banding: split the signature into `bands` bands of `rows`
    * hashes; band key = xxhash64 of the sub-signature. Two docs with
    * Jaccard s are candidates with prob 1-(1-s^rows)^bands.
    */
  def minhashBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rows + 1, rows)).as("bval"))): _*)

  /** 64-bit SimHash over whitespace tokens (term frequency weighted by
    * occurrence): bit j is set iff more token-hashes have bit j set
    * than clear. Highly-overlapping token multisets land within a few
    * bits of Hamming distance.
    */
  def simhash(text: Column): Column = {
    val hs = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val n = size(hs)
    (0 until 64).map { j =>
      val ones = size(filter(hs, h =>
        shiftrightunsigned(h, j).bitwiseAND(lit(1L)) === lit(1L)))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Aggregate form of [[simhash]] for exploded (id, token-hash) rows:
    * `bits` signed bit-votes in one codegen'd hash aggregate (ones*2 > n
    * ⟺ Σ(±1) > 0 — identical bits for any non-empty token list).
    * `bits` < 64 pairs with a narrower token hash (e.g. the 56-bit
    * cross-engine md5 hash, TextAnalysis.tokenHash56) whose high bits
    * carry no signal.
    */
  def simhashAggs(tokenHash: Column, bits: Int = 64): Seq[Column] =
    (0 until bits).map(j =>
      sum(when(shiftrightunsigned(tokenHash, j).bitwiseAND(lit(1L)) === lit(1L),
        lit(1)).otherwise(lit(-1))).as(s"__sb$j"))

  def simhashAggsToHash(bits: Int = 64): Column =
    (0 until bits).map(j =>
      when(col(s"__sb$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)

  /** [[simhashAggs]]+[[simhashAggsToHash]] as ONE custom Catalyst
    * aggregate ([[graft.expressions.SimHashAgg]]): the whole bit-vote
    * state lives in a single primitive-array buffer updated in one
    * fused loop per row, instead of `bits` separate SUM aggregate
    * columns. Identical values on NULL-FREE input (spec-pinned): the
    * native aggregate skips null hashes (standard SQL aggregate
    * semantics), while [[simhashAggs]]' when/otherwise votes -1 for a
    * null. Call sites feed plain `explode` over non-null token arrays,
    * which cannot produce nulls.
    */
  def simhashAggNative(tokenHash: Column, bits: Int = 64): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.SimHashAgg(
        org.apache.spark.sql.GraftBridge.expression(tokenHash), bits)
        .toAggregateExpression())

  /** [[minhashAggs]]+[[minhashAggsToSig]] as ONE custom Catalyst
    * aggregate ([[graft.expressions.MinHashAgg]]); bit-identical
    * signatures including the xxhash64 seed chaining (spec-pinned) —
    * on NULL-FREE input: the native aggregate skips null grams, while
    * [[minhashAggs]]' `xxhash64(i, gram)` of a null gram yields the
    * input-independent seed-prefix hash, which can become the min.
    * Call sites feed plain `explode` over non-null gram arrays.
    */
  def minhashAggNative(gramHash: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.MinHashAgg(
        org.apache.spark.sql.GraftBridge.expression(gramHash), k)
        .toAggregateExpression())

  /** Pigeonhole bands for Hamming search: any two hashes within Hamming
    * distance `bands - 1` agree exactly on at least one of the `bands`
    * disjoint `bandBits`-bit bands (default: 64-bit hash, 4×16).
    */
  def simhashBands(sim: Column, bands: Int = 4, bandBits: Int = 16): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(sim, b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bval"))): _*)
}
