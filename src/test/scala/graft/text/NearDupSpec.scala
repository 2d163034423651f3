package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The exploded-aggregate signature forms must equal the per-row column
  * forms — q41/q42 switched to the aggregates for codegen, and their
  * candidate sets silently depend on this equivalence.
  */
class NearDupSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def docs = graft.Tables.documents(spark, dir).limit(50)

  test("minhashAggs signature equals minhashSignature") {
    val grams = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.wordNgrams(col("text"), 3)).as("grams"))
      .filter(size(col("grams")) > 0)
    val columnForm = grams.select(col("doc_id"),
      NearDup.minhashSignature(col("grams"), 32).as("sig"))
    val aggs = NearDup.minhashAggs(col("gram"), 32)
    val aggForm = grams
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), NearDup.minhashAggsToSig(32).as("sig"))
    assert(columnForm.exceptAll(aggForm).isEmpty &&
           aggForm.exceptAll(columnForm).isEmpty)
  }

  test("simhashAggs hash equals the column-form simhash") {
    val columnForm = docs.select(col("doc_id"),
      NearDup.simhash(col("text")).as("sh"))
    val votes = NearDup.simhashAggs(col("h"))
    val aggForm = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), NearDup.simhashAggsToHash().as("sh"))
    // token-less docs drop from the agg form by design; none at this sf
    assert(columnForm.exceptAll(aggForm).isEmpty &&
           aggForm.exceptAll(columnForm).isEmpty)
  }

  test("native MinHashAgg equals the 32-column MIN form on hashed grams") {
    val exploded = docs.select(col("doc_id"),
        array_distinct(TextAnalysis.wordNgrams(col("text"), 3)).as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"),
        explode(transform(col("grams"), g => xxhash64(g))).as("gram"))
    val aggs = NearDup.minhashAggs(col("gram"), 32)
    val columnForm = exploded.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), NearDup.minhashAggsToSig(32).as("sig"))
    val nativeForm = exploded.groupBy(col("doc_id"))
      .agg(NearDup.minhashAggNative(col("gram"), 32).as("sig"))
    assert(columnForm.exceptAll(nativeForm).isEmpty &&
           nativeForm.exceptAll(columnForm).isEmpty)
  }

  test("native SimHashAgg equals the 56-sum bit-vote form") {
    val hashed = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .withColumn("h", TextAnalysis.tokenHash56(col("tok")))
    val votes = NearDup.simhashAggs(col("h"), bits = 56)
    val sumForm = hashed.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), NearDup.simhashAggsToHash(bits = 56).as("sh"))
    val nativeForm = hashed.groupBy(col("doc_id"))
      .agg(NearDup.simhashAggNative(col("h"), bits = 56).as("sh"))
    assert(sumForm.exceptAll(nativeForm).isEmpty &&
           nativeForm.exceptAll(sumForm).isEmpty)
  }

  test("signature aggregates are SQL-registered and partial-merge-safe") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    // two partitions force a real partial/merge path through
    // serialize/deserialize of the typed buffers
    Seq((1L, 5L), (1L, 6L), (1L, 7L), (2L, 5L))
      .toDF("id", "h").repartition(2)
      .createOrReplaceTempView("sig_in")
    val out = spark.sql(
      "SELECT id, simhash_agg(h, 8) AS sh, minhash_agg(h, 4) AS sig " +
        "FROM sig_in GROUP BY id ORDER BY id").collect()
    assert(out.length === 2)
    // id 1: hashes 5(101),6(110),7(111) -> votes per bit: b0=+1-1+1=1>0,
    // b1=-1+1+1=1>0, b2=+1+1+1=3>0, rest -3 -> sh = 0b111 = 7
    assert(out(0).getLong(1) === 7L)
    // id 2: single hash 5 -> its own bits
    assert(out(1).getLong(1) === 5L)
    // minhash of a singleton group: sig_i = xxhash64(i, 5)
    val expected = spark
      .sql("SELECT array(xxhash64(0, 5L), xxhash64(1, 5L), xxhash64(2, 5L), xxhash64(3, 5L))")
      .collect()(0).getSeq[Long](0)
    assert(out(1).getSeq[Long](2) === expected)
  }
}
