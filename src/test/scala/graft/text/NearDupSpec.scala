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
}
