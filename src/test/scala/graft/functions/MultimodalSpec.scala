package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("multimodal table carries binary + text + vector with typed metadata") {
    val mm = Multimodal.table(spark, dir)
    val fields = mm.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("blob") === "binary")
    assert(fields("text") === "string")
    assert(fields("embedding") === "array")
    assert(fields("media_meta") === "struct")
    // metadata agrees with the payload
    val bad = mm.filter(length(col("blob")) =!= col("media_meta.n_bytes")).count()
    assert(bad === 0)
  }

  test("decoder seam: deterministic features, one decoder per partition") {
    val mm = Multimodal.table(spark, dir).limit(20)
    val f1 = Multimodal.extractFeatures(mm).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(mm).orderBy("doc_id").collect()
    assert(f1.length === 20)
    assert(f1.map(_.toString).toSeq === f2.map(_.toString).toSeq)
    // feature(0) is the byte length of the blob
    val joined = Multimodal.extractFeatures(mm)
      .join(mm.select(col("doc_id"), length(col("blob")).as("len")), "doc_id")
      .filter(element_at(col("feature"), 1) =!= col("len").cast("double"))
    assert(joined.count() === 0)
  }
}
