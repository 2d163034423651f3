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

  test("frame sampling: every k-th fixed-size frame, partial tail dropped") {
    import spark.implicits._
    // 10 bytes, 3-byte frames -> frames 0,1,2 (tail byte dropped);
    // every=2 keeps frames 0 and 2
    val blob = Array.tabulate[Byte](10)(_.toByte)
    val df = Seq((7L, blob)).toDF("doc_id", "blob")
    val got = Multimodal.sampleFrames(df, frameBytes = 3, every = 2)
      .orderBy("frame_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).head))
    // feature(0) = decoded frame length = 3.0 for every kept frame
    assert(got.toSeq === Seq((7L, 0, 3.0), (7L, 2, 3.0)))
  }

  test("fused resize equals resample applied after the seam; plan has no UDF") {
    import spark.implicits._
    val blob = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val df = Seq((1L, blob), (2L, blob.take(40))).toDF("doc_id", "blob")
    val fused = Multimodal.sampleFrames(df, frameBytes = 8, every = 2,
        resizeTo = Some(2))
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
    val after = Multimodal.sampleFrames(df, frameBytes = 8, every = 2)
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Multimodal.resample(r.getSeq[Double](2).toArray, 2).toSeq))
    assert(fused.toSeq === after.toSeq)
    assert(fused.forall(_._3.length == 2))
    // the whole q67 pipeline must stay UDF-free: resize lives inside
    // the mapPartitions seam, not behind a second ser/de boundary
    val q67 = graft.SparkEntry.queries("q67_frame_sample")(spark,
      "/root/testdata/sf0.001")
    val plan = q67.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("batchevalpython"))
  }

  test("resample: bucket-mean downsize, nearest-repeat upsize, length contract") {
    val v = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    assert(Multimodal.resample(v, 3).toSeq === Seq(1.5, 3.5, 5.5))
    assert(Multimodal.resample(v, 6).toSeq === v.toSeq)
    assert(Multimodal.resample(Array(1.0, 2.0), 4).toSeq === Seq(1.0, 1.0, 2.0, 2.0))
    assert(Multimodal.resample(Array.empty[Double], 4).toSeq === Seq(0.0, 0.0, 0.0, 0.0))
  }
}
