package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns: one table carrying text + an opaque binary blob
  * with typed metadata + an embedding vector. Media bytes stay opaque
  * `binary` columns until an explicit decode stage; decode/feature
  * extraction runs through a partition-scoped decoder seam (the
  * `mapPartitions` analog of a Pandas-UDF batch: codecs load once per
  * partition, rows stream through).
  */
object Multimodal {

  /** documents ⋈ embeddings (shared id space) + a synthesized blob: no
    * real media ships with the testdata, so the document's UTF-8 bytes
    * stand in as the opaque payload — the engine treats it as bytes
    * either way.
    */
  def table(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .join(Tables.embeddings(s, d).withColumnRenamed("vec_id", "doc_id"),
        "doc_id")
      .withColumn("blob", encode(col("text"), "utf-8"))
      .withColumn("media_meta", struct(
        lit("application/octet-stream").as("mime"),
        length(col("blob")).as("n_bytes")))

  /** The decode stage contract. `open()` is partition-scoped: a real
    * implementation loads its codec/model there.
    */
  trait MediaDecoder extends Serializable {
    def open(): Array[Byte] => Array[Double]
  }

  /** STUB — deterministic fake of the media decode (this container has
    * no image/audio codecs). A real decoder would produce pixel/sample
    * features; this one produces byte-level stats so the plumbing
    * (schema, batch shape, partition-scoped init) is fully exercised.
    */
  final class FakeDecoder extends MediaDecoder {
    def open(): Array[Byte] => Array[Double] = { bytes =>
      var sum = 0L
      var fold = 0L
      var i = 0
      while (i < bytes.length) {
        sum += bytes(i) & 0xff
        fold = (fold * 31 + (bytes(i) & 0xff)) & 0xFFFFFF
        i += 1
      }
      val n = math.max(bytes.length, 1)
      Array(bytes.length.toDouble, sum.toDouble / n, fold.toDouble)
    }
  }

  /** (doc_id, blob) → (doc_id, feature): the batch decode pass. */
  def extractFeatures(df: DataFrame,
                      decoder: MediaDecoder = new FakeDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = decoder.open()
        it.map { case (id, bytes) => (id, decode(bytes)) }
      }
      .toDF("doc_id", "feature")
  }
}
