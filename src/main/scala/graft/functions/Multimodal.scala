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

  /** Frame sampling — the video analog of the decode pass: the blob is
    * a sequence of fixed-size frames; keep every `every`-th, decode
    * each kept frame independently. One blob row fans out to many frame
    * rows through a lazy iterator (`flatMap` inside the partition): a
    * long video never materializes its full frame set in memory, and
    * the decoder still initializes once per PARTITION, not per frame.
    * (A real build swaps FakeDecoder for a codec that seeks keyframes;
    * the row shape, fan-out and partition-scoped init are the same.)
    *
    * `resizeTo`: per-frame [[resample]] to a fixed width, fused into
    * the same partition loop — decode → resize is one pass over each
    * frame while it is still a JVM array. Resizing downstream of the
    * seam (a Scala UDF on the returned frame) would re-cross the
    * ser/de boundary per row for work the seam can do in place.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int, every: Int,
                   resizeTo: Option[Int] = None,
                   decoder: MediaDecoder = new FakeDecoder): DataFrame = {
    require(frameBytes > 0 && every > 0 && resizeTo.forall(_ > 0))
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = decoder.open()
        val shape: Array[Double] => Array[Double] =
          resizeTo.fold(identity[Array[Double]] _)(n => resample(_, n))
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes // trailing partial frame dropped
          Iterator.range(0, nFrames, every).map { f =>
            val frame = java.util.Arrays.copyOfRange(
              bytes, f * frameBytes, (f + 1) * frameBytes)
            (id, f, shape(decode(frame)))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "feature")
  }

  /** Resize a variable-length feature vector to exactly `n` values by
    * bucket means (the 1-D analog of image resize): bucket b averages
    * the source range [b·len/n, (b+1)·len/n). Downsampling averages
    * disjoint ranges; upsampling repeats the nearest source element.
    * Deterministic. Empty input → zeros.
    */
  def resample(v: Array[Double], n: Int): Array[Double] = {
    require(n > 0)
    val out = new Array[Double](n)
    if (v.isEmpty) return out
    var b = 0
    while (b < n) {
      val from = (b.toLong * v.length / n).toInt
      val until = math.max(((b + 1).toLong * v.length / n).toInt, from + 1)
      val hi = math.min(until, v.length)
      var s = 0.0
      var i = from
      while (i < hi) { s += v(i); i += 1 }
      out(b) = s / (hi - from)
      b += 1
    }
    out
  }
}
