package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** BpeTrain vs an independent sequential reference trainer (the
  * classic greedy left-to-right merge loop over word lists — no Spark,
  * no shared code), on a hand vocabulary and on the real corpus.
  */
class BpeTrainSpec extends SparkSuite {

  import spark.implicits._

  /** Textbook BPE trainer: mutable lists, sequential scan per word —
    * the semantics the distributed fold/window construction must
    * reproduce (self-pairs excluded from selection, as contracted).
    */
  private def refTrain(words: Map[String, Long], merges: Int): Seq[(Int, String, String, Long)] = {
    var segs = words.toSeq.map { case (w, f) => (w.map(_.toString).toList, f) }
    (1 to merges).map { i =>
      val counts = mutable.Map.empty[(String, String), Long]
      for ((s, f) <- segs; Seq(x, y) <- s.sliding(2) if x != y)
        counts((x, y)) = counts.getOrElse((x, y), 0L) + f
      val ((a, b), n) = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head
      segs = segs.map { case (s, f) =>
        val out = mutable.ListBuffer.empty[String]
        var j = 0
        while (j < s.length) {
          if (j + 1 < s.length && s(j) == a && s(j + 1) == b) { out += a + b; j += 2 }
          else { out += s(j); j += 1 }
        }
        (out.toList, f)
      }
      (i, a, b, n)
    }
  }

  private def distTrain(words: Map[String, Long], merges: Int): Seq[(Int, String, String, Long)] =
    BpeTrain.run(
      words.toSeq.toDF("word", "freq").repartition(3), merges)
      .orderBy(col("sweep")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("Sennrich vocabulary: 5 merges match the sequential trainer") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    assert(distTrain(words, 5) == refTrain(words, 5))
  }

  test("merged symbols chain across sweeps (ab then ab+c)") {
    // 'abc' dominates: sweep 1 learns (a,b), sweep 2 must treat 'ab'
    // as one symbol and learn (ab,c) — composite left side
    val words = Map("abc" -> 10L, "abd" -> 3L, "xy" -> 1L)
    val got = distTrain(words, 3)
    assert(got == refTrain(words, 3))
    assert(got(0)._2 == "a" && got(0)._3 == "b")
    assert(got(1)._2 == "ab" && got(1)._3 == "c", s"composite merge: $got")
  }

  test("real corpus (sf0.001): distributed == sequential on true word freqs") {
    val words = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.SparkEntry.queries("q148_bpe_train")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == refTrain(words, 5))
  }
}
