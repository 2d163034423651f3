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
    * reproduce (greedy left-to-right application, self-pairs included
    * as of r10: identical-symbol runs merge at even offsets).
    */
  private def refTrain(words: Map[String, Long], merges: Int): Seq[(Int, String, String, Long)] = {
    var segs = words.toSeq.map { case (w, f) => (w.map(_.toString).toList, f) }
    (1 to merges).map { i =>
      val counts = mutable.Map.empty[(String, String), Long]
      for ((s, f) <- segs; Seq(x, y) <- s.sliding(2))
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

  test("self-pair runs: even/odd runs merge at even offsets, both engines") {
    // (z,z) dominates sweep 1; 'zzzz' → [zz,zz] (even run, 2 merges),
    // 'zzz' → [zz,z] (odd run, trailing singleton), 'zzzzz' → [zz,zz,z].
    // Sweep 2 is the (zz,z) vs (zz,zz) tie broken lexicographically;
    // sweep 3 reaches the composite SELF-pair (zz,zz) on 'zzzz'.
    val words = Map("zzzz" -> 10L, "zzz" -> 7L, "zzzzz" -> 5L, "ab" -> 1L)
    val got = distTrain(words, 4)
    assert(got == refTrain(words, 4))
    assert(got(0)._2 == "z" && got(0)._3 == "z", s"sweep1 self-pair: $got")
  }

  test("self-pair segmentations match the sequential trainer's") {
    val words = Map("zzzzz" -> 3L, "za" -> 1L)
    val (_, segs) = BpeTrain.trainState(
      words.toSeq.toDF("word", "freq").repartition(2), 1)
    val got = segs.collect().map(r =>
      r.getString(0) -> r.getSeq[String](2).toList).toMap
    // greedy L-to-R on a 5-run: merges at offsets 0 and 2, singleton tail
    assert(got("zzzzz") == List("zz", "zz", "z"), got.toString)
    assert(got("za") == List("z", "a"))
  }

  test("pair exhaustion stops early, keeping learned rules (ADVICE r9)") {
    val words = Map("ab" -> 3L)
    val table = BpeTrain.run(words.toSeq.toDF("word", "freq"), 5).collect()
    assert(table.length == 1 && table(0).getString(1) == "a" &&
      table(0).getString(2) == "b")
    val (_, segs) = BpeTrain.trainState(words.toSeq.toDF("word", "freq"), 5)
    assert(segs.collect().map(_.getSeq[String](2).toList).toSeq ==
      Seq(List("ab")))
    // no mergeable pair at all → loud failure, not an empty frame
    intercept[IllegalArgumentException] {
      BpeTrain.run(Map("a" -> 1L).toSeq.toDF("word", "freq"), 1)
    }
  }

  test("real corpus (sf0.001): distributed == sequential on true word freqs") {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // q148 unions the self-pair coverage words (LlmPrepQueries.RunWords)
    val words = Seq("zzzz" -> 1000000000L, "zzz" -> 1000000000L)
      .foldLeft(corpus) { case (m, (w, f)) => m.updated(w, m.getOrElse(w, 0L) + f) }
    val got = graft.SparkEntry.queries("q148_bpe_train")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == refTrain(words, 5))
  }
}
