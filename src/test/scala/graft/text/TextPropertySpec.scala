package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSuite

/** Property cases for the text operators, drawn from fixed-seed
  * scalacheck Gens (deterministic run-to-run, like the rest of the
  * suite).
  */
class TextPropertySpec extends SparkSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1000L + i)))

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val words: Gen[List[String]] = Gen.listOfN(12, word)

  private def evalMany(c: org.apache.spark.sql.Column,
                       texts: Seq[String]): Seq[Any] = {
    import spark.implicits._
    texts.toDF("text").select(c.as("v")).collect().map(_.get(0)).toSeq
  }

  test("tokenCount equals the word count for any whitespace layout") {
    val cases = samples(words, 30)
    val messy = cases.map(_.mkString("  ", " \t ", "   "))
    val counts = evalMany(TextAnalysis.tokenCount(col("text")), messy)
    assert(counts === cases.map(_.size))
  }

  test("fingerprint is invariant to whitespace/case but not order") {
    val cases = samples(words.suchThat(ws => ws.distinct.size > 1), 30)
    val canonical = cases.map(_.mkString(" "))
    val noisy = cases.map(_.map(w =>
      if (w.length % 2 == 0) w.toUpperCase else w).mkString("  ", "\t", " "))
    val reversed = cases.map(_.reverse.mkString(" "))
    val f = TextAnalysis.fingerprint(col("text"))
    assert(evalMany(f, canonical) === evalMany(f, noisy))
    val fc = evalMany(f, canonical)
    val fr = evalMany(f, reversed)
    val differing = fc.zip(fr).count { case (a, b) => a != b }
    assert(differing > 25, s"order-insensitive fingerprints: $differing/30 differ")
  }

  test("charShingles: count and width laws") {
    val texts = samples(word.suchThat(_.length >= 5), 30)
    import spark.implicits._
    val rows = texts.toDF("text")
      .select(col("text"), TextAnalysis.charShingles(col("text"), 4).as("sh"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val sh = r.getSeq[String](1)
      assert(sh.forall(_.length == 4))
      assert(sh.distinct.size == sh.size) // array_distinct applied
      assert(sh.size <= text.length - 3)
    }
  }
}
