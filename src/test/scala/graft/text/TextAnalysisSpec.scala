package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import TextAnalysis._

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("v")).head().get(0)
  }

  test("fingerprint: whitespace/case invariant, order + content sensitive") {
    val base = one(fingerprint(col("text")), "The quick brown Fox")
    assert(one(fingerprint(col("text")), "  the   QUICK brown fox ") == base)
    assert(one(fingerprint(col("text")), "fox brown quick the") != base)
    assert(one(fingerprint(col("text")), "the quick brown wolf") != base)
  }

  test("token counts: empties dropped, bpe splits punctuation") {
    assert(one(tokenCount(col("text")), "  a  b   c ") == 3)
    assert(one(tokenCount(col("text")), "") == 0)
    assert(one(distinctTokenCount(col("text")), "a B b A a") == 2)
    // don't, world! -> [don, ', t] [world] [!] = 5 BPE-ish symbols
    assert(one(bpeTokenCount(col("text")), "don't world!") == 5)
  }

  test("langId: marker argmax with priority ties, unknown on no hits") {
    assert(one(langId(col("text")), "the cat is big and fast") == "en")
    assert(one(langId(col("text")), "el gato es grande y la casa") == "es")
    assert(one(langId(col("text")), "zzz qqq xxx") == "unknown")
    // 'la' is both es and fr; es wins on list-order priority at a tie
    assert(one(langId(col("text")), "la la") == "es")
  }

  test("quality score bounded in [0,1]") {
    for (t <- Seq("", "!!!", "the cat sat on the mat and it was good",
                  "a " * 50, "的 是 了")) {
      val q = one(qualityScore(col("text")), t).asInstanceOf[Double]
      assert(q >= 0.0 && q <= 1.0, s"score $q out of range for '$t'")
    }
  }

  test("wordNgrams and charShingles edge cases") {
    assert(one(wordNgrams(col("text"), 2), "a b c")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a b", "b c"))
    assert(one(wordNgrams(col("text"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]].toSeq.isEmpty)
    assert(one(charShingles(col("text"), 3), "abcd")
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("abc", "bcd"))
    assert(one(charShingles(col("text"), 5), "abc")
      .asInstanceOf[scala.collection.Seq[String]].toSeq.isEmpty)
  }
}
