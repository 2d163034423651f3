package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.ColumnOps.let
import graft.text.TextAnalysis

/** Semantic pins for the corpus-prep operators (q59-q61). The DuckDB
  * oracle proves cross-engine parity at sf0.01; these prove the
  * operators do the RIGHT thing on crafted inputs.
  */
class LlmPrepSpec extends SparkSuite {

  import spark.implicits._

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\d{3}[-.]\\d{3}[-.]\\d{4}"

  test("q59 semantics: emails and phones masked, clean text untouched") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "call 415-555-1234 or 650.555.9999"),
      (3L, "no pii here at all"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).as("ne"),
        regexp_count(col("text"), lit(PhoneRe)).as("np"),
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("red"))
      .orderBy(col("doc_id"))
    val rows = df.collect()
    assert(rows(0).getInt(1) === 1)
    assert(rows(0).getString(3) === "mail <EMAIL> now")
    assert(rows(1).getInt(2) === 2)
    assert(rows(1).getString(3) === "call <PHONE> or <PHONE>")
    assert(rows(2).getInt(1) === 0 && rows(2).getInt(2) === 0)
    assert(rows(2).getString(3) === "no pii here at all")
  }

  test("q60 semantics: duplicate-bigram ratio") {
    def ratio(text: String): (Long, Long) = {
      val r = Seq((1L, text)).toDF("doc_id", "text")
        .select(let(TextAnalysis.wordNgrams(col("text"), 2)) { gs =>
          struct(size(gs).as("n"), size(array_distinct(gs)).as("nd"))
        }.as("r"))
        .select(col("r.n").cast("long"), col("r.nd").cast("long"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    // "a b a b a" bigrams: [a b, b a, a b, b a] -> 4 total, 2 distinct
    assert(ratio("a b a b a") === (4L, 2L))
    // all-unique bigrams -> no repetition
    assert(ratio("w x y z") === (3L, 3L))
  }

  test("q62 semantics: contiguous-fill packing respects the budget boundary") {
    import org.apache.spark.sql.expressions.Window
    // one shard, budget 5: docs of 2,2,2 tokens -> starts 0,2,4 ->
    // seq 0,0,0; the 4th doc starts at 6 -> seq 1
    val docs = Seq((0L, "a b"), (1L, "c d"), (2L, "e f"), (3L, "g h"))
      .toDF("doc_id", "text")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val packed = docs
      .select(col("doc_id"), lit(0).as("shard"),
        TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), floor((col("cum") - col("n_tok")) / 5).as("seq_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("q61 semantics: doc sharing a 4-gram with the benchmark slice is flagged") {
    // doc 0 (benchmark, 0 % 50 == 0) and doc 1 share "one two three four";
    // doc 2 shares nothing.
    val docs = Seq(
      (0L, "one two three four five"),
      (1L, "zz one two three four yy"),
      (2L, "totally different text entirely"))
      .toDF("doc_id", "text")
    val g = docs.select(col("doc_id"),
      transform(array_distinct(TextAnalysis.wordNgrams(col("text"), 4)),
        x => xxhash64(x)).as("grams"))
    val bench = g.filter(col("doc_id") % 50 === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    val hits = g.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(bench), "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits === Map(1L -> 1L))
  }

  test("q63 semantics: contiguous frequency-ranked vocab ids") {
    // counts: the=4, fox=3, dog=2, a=1 (cut by min-count 2)
    val docs = Seq(
      (1L, "the fox the dog"),
      (2L, "the fox dog"),
      (3L, "the fox a"))
      .toDF("doc_id", "text")
    val words = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
    val got = graft.operators.GlobalRank
      .withGlobalRank(words, Seq(col("cnt").desc, col("word")), "vocab_id")
      .select(col("word"), col("cnt"), col("vocab_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("the", 4L, 1L), ("fox", 3L, 2L), ("dog", 2L, 3L)))
  }

  test("q65 semantics: mean corpus frequency and rare-token fraction") {
    // corpus: "the" appears 3×, "fox"/"dog"/"cat" once each (rare < 2)
    val docs = Seq((1L, "the fox"), (2L, "the dog"), (3L, "the cat"))
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("word"))
    val lm = toks.groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val got = toks.join(broadcast(lm), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("freq")).as("sum_freq"),
        sum(when(col("freq") < 2, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"),
        floor((col("sum_freq") * 100) / col("n_tok")).cast("bigint").as("mean_e2"),
        floor((col("n_rare") * 10000) / col("n_tok")).cast("bigint").as("rare_e4"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every doc: tokens {the(3), rare(1)} -> mean = 2.0, rare frac = 0.5
    assert(got === Map(1L -> (200L, 5000L), 2L -> (200L, 5000L), 3L -> (200L, 5000L)))
  }

  test("q68 law: n_kept = min(cap, n_available), deterministic across runs") {
    val q = graft.SparkEntry.queries("q68_mixture")
    val r1 = q(spark, "/root/testdata/sf0.001").collect()
    val r2 = q(spark, "/root/testdata/sf0.001").collect()
    assert(r1.nonEmpty)
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
    r1.foreach { r => // (source, n_available, cap, n_kept)
      assert(r.getLong(3) === math.min(r.getLong(2), r.getLong(1)),
        s"cap law violated for ${r.getString(0)}: $r")
    }
  }

  test("q83: a permutation into balanced shards, stable across runs") {
    val q = graft.SparkEntry.queries("q83_train_shuffle")
    val r1 = q(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r2 = q(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(r1.toSeq === r2.toSeq, "shuffle order not reproducible")
    val n = r1.length
    // every doc appears exactly once
    assert(r1.map(_._1).distinct.length === n)
    val byShard = r1.groupBy(_._2)
    assert(byShard.keySet === (0L until 8L).toSet)
    // round-robin: shard sizes differ by at most one...
    val sizes = byShard.values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
    // ...and within-shard positions are dense 0..size-1
    byShard.foreach { case (shard, g) =>
      assert(g.map(_._3).sorted.toSeq === (0L until g.length.toLong).toSeq,
        s"shard $shard positions not dense")
    }
  }

  test("q89: chunk boundaries, overlap, and tail retention") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q89").toString
    val toks80 = (1 to 80).map(i => s"t$i")
    Seq(
      (1L, toks80.mkString(" ")), // 80 tokens -> starts 1,25,49,73
      (2L, "tiny doc"),           // sub-window -> one short chunk
      (3L, (1 to 32).map(i => s"u$i").mkString(" "))) // exactly W -> chunks at 1 and 25
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q89_chunking")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(c => (c._3, c._4)).toSeq ===
      Seq((1, 32), (25, 32), (49, 32), (73, 8))) // stride 24, short tail kept
    // overlap: each chunk's last 8 tokens = next chunk's first 8
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._5.split(" ").takeRight(8).toSeq === b._5.split(" ").take(8).toSeq)
    case _ => }
    // every token position covered by at least one chunk
    val covered = d1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered === (1 to 80).toSet)
    assert(rows.filter(_._1 == 2L).map(c => (c._2, c._3, c._4, c._5)).toSeq ===
      Seq((0, 1, 2, "tiny doc")))
    assert(rows.filter(_._1 == 3L).map(c => (c._3, c._4)).toSeq ===
      Seq((1, 32), (25, 8))) // W-length doc still gets its overlap tail
  }

  test("q64 companion: percentile_approx sketch tracks exact percentile") {
    // the 100 TB path is the one-pass bounded-memory sketch; q64's
    // oracle uses exact percentile (approx algorithms differ across
    // engines), so the sketch's fidelity is pinned here instead:
    // percentile_approx with high accuracy returns an actual data value
    // within a tight rank neighborhood of the exact quantile.
    val df = spark.range(1, 1001).select((col("id") * col("id")).as("v"))
    val r = df.agg(
      percentile(col("v"), lit(0.5)).as("exact"),
      percentile_approx(col("v"), lit(0.5), lit(10000)).as("approx"))
      .head()
    val exact = r.getDouble(0)
    val approx = r.getLong(1).toDouble
    // rank of the approx answer must be within 1% of the true median rank
    val rankApprox = math.sqrt(approx) // v = id² ⟹ rank = sqrt(v)
    assert(math.abs(rankApprox - 500.5) <= 10,
      s"approx median $approx (rank $rankApprox) too far from exact $exact")
  }
}
