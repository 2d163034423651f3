package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Semantic pins for the curation operators (q75-q77). The DuckDB
  * oracles prove cross-engine parity at sf0.01; these prove the gate /
  * purge / profile do the RIGHT thing on crafted inputs.
  */
class CurationSpec extends SparkSuite {

  import spark.implicits._

  private def gate(docs: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cur").toString
    // the shared gateFeatures frame selects `source` too — carry it
    docs.map { case (id, t) => (id, t, "src0") }
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    CurationQueries.all.find(_.name == "q75_quality_gate").get
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
  }

  test("q75 gate: each rule fires on its designed failure and only then") {
    val good = ("the quick brown fox jumps over a lazy dog and then " +
      "it runs up to the hill in the rain") // 20 tokens, stopwords, no punct
    val out = gate(Seq(
      1L -> good,
      2L -> "tiny doc", // too_short (and no_stopwords)
      3L -> ("the " + Seq.fill(19)("!!a!!").mkString(" ")), // symbol_soup
      4L -> ("the " + Seq.fill(19)("x").mkString(" ")), // word_len (mean < 2)
      5L -> ("in " + Seq.fill(19)("supercalifragilistic9").mkString(" ")) // word_len (mean > 12)
    ))
    assert(out(1L) === ((1L, "")))
    assert(out(2L)._1 === 0L)
    assert(out(2L)._2.contains("too_short"))
    assert(out(3L) === ((0L, "symbol_soup")))
    assert(out(4L) === ((0L, "word_len")))
    assert(out(5L) === ((0L, "word_len")))
  }

  test("q75 gate: a doc failing several rules lists all of them") {
    val out = gate(Seq(6L -> "zz!!"))
    assert(out(6L)._1 === 0L)
    val reasons = out(6L)._2.split(",").toSet
    assert(reasons === Set("too_short", "symbol_soup", "no_stopwords"))
  }

  test("q76 purge: every table loses exactly the listed ids, others untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cur").toString
    // ids 0 and 97*2=194 are purged; 1..5 survive
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 194L)
    ids.map(i => (i, s"text $i", "en", s"src${i % 2}", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    ids.map(i => (i, Seq(0.1f), i.toInt % 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = CurationQueries.all.find(_.name == "q76_purge_cascade").get
      .run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // survivors 1..5: src1 -> {1,3,5}, src0 -> {2,4}; labels 1 -> {1,3,5}, 0 -> {2,4}
    assert(rows(("documents", "src0")) === 2L)
    assert(rows(("documents", "src1")) === 3L)
    assert(rows(("embeddings", "0")) === 2L)
    assert(rows(("embeddings", "1")) === 3L)
  }

  test("q76 purge plan: the deletion list broadcasts (anti-join never shuffles the corpus)") {
    val plan = CurationQueries.all.find(_.name == "q76_purge_cascade").get
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join, got:\n$plan")
  }

  test("q77 profile: metrics catch planted nulls, duplicates and domain violations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cur").toString
    Seq(
      (Some(1L), Some(10L), "O", 100.5, "1-URGENT"),
      (Some(2L), None, "F", 20.25, "2-HIGH"),
      (Some(3L), Some(10L), "X", 30.0, "3-MEDIUM")) // X nonconforming
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val m = CurationQueries.all.find(_.name == "q77_dq_profile").get
      .run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("null_count", "o_custkey")) === 1L)
    assert(m(("null_count", "o_orderkey")) === 0L)
    assert(m(("distinct_count", "o_custkey")) === 1L) // count_distinct skips nulls
    assert(m(("distinct_count", "o_orderstatus")) === 3L)
    assert(m(("min", "o_totalprice")) === 2025L) // floor(20.25*100)
    assert(m(("max", "o_totalprice")) === 10050L)
    assert(m(("nonconforming", "o_orderstatus")) === 1L)
  }

  test("q82 classifier: score moves with the features it weights") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cur").toString
    val filler = Seq.fill(40)("word").mkString(" ") // 40 tokens, mwl 4000
    Seq(
      1L -> s"$filler the the the the the the the the the the", // 10 stopwords
      2L -> s"$filler word word word word word word word word word word",
      3L -> (Seq.fill(50)("extraordinarily").mkString(" ")) // mwl far from 4500
    ).map { case (id, t) => (id, t, "src0") }
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = CurationQueries.all.find(_.name == "q82_quality_classifier").get
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: 50 tok, 10/50 stopwords -> stop_pm 200; mwl: (40*4+10*3)*1000/50=3800
    //   score = 10*50 + 5*200 - 2*|3800-4500| = 500 + 1000 - 1400 = 100
    assert(out(1L) === ((50L, 200L, 100L)))
    // doc 2: same length, zero stopwords, mwl 4000 -> 500 + 0 - 1000 = -500
    assert(out(2L) === ((50L, 0L, -500L)))
    // doc 3: 50 long tokens, mwl 15000 -> 500 + 0 - 2*10500 = -20500
    assert(out(3L)._3 === -20500L)
  }

  test("q82 classifier plan: map-side scoring, single scan, no shuffle before the sort") {
    val df = CurationQueries.all.find(_.name == "q82_quality_classifier").get
      .run(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"expected a single documents scan, saw $scans")
    // the only exchange allowed is the output-ordering range partition
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"unexpected non-ordering exchange:\n$plan")
  }

  test("q77 profile plan: one aggregate pass, no per-metric rescans") {
    val df = CurationQueries.all.find(_.name == "q77_dq_profile").get
      .run(spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan parquet"))
    assert(scans === 1, s"expected a single orders scan, saw $scans")
  }
}
