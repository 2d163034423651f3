package graft.queries

import graft.SparkSuite

/** Semantic pins for q86 (normalization) and q87 (modality integrity)
  * on crafted inputs — the oracles prove cross-engine parity on the
  * fixture corpus; these prove the operators do the right thing on the
  * dirty shapes the fixture can't contain.
  */
class IntegritySpec extends SparkSuite {

  import spark.implicits._

  test("q86: urls stripped, whitespace collapsed, case folded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_int").toString
    Seq(
      (1L, "Visit https://deep.example/a?b=c#d NOW"),
      (2L, "tabs\tand\nnewlines   and   runs"),
      (3L, "plain already clean text"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TextQueries.all.find(_.name == "q86_text_normalize").get
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(4))).toMap
    // the registered query appends one synthetic URL to every doc; doc 1
    // carries one of its own on top
    assert(out(1L)._1 === 2)
    assert(out(2L)._1 === 1)
    assert(out(3L)._1 === 1)
    // md5 equality against the hand-normalized strings (suffix: the
    // injected url vanishes, ragged runs collapse, trailing trimmed)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(1L)._2 === md5hex("visit now see trailing runs"))
    assert(out(2L)._2 === md5hex("tabs and newlines and runs see trailing runs"))
    assert(out(3L)._2 === md5hex("plain already clean text see trailing runs"))
  }

  test("q87: planted orphans and a dimension violation are each counted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_int").toString
    Seq(1L, 2L, 3L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Seq(
      (2L, Array.fill(64)(0.5f)),
      (3L, Array.fill(5)(0.5f)), // wrong dimension
      (4L, Array.fill(64)(0.5f))) // no matching document
      .toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val m = MultimodalQueries.all.find(_.name == "q87_modality_integrity").get
      .run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("docs_total") === 3L)
    assert(m("embeddings_total") === 3L)
    assert(m("matched") === 2L)
    assert(m("doc_without_embedding") === 1L) // doc 1
    assert(m("embedding_without_doc") === 1L) // vec 4
    assert(m("dim_violations") === 1L) // vec 3
  }
}
