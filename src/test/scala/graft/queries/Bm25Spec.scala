package graft.queries

import graft.SparkSuite

/** q145 BM25 cross-check: an independent single-machine recomputation
  * of the exact fixed-point arithmetic (plain Scala over the collected
  * corpus — no Spark expressions shared with the query) must reproduce
  * the distributed top-10 bit for bit.
  */
class Bm25Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("distributed BM25 == brute-force fixed-point recompute") {
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val terms = Seq("vector", "stream", "hash")
    val n = docs.size.toLong
    val t = docs.values.map(_.size.toLong).sum
    val df = terms.map(q => q -> docs.values.count(_.contains(q)).toLong).toMap
    val scored = docs.toSeq.flatMap { case (id, toks) =>
      val dl = toks.size.toLong
      val contribs = terms.flatMap { q =>
        val tf = toks.count(_ == q).toLong
        if (tf == 0) None else {
          val idfE6 = math.floor(math.log(
            (2.0 * n - 2 * df(q) + 1) / (2 * df(q) + 1) + 1.0) * 1000000).toLong
          val denomE3 = 1000 * tf + 300 + (dl * 900 * n) / t
          Some((idfE6 * ((tf * 2200000) / denomE3)) / 1000)
        }
      }
      if (contribs.isEmpty) None
      else Some((id, contribs.size.toLong, contribs.sum))
    }
    val expected = scored.sortBy { case (id, _, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, m, s), i) => (i + 1, id, m, s) }

    val got = graft.SparkEntry.queries("q145_bm25")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }
}
