package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSuite

class DedupQueriesSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(name)(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH candidates cover the exact-Jaccard near-dups") {
    val exact = pairs("q40_neardup_jaccard") // jaccard >= 0.8, perfect recall
    val lsh = pairs("q41_minhash_lsh")       // jaccard >= 0.7 after banding
    assert(exact.nonEmpty, "corpus should contain injected near-dups")
    assert(exact.subsetOf(lsh),
      s"LSH missed high-similarity pairs: ${exact diff lsh}")
  }

  test("incremental probe agrees with the all-pairs sweep on cross-parity pairs") {
    // q72 (asymmetric corpus-index probe) and q40 (all-pairs
    // set-similarity join) are independent plans over the same theorem;
    // on the even/odd split they must find EXACTLY the same pairs with
    // the same scores
    val full = graft.SparkEntry.queries("q40_neardup_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val crossFromFull = full.collect {
      case (a, b, j) if a % 2 == 0 && b % 2 == 1 => (a, b, j)
      case (a, b, j) if a % 2 == 1 && b % 2 == 0 => (b, a, j)
    }.toSet
    val incremental = graft.SparkEntry.queries("q72_incremental_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incremental === crossFromFull)
  }

  test("simhash recovers most Jaccard near-dups with bounded noise") {
    // simhash Hamming<=3 is a different similarity notion than set
    // Jaccard: short docs can collide (false positives) and heavy
    // rewrites can flip >3 bits (false negatives). Deterministic
    // corpus + seeded hashes -> stable values; pinned with slack.
    val sim = pairs("q42_simhash")
    val nearDup = pairs("q40_neardup_jaccard")
    assert(sim.nonEmpty, "simhash found no Hamming<=3 pairs")
    val recall = (sim intersect nearDup).size.toDouble / nearDup.size
    val precision = (sim intersect nearDup).size.toDouble / sim.size
    assert(recall >= 0.6, s"simhash recall degraded: $recall")
    assert(precision >= 0.5, s"simhash precision degraded: $precision")
  }

  test("exact dedup groups cover all docs exactly once") {
    val df = graft.SparkEntry.queries("q39_exact_dedup")(spark, dir)
    val total = df.agg(sum(col("n_copies"))).head().getLong(0)
    val docs = graft.Tables.documents(spark, dir).count()
    assert(total == docs)
  }
}
