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

  test("containment finds an excerpt inside a long doc that Jaccard misses") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cont").toString
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    Seq(
      1L -> (1 to 12).map(i => s"tok$i").mkString(" "), // excerpt of doc 2
      2L -> body,
      3L -> (100 to 160).map(i => s"other$i").mkString(" "))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val cont = graft.SparkEntry.queries("q78_containment")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1's 10 grams all appear in doc 2 -> containment 1.0, one-sided
    assert(cont(1L -> 2L) === 10000L)
    assert(!cont.contains(2L -> 1L), "the long doc is NOT contained in the excerpt")
    // mutual Jaccard is 10/58 ~ 0.17: q40 at t=0.8 must NOT pair them
    val jac = graft.SparkEntry.queries("q40_neardup_jaccard")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains(1L -> 2L))
  }

  private def substringDedup(docs: Seq[(Long, String)]): Map[Long, (Long, String)] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssd").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    graft.SparkEntry.queries("q74_substring_dedup")(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
  }

  test("substring dedup removes exactly the tokens covered by a shared 10-token span") {
    val span = (1 to 10).map(i => s"w$i").mkString(" ") // the duplicated span
    val out = substringDedup(Seq(
      1L -> s"alpha beta $span gamma delta",
      2L -> s"$span tail1 tail2",
      3L -> "completely unrelated text with no shared spans at all here"))
    // doc 1: 14 tokens, the 10 span tokens removed, prefix+suffix survive
    assert(out(1L) === ((10L, "alpha beta gamma delta")))
    // doc 2: span at position 1 removed, tail survives
    assert(out(2L) === ((10L, "tail1 tail2")))
    // doc 3: untouched
    assert(out(3L)._1 === 0L)
  }

  test("substring dedup counts an intra-document repeat as shared") {
    val span = (1 to 10).map(i => s"r$i").mkString(" ")
    val out = substringDedup(Seq(
      1L -> s"$span mid $span", // the same span twice within one doc
      2L -> "some other words making up a quiet unrelated document"))
    // both occurrences removed; overlapping coverage keeps only "mid"
    assert(out(1L) === ((20L, "mid")))
    assert(out(2L)._1 === 0L)
  }

  test("substring dedup leaves sub-window documents untouched") {
    val out = substringDedup(Seq(
      1L -> "short doc under ten tokens",
      2L -> "short doc under ten tokens")) // exact dup, but no 10-token span
    assert(out(1L)._1 === 0L && out(2L)._1 === 0L)
  }

  test("q85: near-duplicates never straddle the split boundary") {
    val split = graft.SparkEntry.queries("q85_leakage_safe_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every doc assigned exactly once, to a real split
    assert(split.size === graft.Tables.documents(spark, dir).count())
    assert(split.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // the leakage guarantee: both members of every verified near-dup
    // pair share the group key, hence the split
    val nd = pairs("q40_neardup_jaccard")
    assert(nd.nonEmpty)
    nd.foreach { case (a, b) =>
      assert(split(a) === split(b),
        s"near-dup pair ($a,$b) split across ${split(a)} / ${split(b)}")
    }
  }

  test("q85 plan: the component table broadcasts; the corpus only shuffles for ordering") {
    val plan = graft.SparkEntry.queries("q85_leakage_safe_split")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    val exchanges = plan.linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"unexpected non-ordering corpus shuffle:\n$plan")
  }

  test("q84: every status is exercised and matches its modular definition") {
    val st = graft.SparkEntry.queries("q84_snapshot_diff")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st.values.toSet === Set("added", "removed", "changed", "unchanged"))
    st.foreach { case (id, s) =>
      val expected =
        if (id % 11 == 10) "added" // absent from old, present in new
        else if (id % 17 == 16) "removed" // present in old, absent from new
        else if (id % 13 == 0) "changed"
        else "unchanged"
      assert(s === expected, s"doc $id: $s != $expected")
    }
    // docs dropped from BOTH snapshots never appear
    assert(!st.keySet.exists(id => id % 11 == 10 && id % 17 == 16))
  }
}
