package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.VersionedTable
import graft.text.{NearDup, TextAnalysis}

/** An INCREMENTALLY-MAINTAINED MinHash-LSH dedup index — the format
  * tier and the dedup tier composing: the band index `(doc_id, band,
  * bval)` that q41 builds per query becomes a PERSISTENT graft table
  * maintained from the corpus table's CHANGE FEED, so near-dup
  * probing against a 100 TB corpus never re-signatures the corpus —
  * the standing pattern of a production dedup service (new documents
  * are checked against the index and added to it; deletions retire
  * their postings).
  *
  * Per micro-batch (all work ∝ change rows, never ∝ corpus):
  *  - inserted/updated docs are shingled + minhashed (the EXACT q41
  *    construction — 32-hash signatures, 8 bands × 4 rows, the same
  *    custom Catalyst aggregate) into fresh band rows;
  *  - deleted/updated docs' old postings are retired with a
  *    file-scoped [[VersionedTable.commitDelete]] — the batch's key
  *    set (micro-batch-bounded by construction, the same ∝-change-rows
  *    class as the IVM state guard) prunes via the index's own
  *    doc_id zone maps + blooms, so only overlapping index files
  *    rewrite;
  *  - fresh postings land as one O(delta) append, TXN-STAMPED with
  *    the batch id — a crash-replayed batch sees its stamp and skips,
  *    and the delete leg re-running first is idempotent (deleting
  *    retired postings again matches nothing).
  *
  * The index is an ordinary graft table: time travel, manifest
  * COUNT(*), zone-map/bloom pruning on probes — `probe` answers "any
  * near-dups of these docs?" with one band equi-join against it.
  */
object LshIndexPipeline {

  val K = 32
  val Bands = 8
  val Rows = 4

  /** Band postings of a (doc_id, text) frame — q41's construction
    * verbatim (sorted-distinct xxhash64 3-gram shingles → one-pass
    * minhash aggregate → banded signature).
    */
  def bandRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        array_sort(transform(
          array_distinct(TextAnalysis.wordNgrams(col("text"), 3)),
          g => xxhash64(g))).as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .groupBy(col("doc_id"))
      .agg(NearDup.minhashAggNative(col("gram"), K).as("sig"))
      .withColumn("b", explode(NearDup.minhashBands(col("sig"), Bands, Rows)))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.bval").as("bval"))

  /** Drain all pending corpus commits into the index (AvailableNow —
    * the batch-job form; a ProcessingTime trigger is the same call
    * shape for the always-on service).
    */
  def runAvailableNow(s: SparkSession, docsBase: String, idxBase: String,
                      checkpoint: String, maintain: Boolean = true): Unit = {
    val q = s.readStream.format("graft")
      .option("readChangeFeed", "true").option("cdcKey", "doc_id")
      .load(docsBase)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(s, idxBase, batch, id)
        // steady-state discipline (r15): small-file debt folds away,
        // history stays bounded by retention, not batch count
        if (maintain) IndexMaintenance.boundedHistory(s, Seq(idxBase))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Fold one change-feed micro-batch into the index — exposed for
    * the spec's idempotency case.
    */
  def applyBatch(s: SparkSession, idxBase: String, batch: DataFrame,
                 id: Long): Unit = {
    // exactly-once: the append leg is txn-stamped; a replayed batch
    // (crash between legs included — the delete re-run matches
    // nothing) is a driver-plane no-op
    if (VersionedTable.lastCommittedTxn(idxBase, TxnApp).exists(_ >= id))
      return
    val b = batch.persist()
    try {
      // NET the batch per key first: one micro-batch can span several
      // commits (insert@v2 then delete@v3 of the SAME doc), and only
      // the key's LATEST change decides its final postings — applying
      // raw rows in retire-then-insert order would resurrect docs
      // whose insert precedes their delete within the batch.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("version").desc)
      val net = b.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      // keys whose postings retire: ANY delete/update touched them
      // (deleting never-indexed keys matches nothing — harmless).
      // A keys-FRAME delete: the predicate is a distributed anti-join
      // and the footprint derives from one extrema aggregate — no
      // driver-side key list, so a backfill replay with admission
      // control off (millions of keys in one batch) stays plan-safe;
      // bloom probes kick in automatically when the batch is small.
      if (VersionedTable.latestVersion(idxBase).isDefined) {
        VersionedTable.commitDeleteKeys(s, idxBase, "doc_id",
          b.filter(col("change_type").isin("delete", "update")),
          statsCols = Seq("doc_id", "bval"),
          bloomCols = Seq("doc_id"))
      }
      val fresh = net
        .filter(col("change_type").isin("insert", "update"))
        .select(col("doc_id"), col("text_new").as("text"))
      val postings = bandRows(fresh)
      VersionedTable.commitAppend(s, idxBase, postings,
        statsCols = Seq("doc_id", "bval"), bloomCols = Seq("doc_id"),
        txn = Some(TxnApp -> id))
      ()
    } finally { b.unpersist(); () }
  }

  private val TxnApp = "lsh-index-maintainer"

  /** Near-dup CANDIDATE pairs among the indexed corpus: one band
    * equi-join over the index table (callers verify exact similarity
    * against the documents themselves, as q41 does).
    */
  def candidates(s: SparkSession, idxBase: String): DataFrame = {
    val idx = s.read.format("graft").load(idxBase)
    idx.as("x")
      .join(idx.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
  }
}
