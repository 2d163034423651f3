package graft.sources

import graft.{SparkSuite, TempDirs}
import graft.operators.VersionedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** maxBytesPerTrigger admission control and the strict-schema write
  * option (mergeSchema=false).
  */
class GraftStreamAdmissionSpec extends SparkSuite {

  test("maxBytesPerTrigger bounds batches by added bytes, min one commit") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_maxbytes")
    val sink = TempDirs.scoped("graft_maxbytes_sink")
    // three commits of a few KB each
    (0L until 3L).foreach(i => VersionedTable.commitAppend(spark, base,
      (0L until 500L).map(k => (i * 1000L + k, s"v$k" * 4)).toDF("k", "v")
        .coalesce(1)))
    var batches = 0L
    val rows = new java.util.concurrent.atomic.AtomicLong()
    s.readStream.format("graft")
      .option("startingVersion", "1")
      .option("maxBytesPerTrigger", "1") // 1 byte: one commit per batch
      .load(base)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sink/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1; rows.addAndGet(b.count()); ()
      }
      .start().awaitTermination()
    assert(batches === 3L, s"1-byte cap must admit exactly one commit " +
      s"per batch, got $batches batches")
    assert(rows.get() === 1500L)
    // a huge cap drains everything in one batch
    val sink2 = TempDirs.scoped("graft_maxbytes_sink2")
    var batches2 = 0L
    s.readStream.format("graft")
      .option("startingVersion", "1")
      .option("maxBytesPerTrigger", (64L * 1024 * 1024).toString)
      .load(base)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sink2/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches2 += 1; b.count(); ()
      }
      .start().awaitTermination()
    assert(batches2 === 1L)
  }

  test("mergeSchema=false refuses evolving writes; default still evolves") {
    val s = spark
    import s.implicits._
    val base = TempDirs.scoped("graft_strict")
    Seq((1L, 10L)).toDF("k", "v").write.format("graft")
      .mode("append").save(base)
    val e = intercept[Exception] {
      Seq((2L, 20L, "en")).toDF("k", "v", "lang").write.format("graft")
        .option("mergeSchema", "false").mode("append").save(base)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mergeSchema")))
    assert(spark.read.format("graft").load(base).columns.toSeq ===
      Seq("k", "v"))
    // default: the same write evolves
    Seq((2L, 20L, "en")).toDF("k", "v", "lang").write.format("graft")
      .mode("append").save(base)
    assert(spark.read.format("graft").load(base).columns.toSeq ===
      Seq("k", "v", "lang"))
  }
}
