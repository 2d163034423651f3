package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSuite

/** Multi-batch semantics of dropDuplicatesWithinWatermark (q79) that
  * the single-batch oracle run cannot observe: a duplicate arriving in
  * a LATER micro-batch inside the watermark is dropped, and the per-key
  * state is evicted once the watermark passes — which bounds state at
  * any scale and means a far-later replay is re-emitted (the documented
  * contract: dedup is exact only within the watermark window).
  *
  * Parameterized over BOTH state-store providers: the default
  * heap-backed HDFS provider and RocksDB (the production configuration
  * at 100 TB — state on executor disk, not heap). Eviction is
  * provider-implemented, so the contract is pinned on each.
  */
class StreamDedupSpec extends SparkSuite {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val Providers: Seq[(String, Option[String])] = Seq(
    "hdfs_heap" -> None, // the session default
    "rocksdb" -> Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))

  private def withProvider(provider: Option[String])(body: => Unit): Unit =
    provider match {
      case None => body
      case Some(cls) =>
        val saved = spark.conf.getOption(ProviderKey)
        spark.conf.set(ProviderKey, cls)
        try body
        finally saved match {
          case Some(v) => spark.conf.set(ProviderKey, v)
          case None => spark.conf.unset(ProviderKey)
        }
    }

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  for ((name, provider) <- Providers) {

    test(s"[$name] cross-batch duplicate within the watermark is dropped; post-eviction replay re-emits") {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      withProvider(provider) {
        val in = MemoryStream[(Long, Timestamp)]
        val deduped = in.toDF().toDF("event_id", "ts")
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("event_id")

        val q = deduped.writeStream
          .format("memory").queryName(s"sdedup_$name")
          .outputMode(OutputMode.Append())
          .start()
        try {
          in.addData((1L, ts(0)), (2L, ts(1)))
          q.processAllAvailable()
          in.addData((1L, ts(2))) // later batch, inside watermark: dropped
          q.processAllAvailable()
          assert(spark.table(s"sdedup_$name").collect().map(_.getLong(0)).sorted
            === Seq(1L, 2L))

          // advance the watermark far past event 1's state (10:00 + 10 min
          // gap << 12:00), then replay id 1: state was evicted, so the
          // replay is treated as new and re-emitted
          in.addData((3L, ts(120)))
          q.processAllAvailable()
          in.addData((1L, ts(121)))
          q.processAllAvailable()
          val ids = spark.table(s"sdedup_$name")
            .collect().map(_.getLong(0)).toSeq.sorted
          assert(ids === Seq(1L, 1L, 2L, 3L))
        } finally q.stop()
      }
    }

    test(s"[$name] duplicates within one batch collapse to a single emission") {
      import spark.implicits._
      implicit val ctx = spark.sqlContext
      withProvider(provider) {
        val in = MemoryStream[(Long, Timestamp)]
        val deduped = in.toDF().toDF("event_id", "ts")
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("event_id")
        val q = deduped.writeStream
          .format("memory").queryName(s"sdedup_b_$name")
          .outputMode(OutputMode.Append())
          .start()
        try {
          in.addData((7L, ts(0)), (7L, ts(1)), (7L, ts(2)), (8L, ts(0)))
          q.processAllAvailable()
          assert(spark.table(s"sdedup_b_$name").collect().map(_.getLong(0)).sorted
            === Seq(7L, 8L))
        } finally q.stop()
      }
    }
  }
}
