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
  */
class StreamDedupSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("cross-batch duplicate within the watermark is dropped; post-eviction replay re-emits") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val deduped = in.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

    val q = deduped.writeStream
      .format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((1L, ts(0)), (2L, ts(1)))
      q.processAllAvailable()
      in.addData((1L, ts(2))) // later batch, inside watermark: dropped
      q.processAllAvailable()
      assert(spark.table("sdedup").collect().map(_.getLong(0)).sorted
        === Seq(1L, 2L))

      // advance the watermark far past event 1's state (10:00 + 10 min
      // gap << 12:00), then replay id 1: state was evicted, so the
      // replay is treated as new and re-emitted
      in.addData((3L, ts(120)))
      q.processAllAvailable()
      in.addData((1L, ts(121)))
      q.processAllAvailable()
      val ids = spark.table("sdedup").collect().map(_.getLong(0)).toSeq.sorted
      assert(ids === Seq(1L, 1L, 2L, 3L))
    } finally q.stop()
  }

  test("duplicates within one batch collapse to a single emission") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val deduped = in.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup_b")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((7L, ts(0)), (7L, ts(1)), (7L, ts(2)), (8L, ts(0)))
      q.processAllAvailable()
      assert(spark.table("sdedup_b").collect().map(_.getLong(0)).sorted
        === Seq(7L, 8L))
    } finally q.stop()
  }
}
