package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSuite

/** Watermarked event-time aggregation semantics (the streaming side of
  * q45's tumbling windows): windows finalize when the watermark passes,
  * and data later than the watermark is dropped.
  */
class StreamingWindowSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window with watermark drops late data (append mode)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val counts = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("n"))

    val q = counts.writeStream
      .format("memory").queryName("win_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((ts(0), 1.0), (ts(2), 1.0), (ts(7), 1.0))
      q.processAllAvailable()
      // watermark = 10:07 - 10min = 09:57 -> nothing finalized yet
      assert(spark.table("win_test").count() === 0)

      input.addData((ts(21), 1.0)) // advances watermark to 10:11
      q.processAllAvailable()
      // [10:00,10:05) n=2 and [10:05,10:10) n=1 are final now
      val closed = spark.table("win_test")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      assert(closed === Map("2024-01-01 10:00:00.0" -> 2L,
                            "2024-01-01 10:05:00.0" -> 1L))

      // 10:03 is behind the 10:11 watermark: dropped, no new output
      input.addData((ts(3), 1.0), (ts(22), 1.0))
      q.processAllAvailable()
      assert(spark.table("win_test").count() === 2)
    } finally q.stop()
  }

  test("streaming session window merges within gap, splits across it") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val sessions = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user"), session_window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("w.start").as("start"), col("n"))

    val q = sessions.writeStream
      .format("memory").queryName("sess_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // u1: 10:00,10:03 merge (gap 3m); 10:20 is a second session
      input.addData((ts(0), "u1"), (ts(3), "u1"), (ts(20), "u1"))
      q.processAllAvailable()
      input.addData((ts(45), "u1")) // watermark past both sessions
      q.processAllAvailable()
      val done = spark.table("sess_test")
        .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2))).toSet
      assert(done === Set(("2024-01-01 10:00:00.0", 2L),
                          ("2024-01-01 10:20:00.0", 1L)))
    } finally q.stop()
  }
}
