package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSuite

/** Stream-stream joins with event-time bounds — the "attribute clicks
  * to impressions" shape. Both sides carry watermarks and the join
  * condition bounds event-time distance, so each side's buffered state
  * is evicted once the watermark passes the bound: state stays
  * proportional to the time window, not the stream, at any scale.
  */
class StreamJoinSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("inner stream-stream join matches only within the time bound") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, String)]
    val clicks = MemoryStream[(Timestamp, String)]
    val i = imps.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 minutes")
    val c = clicks.toDF().toDF("click_ts", "click_ad")
      .withWatermark("click_ts", "10 minutes")
    val joined = i.join(c, expr(
      "ad = click_ad AND click_ts >= imp_ts " +
        "AND click_ts <= imp_ts + INTERVAL 10 MINUTES"))
      .select(col("ad"), col("imp_ts"), col("click_ts"))

    val q = joined.writeStream
      .format("memory").queryName("ss_inner")
      .outputMode(OutputMode.Append())
      .start()
    try {
      imps.addData((ts(0), "a"), (ts(1), "b"))
      clicks.addData((ts(5), "a")) // 5 min after impression a: joins
      q.processAllAvailable()
      assert(spark.table("ss_inner").collect()
        .map(r => (r.getString(0), r.getTimestamp(2))).toSeq ===
        Seq(("a", ts(5))))

      clicks.addData((ts(30), "b")) // 29 min after impression b: outside bound
      q.processAllAvailable()
      assert(spark.table("ss_inner").count() === 1)
    } finally q.stop()
  }

  test("stream-static enrichment: broadcast dimension join per micro-batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq(("a", "Alpha"), ("b", "Beta")).toDF("ad", "name")
    val events = MemoryStream[(Timestamp, String)]
    val enriched = events.toDF().toDF("ts", "ad")
      .join(broadcast(dim), Seq("ad"), "left")
      .select(col("ad"), col("name"))

    val q = enriched.writeStream
      .format("memory").queryName("ss_static")
      .outputMode(OutputMode.Append())
      .start()
    try {
      events.addData((ts(0), "a"), (ts(1), "b"), (ts(2), "unknown"))
      q.processAllAvailable()
      val rows = spark.table("ss_static").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(rows === Set(("a", Some("Alpha")), ("b", Some("Beta")),
        ("unknown", None)))
    } finally q.stop()
  }

  test("left-outer join emits unmatched impressions after watermark eviction") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, String)]
    val clicks = MemoryStream[(Timestamp, String)]
    val i = imps.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "5 minutes")
    val c = clicks.toDF().toDF("click_ts", "click_ad")
      .withWatermark("click_ts", "5 minutes")
    val joined = i.join(c, expr(
      "ad = click_ad AND click_ts >= imp_ts " +
        "AND click_ts <= imp_ts + INTERVAL 10 MINUTES"), "left_outer")
      .select(col("ad"), col("imp_ts"), col("click_ts"))

    val q = joined.writeStream
      .format("memory").queryName("ss_outer")
      .outputMode(OutputMode.Append())
      .start()
    try {
      imps.addData((ts(0), "a"), (ts(0), "orphan"))
      clicks.addData((ts(4), "a"))
      q.processAllAvailable()
      // matched row emits immediately; the orphan is still buffered —
      // a future click could legally match it
      val afterMatch = spark.table("ss_outer").collect()
        .map(r => (r.getString(0), Option(r.getTimestamp(2)))).toSet
      assert(afterMatch === Set(("a", Some(ts(4)))))

      // push both watermarks far past the orphan's join window
      imps.addData((ts(50), "late_i"))
      clicks.addData((ts(50), "late_c"))
      q.processAllAvailable()
      imps.addData((ts(55), "late_i2")) // extra batch so eviction lands
      clicks.addData((ts(55), "late_c2"))
      q.processAllAvailable()
      val rows = spark.table("ss_outer").collect()
        .map(r => (r.getString(0), Option(r.getTimestamp(2)))).toSet
      assert(rows.contains(("orphan", None)),
        s"expected evicted orphan with null click, got $rows")
    } finally q.stop()
  }
}
