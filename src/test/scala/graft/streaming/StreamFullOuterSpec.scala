package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSuite

/** Stream-stream FULL-OUTER join (r16, judge ask #5): both sides'
  * unmatched rows emit null-joined EXACTLY ONCE, at the moment the
  * watermark proves they can never match — semantics q204's one-shot
  * batch oracle cannot observe (they depend on arrival order and
  * watermark progression across micro-batches).
  */
class StreamFullOuterSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("full-outer: unmatched rows from BOTH sides emit null-joined " +
      "exactly once at watermark passage, not before") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, String)]
    val clicks = MemoryStream[(Timestamp, String)]
    val i = imps.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "0 seconds")
    val c = clicks.toDF().toDF("click_ts", "click_ad")
      .withWatermark("click_ts", "0 seconds")
    val joined = i.join(c, expr(
      "ad = click_ad AND click_ts >= imp_ts " +
        "AND click_ts <= imp_ts + INTERVAL 10 MINUTES"), "full_outer")
      .select(col("ad"), col("click_ad"), col("imp_ts"), col("click_ts"))

    val q = joined.writeStream
      .format("memory").queryName("ss_full")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: a matching pair, an orphan impression, an orphan click
      imps.addData((ts(0), "a"), (ts(0), "orphan_imp"))
      clicks.addData((ts(5), "a"), (ts(2), "orphan_click"))
      q.processAllAvailable()
      def rows() = spark.table("ss_full").collect().map { r =>
        (Option(r.getString(0)), Option(r.getString(1)))
      }.toSeq
      // watermark is only min(0, 2) = 10:00 + the engine has no proof
      // the orphans can't still match → only the match emits
      assert(rows().toSet === Set((Some("a"), Some("a"))))

      // batch 2: advance BOTH watermarks past the orphans' windows
      // (imp window closes at 10:10; click eviction at wm > 10:02)
      imps.addData((ts(30), "late_imp"))
      clicks.addData((ts(30), "late_click"))
      q.processAllAvailable()
      val afterEvict = rows()
      // the orphan impression emits with a null click side; the orphan
      // click with a null impression side; each exactly once. (The
      // late pair itself sits inside the trailing window, unevicted.)
      assert(afterEvict.count(_ == ((Some("orphan_imp"), None))) === 1,
        s"orphan impression should null-join once, got $afterEvict")
      assert(afterEvict.count(_ == ((None, Some("orphan_click")))) === 1,
        s"orphan click should null-join once, got $afterEvict")

      // batch 3: nothing re-emits (state was evicted, not re-scanned)
      imps.addData((ts(59), "tail"))
      clicks.addData((ts(59), "tail2"))
      q.processAllAvailable()
      val fin = rows()
      assert(fin.count(_ == ((Some("orphan_imp"), None))) === 1)
      assert(fin.count(_ == ((None, Some("orphan_click")))) === 1)
      // batch 2's late pair: evicted unmatched by batch 3's watermark
      assert(fin.count(_ == ((Some("late_imp"), None))) === 1)
      assert(fin.count(_ == ((None, Some("late_click")))) === 1)
    } finally q.stop()
  }
}
