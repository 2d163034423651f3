package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSuite

/** Cross-batch contract of q71's sessionizer: state in the store must
  * carry PARTIAL sessions across micro-batches — a session open at a
  * batch boundary merges with the next batch's events (StatefulStream
  * Spec covers the primitive; this pins the exact fold q71 registers).
  */
class SessionizeSpec extends SparkSuite {

  private val Min = 60L * 1000000 // one minute in micros
  private val Gap = 10 * Min

  test("fold merges within gap, splits at gap, across calls") {
    // one shot
    assert(Sessionize.fold(Nil, Array(0L, 5 * Min, 30 * Min), Gap) ===
      List((0L, 5 * Min, 2L), (30 * Min, 30 * Min, 1L)))
    // incremental: same result when the batch boundary falls mid-session
    val b1 = Sessionize.fold(Nil, Array(0L, 5 * Min), Gap)
    assert(Sessionize.fold(b1, Array(30 * Min), Gap) ===
      List((0L, 5 * Min, 2L), (30 * Min, 30 * Min, 1L)))
    // boundary rule: gap == threshold starts a new session (q47's rule)
    assert(Sessionize.fold(Nil, Array(0L, Gap), Gap) ===
      List((0L, 0L, 1L), (Gap, Gap, 1L)))
    assert(Sessionize.fold(Nil, Array(0L, Gap - 1), Gap) ===
      List((0L, Gap - 1, 2L)))
    // unsorted batch is sorted before folding
    assert(Sessionize.fold(Nil, Array(5 * Min, 0L), Gap) ===
      List((0L, 5 * Min, 2L)))
  }

  test("q71's stateful sessions equal q47's session_window sessions") {
    // two independent operators over the same ground truth: the
    // mapGroupsWithState fold and Spark's session_window must produce
    // identical (user, start, n) sessions on the events table
    val dir = "/root/testdata/sf0.001"
    val q71 = graft.SparkEntry.queries("q71_stateful_sessions")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1).take(19), r.getLong(3))).toSet
    val q47 = graft.SparkEntry.queries("q47_session_window")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(q71.nonEmpty && q71 === q47)
  }

  test("state store carries an open session across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = Sessionize.sessions(input.toDS(), Gap).writeStream
      .format("memory").queryName("sessionize_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData((1L, 0L), (1L, 5 * Min), (2L, 0L))
      q.processAllAvailable()
      // batch 2: user 1's 8-min event lands 3 min after the open
      // session's end -> must MERGE, not open a new session; the
      // 30-min event then splits
      input.addData((1L, 8 * Min), (1L, 30 * Min))
      q.processAllAvailable()
      val latest = spark.table("sessionize_test")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))))
        .groupBy(_._1).map { case (u, emits) =>
          // Update mode re-emits per batch; the longest (latest) list
          // per user is the final state
          u -> emits.map(_._2).maxBy(ss => (ss.map(_._3).sum, ss.size))
        }
      assert(latest(1L) === Seq((0L, 8 * Min, 3L), (30 * Min, 30 * Min, 1L)))
      assert(latest(2L) === Seq((0L, 0L, 1L)))
    } finally q.stop()
  }
}
