package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Incremental sessionization through mapGroupsWithState — the
  * arbitrary-keyed-state primitive applied to the classic
  * gaps-and-islands problem: fold each key's time-ordered events into a
  * chronological session list ((startUs, endUs, n) triples) that
  * persists in the state store across micro-batches.
  *
  * Gap rule matches Spark's `session_window` (and q47's oracle): an
  * event extends the tail session iff its gap to the session end is
  * STRICTLY under `gapUs`; a gap >= gapUs starts a new session.
  *
  * Ordering contract: batches must arrive time-ordered per key (late
  * rows WITHIN a batch are handled by sorting; an event earlier than
  * the tail session's end would be folded against the tail only —
  * the one-pass trade-off every incremental sessionizer makes; a
  * deployment with cross-batch disorder widens the batch boundary or
  * reconciles offline).
  *
  * Scale note: state holds each key's FULL session list, so state
  * grows with session count per key — fine for bounded replays (the
  * registered q71 drains a fixture), wrong for an unbounded stream.
  * The production variant registers an event-time timeout, EMITS
  * closed sessions once the watermark passes their end + gap, and
  * keeps only the open tail session in state (bounded by keys, like
  * q70's join state); the fold below is unchanged by that split.
  */
object Sessionize {

  /** Pure fold: `prev` chronological sessions + this batch's
    * timestamps → updated chronological sessions.
    */
  def fold(prev: List[(Long, Long, Long)], tsBatch: Array[Long],
           gapUs: Long): List[(Long, Long, Long)] = {
    var acc = prev.reverse // reversed: tail session first, O(1) access
    tsBatch.sorted.foreach { ts => // sorted copy: callers keep their array
      acc = acc match {
        case (st0, end, n) :: rest if ts - end < gapUs =>
          (st0, math.max(end, ts), n + 1) :: rest
        case _ => (ts, ts, 1L) :: acc
      }
    }
    acc.reverse
  }

  /** (key, tsMicros) stream → Update-mode (user_id, sessions) frame:
    * each emission restates the key's full chronological session list,
    * so the latest emission per key is the complete answer (sink keeps
    * latest — see q71's idempotent batch_id-partition pattern).
    */
  def sessions(input: Dataset[(Long, Long)], gapUs: Long): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)],
         st: GroupState[List[(Long, Long, Long)]]) =>
          val out = fold(st.getOption.getOrElse(Nil),
            rows.map(_._2).toArray, gapUs)
          st.update(out)
          (user, out)
      }
      .toDF("user_id", "sessions")
  }
}
