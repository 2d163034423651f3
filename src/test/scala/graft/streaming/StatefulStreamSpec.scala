package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.SparkSuite

case class RunningTotal(n: Long, total: Double)

/** Custom keyed state via KeyValueGroupedDataset.mapGroupsWithState —
  * the engine's arbitrary-state primitive (beyond windowed aggs): state
  * persists in the state store across micro-batches and survives
  * per-batch grouping.
  */
class StatefulStreamSpec extends SparkSuite {

  test("mapGroupsWithState accumulates per-key state across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Double)]

    val totals = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: String, rows: Iterator[(String, Double)],
         state: GroupState[RunningTotal]) =>
          val prev = state.getOption.getOrElse(RunningTotal(0L, 0.0))
          val batch = rows.toSeq
          val next = RunningTotal(prev.n + batch.size,
            prev.total + batch.map(_._2).sum)
          state.update(next)
          (user, next.n, next.total)
      }
      .toDF("user", "n", "total")

    val q = totals.writeStream
      .format("memory").queryName("state_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(("u1", 10.0), ("u1", 5.0), ("u2", 1.0))
      q.processAllAvailable()
      input.addData(("u1", 2.0), ("u3", 7.0))
      q.processAllAvailable()
      // latest Update-mode row per user reflects accumulated state
      val latest = spark.table("state_test")
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      assert(latest("u1") === (3L, 17.0)) // state crossed the batch boundary
      assert(latest("u2") === (1L, 1.0))
      assert(latest("u3") === (1L, 7.0))
    } finally q.stop()
  }

  test("stateful query runs on the RocksDB state store provider") {
    // the 100 TB state path: the default HDFSBackedStateStoreProvider
    // keeps every key's state on the executor HEAP (bounded by executor
    // memory); RocksDB spills state to local disk with changelog/full
    // snapshots to the checkpoint location, so per-executor state scales
    // to disk size, not heap. Same query, same results — pinned here so
    // the engine's stateful operators are known-good on the provider a
    // production deployment would configure.
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, Double)]
    val totals = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: String, rows: Iterator[(String, Double)],
         state: GroupState[RunningTotal]) =>
          val prev = state.getOption.getOrElse(RunningTotal(0L, 0.0))
          val batch = rows.toSeq
          val next = RunningTotal(prev.n + batch.size,
            prev.total + batch.map(_._2).sum)
          state.update(next)
          (user, next.n, next.total)
      }
      .toDF("user", "n", "total")
    val q = totals.writeStream
      .format("memory").queryName("rocksdb_state_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(("u1", 10.0), ("u2", 1.0))
      q.processAllAvailable()
      input.addData(("u1", 2.0))
      q.processAllAvailable()
      val latest = spark.table("rocksdb_state_test")
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      assert(latest("u1") === (2L, 12.0)) // state crossed batches on RocksDB
      assert(latest("u2") === (1L, 1.0))
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark bounds state") {
    // the streaming side of q39's content-hash dedup: re-deliveries of
    // the same key inside the watermark horizon are suppressed, and the
    // watermark lets the state store EVICT old keys — unbounded-stream
    // safe, unlike plain dropDuplicates whose state grows forever
    import java.sql.Timestamp
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
    val input = MemoryStream[(String, Timestamp)]
    val deduped = input.toDF().toDF("digest", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("digest")

    val q = deduped.writeStream
      .format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(("a", ts(0)), ("a", ts(1)), ("b", ts(2)))
      q.processAllAvailable()
      input.addData(("a", ts(3))) // duplicate within horizon: suppressed
      q.processAllAvailable()
      assert(spark.table("dedup_test").select("digest")
        .collect().map(_.getString(0)).sorted.toSeq === Seq("a", "b"))
    } finally q.stop()
  }
}
