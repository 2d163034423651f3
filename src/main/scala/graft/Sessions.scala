package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's local sessions so scan-affecting
  * config is set at construction, not mutated mid-query (events.parquet
  * carries TIMESTAMP(NANOS), readable only with nanosAsLong).
  */
object Sessions {

  /** Sort-fallback threshold for ObjectHashAggregateExec (distinct keys
    * per partition before it abandons hashing and sorts the rest of the
    * partition). The engine's TypedImperativeAggregates (MinHashAgg /
    * SimHashAgg / MisraGriesAgg) group by doc_id, so distinct keys per
    * partition = docs/partitions — far past Spark's default of 128,
    * which made EVERY partition sort its whole exploded-gram stream and
    * spill under session memory pressure (the r6 bench blow-up: q41
    * 69.3 s in-session vs 10.0 s isolated).
    *
    * Sizing: the buffers are small primitives (MinHashAgg k=32 → 256 B,
    * SimHashAgg 56 bits → 224 B; ~400 B/key with map overhead), so
    * 2^21 keys bounds the per-task hash map at ~800 MB — safe under
    * this host's heap at full parallelism, and on a real cluster
    * shuffle partitioning is sized so groups/partition stays well under
    * this anyway (past it, Spark's sort-based fallback is the correct
    * behavior, not a bug).
    */
  val ObjectHashFallbackThreshold: Int = 1 << 21

  def local(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      ObjectHashFallbackThreshold.toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
