package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's local sessions so scan-affecting
  * config is set at construction, not mutated mid-query (events.parquet
  * carries TIMESTAMP(NANOS), readable only with nanosAsLong).
  */
object Sessions {
  def local(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
