package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. The driver hash-compares the two at
  * sf0.01 (see Verify.scala), sorting columns by name — so Spark column
  * aliases and SQL `AS` names must match exactly.
  *
  * Determinism contract for oracle-checked queries:
  *  - every output row set is totally ordered by an explicit, unique
  *    ORDER BY (both sides), so row hashing can't flap;
  *  - money/measure aggregates go through DecimalType (exact, order-
  *    independent) rather than floating-point sums, then are cast to a
  *    fixed final decimal type on both sides;
  *  - averages are computed as exact-decimal SUM divided by COUNT in
  *    double (one deterministic IEEE division), never engine-native
  *    AVG(double) whose accumulation order is unspecified;
  *  - timestamps are emitted as formatted strings or dates (parquet
  *    timezone annotation differs between the engines' writers).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** included in Bench's headline timing set */
    bench: Boolean = true)

object Q {
  /** Assemble a registry into the SparkEntry.queries shape. */
  def queryMap(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap

  def oracleMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
