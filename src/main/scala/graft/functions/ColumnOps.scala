package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level helpers shared across the engine's column DSL. */
object ColumnOps {

  /** Let-binding for a single expression tree: evaluates `v` ONCE and
    * binds it to a lambda variable visible to `body`.
    *
    * Why this exists: Catalyst's higher-order functions (`transform`,
    * `filter`, `aggregate`, ...) evaluate interpreted, with no common
    * subexpression elimination — every reference to a derived column
    * inside a lambda re-evaluates its whole subtree PER ELEMENT.
    * A shingle expression that references `tokens(text)` at each of L
    * positions tokenizes the document L times: O(L²) per row (measured
    * ~9× on the sf0.1 gram pipeline). `let(tokens(text)) { ts => ... }`
    * collapses that back to one evaluation; the lambda variable is a
    * bound reference, O(1) per use.
    *
    * Implementation: `transform(array(v), body)[1]` — the standard
    * trick to introduce a binder with built-ins only; one single-element
    * array allocation per row is the entire overhead.
    */
  def let(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Exact fixed-point view of a 2-decimal money column: decimal sums
    * are order-independent under any partitioning (doubles would not).
    */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Final-select discipline — the driver-gate output contract, defined
    * ONCE so the scaling rule cannot drift between query files: NO raw
    * DECIMAL column ever reaches a registered output. The driver's
    * pandas harness reads Spark parquet DECIMAL as `Decimal` objects but
    * DuckDB DECIMAL/HUGEINT as float64, so identical values hash
    * differently. Money outputs are therefore emitted as exact scaled
    * integers: scale each row in the decimal domain (exact — the value
    * is integral after ×10²), THEN sum as bigint; integer addition is
    * associative, so the sum stays order-independent with no
    * decimal→double cast whose rounding could differ between engines.
    */
  def e2(c: Column): Column = (dec2(c) * 100).cast("bigint")

  /** |a ∩ b| over sorted-distinct `array<bigint>` columns — the native
    * codegen'd two-pointer merge ([[graft.expressions.IntersectCountSorted]]);
    * callers own the `array_sort(array_distinct(...))` contract.
    */
  def setIntersectCountSorted(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.IntersectCountSorted(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
