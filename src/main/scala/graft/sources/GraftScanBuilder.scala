package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.VersionedTable.{ColStats, ManifestEntry, StrStats}

/** The graft scan builder: Spark's own parquet DSv2 builder for
  * everything row-shaped, PLUS manifest-answered aggregate pushdown —
  * `SELECT count(*) / min(c) / max(c) FROM graft_table` never opens a
  * data file. The commit log already knows every file's exact row
  * count (written at commit time by the same O(delta) stats scan that
  * builds the zone maps) and exact per-file min/max for the declared
  * stats columns, so a whole-table COUNT/MIN/MAX is a driver-plane
  * fold over manifest lines — the scan plans as a [[LocalScan]]
  * (`LocalTableScanExec`: zero tasks, zero file opens). At 100 TB
  * this is the difference between a metadata lookup and a
  * full-corpus scan for the most common audit queries there are.
  *
  * Safety: the manifest answers ONLY when it provably can —
  * group-by-less aggregations, no pushed data filters (a filtered
  * aggregate's residual Filter keeps Catalyst from attempting the
  * pushdown anyway), every aggregate a COUNT(*)/MIN/MAX, row counts
  * known for every live file (pre-rowcount manifests refuse), and
  * MIN/MAX only on columns where EVERY live file carries a zone map
  * (a file without stats might hold the true extremum — all-null
  * files and undeclared stats columns are indistinguishable in the
  * manifest, so both refuse). Everything else falls through to the
  * delegate parquet builder untouched.
  *
  * Exactness note: zone maps are written from the committed data
  * itself and rewritten whenever a file is (delete/compact/replace),
  * so per-file min/max are exact, not approximate — MIN over the
  * table is the min of per-file los. NULL semantics match Spark's
  * aggregates: min/max ignore nulls (per-file stats already do), and
  * an empty table answers count=0 with null min/max.
  */
class GraftScanBuilder(delegate: ParquetScanBuilder, base: String,
                       entries: Seq[ManifestEntry], schema: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters
    with SupportsPushDownAggregates {

  // ----- filters + column pruning: the delegate's machinery verbatim
  // (zone-map file skipping rides the dataFilters the delegate
  // records — see GraftFileIndex.listFiles)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    delegate.pushFilters(filters)

  override def pushedFilters: Array[Predicate] = delegate.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(requiredSchema)

  // ----- aggregate pushdown: manifest first, parquet footers second

  private var manifestAgg: Option[(StructType, InternalRow)] = None

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    answerFromManifest(agg).isDefined ||
      delegate.supportCompletePushDown(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    answerFromManifest(agg) match {
      case some @ Some(_) => manifestAgg = some.map(identity); true
      case None => delegate.pushAggregation(agg)
    }

  override def build(): Scan = manifestAgg match {
    case Some((st, row)) =>
      GraftScanMetrics.recordAgg(base)
      new GraftManifestAggScan(base, st, row)
    case None =>
      // runtime-filterable wrapper: join keys prune files at
      // execution time through the same zone-map/bloom translation
      // (dynamic file pruning — see GraftRuntimeScan)
      delegate.build() match {
        case p: org.apache.spark.sql.execution.datasources.v2.parquet
            .ParquetScan => new GraftRuntimeScan(p, base, entries, schema)
        case other => other
      }
  }

  /** The column a MIN/MAX references, when it is a plain top-level
    * column of the table (nested fields and expressions refuse).
    */
  private def fieldOf(e: org.apache.spark.sql.connector.expressions
      .Expression): Option[StructField] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      schema.fields.find(_.name == nr.fieldNames.head)
    case _ => None
  }

  /** The manifest's long-encoded stat decoded back to the column
    * type's INTERNAL representation (dates are epoch days = int,
    * timestamps epoch micros = long — exactly what collectStats
    * flattened them from).
    */
  private def internalOf(f: StructField, s: Any): Any = (f.dataType, s) match {
    case (ByteType, l: Long) => l.toByte
    case (ShortType, l: Long) => l.toShort
    case (IntegerType, l: Long) => l.toInt
    case (LongType, l: Long) => l
    case (DateType, l: Long) => l.toInt
    case (TimestampType, l: Long) => l
    case (StringType, s: String) => UTF8String.fromString(s)
    case _ => throw new IllegalStateException(
      s"unreachable: ${f.dataType} stat $s")
  }

  private def statLong(e: ManifestEntry, c: String): Option[(Long, Long)] =
    e.stats.get(c).collect { case ColStats(lo, hi) => (lo, hi) }

  private def statStr(e: ManifestEntry, c: String): Option[(String, String)] =
    e.stats.get(c).collect { case StrStats(lo, hi) => (lo, hi) }

  /** Try to answer the whole aggregation from the manifest. Returns
    * the (schema, single result row) of the complete pushdown, or
    * None to fall through to the parquet delegate.
    */
  private def answerFromManifest(
      agg: Aggregation): Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions.nonEmpty) return None
    if (delegate.pushedFilters.nonEmpty) return None
    if (agg.aggregateExpressions.isEmpty) return None
    val cells = agg.aggregateExpressions.toSeq.map(answerOne)
    if (cells.exists(_.isEmpty)) None
    else {
      val (fields, values) = cells.flatten.unzip
      Some((StructType(fields),
        new GenericInternalRow(values.toArray[Any])))
    }
  }

  private def answerOne(
      f: AggregateFunc): Option[(StructField, Any)] = f match {
    case _: CountStar =>
      // exact only when every live file carries a row count (written
      // since manifests gained #rows=; older manifests refuse).
      // Deletion vectors subtract exactly: live rows = physical −
      // soft-deleted (the dv token carries the exact position count)
      if (entries.exists(_.rows < 0L)) None
      else Some((StructField("count(*)", LongType, nullable = false),
        entries.map(_.liveRows).sum))
    case m: Min => minMax(fieldOf(m.column), isMin = true)
    case m: Max => minMax(fieldOf(m.column), isMin = false)
    case _ => None
  }

  private def minMax(fOpt: Option[StructField],
                     isMin: Boolean): Option[(StructField, Any)] = {
    val f = fOpt.getOrElse(return None)
    val name = s"${if (isMin) "min" else "max"}(${f.name})"
    val out = StructField(name, f.dataType, nullable = true)
    if (entries.isEmpty) return Some((out, null)) // MIN of empty = NULL
    // a deletion vector may have soft-deleted the extremum itself —
    // zone maps describe the PHYSICAL file, so MIN/MAX refuse on any
    // dv'd entry (count stays answerable: the dv count is exact)
    if (entries.exists(_.dv.exists(_.count > 0L))) return None
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType =>
        val per = entries.map(statLong(_, f.name))
        if (per.exists(_.isEmpty)) None // some file has no map: refuse
        else {
          val bounds = per.flatten
          val v = if (isMin) bounds.map(_._1).min else bounds.map(_._2).max
          Some((out, internalOf(f, v)))
        }
      case StringType =>
        val per = entries.map(statStr(_, f.name))
        if (per.exists(_.isEmpty)) None
        else {
          // bytewise UTF-8 order — the order the maps were written in
          // (Spark's UTF8String binary comparison)
          implicit val ord: Ordering[String] =
            (a: String, b: String) =>
              UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
          val bounds = per.flatten
          val v = if (isMin) bounds.map(_._1).min else bounds.map(_._2).max
          Some((out, internalOf(f, v)))
        }
      case _ => None
    }
  }
}

/** A completely-pushed aggregate as a driver-local scan: plans to
  * `LocalTableScanExec` — zero tasks, zero data files opened. The
  * rows were folded from commit-log manifest lines at plan time.
  */
class GraftManifestAggScan(base: String, st: StructType,
                           row: InternalRow) extends LocalScan {
  override def rows(): Array[InternalRow] = Array(row)
  override def readSchema(): StructType = st
  override def description(): String =
    s"GraftManifestAggScan(base=$base, ${st.fieldNames.mkString(", ")})"
}
