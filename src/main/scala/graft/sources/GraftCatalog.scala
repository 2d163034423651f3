package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.VersionedTable

/** The graft format as a SQL CATALOG — name-addressed tables with
  * VERSION-AS-OF time travel in plain SQL:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft
  *
  *   CREATE TABLE graft.ns.t (k BIGINT, v BIGINT)
  *   INSERT INTO graft.ns.t VALUES ...
  *   SELECT * FROM graft.ns.t VERSION AS OF 3     -- time travel
  *   UPDATE / DELETE FROM / MERGE INTO graft.ns.t -- the DML surface
  * }}}
  *
  * Identity is the warehouse layout: `<warehouse>/<ns...>/<name>` IS
  * the table's commit-log base — the catalog is stateless metadata
  * resolution over the log the format already owns (the
  * path-as-catalog shape Delta/Iceberg HadoopCatalog use), so there
  * is no second source of truth to drift. `CREATE TABLE` publishes an
  * empty v1 carrying the declared schema header; `VERSION AS OF`
  * resolves through `loadTable(ident, version)` — Spark's own
  * time-travel analysis — onto the same [[GraftTable]] the
  * path-based reads use, so every read/write/DML capability is
  * identical between `format("graft").load(path)` and catalog names.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def basePath(ident: Identifier): String =
    (warehouse +: (ident.namespace().toSeq :+ ident.name()))
      .mkString("/")

  private def load(ident: Identifier, version: Option[Long]): GraftTable = {
    val base = basePath(ident)
    val latest = VersionedTable.latestVersion(base).getOrElse(
      throw new NoSuchTableException(ident))
    val v = version.getOrElse(latest)
    val schema = VersionedTable.declaredSchema(base, v)
      .getOrElse(new StructType())
    new GraftTable(base, Some(v), schema)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` — Spark's time-travel resolution calls this
    * overload with the literal version string.
    */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong))

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "graft time travel is by version (VERSION AS OF n); the commit " +
        "log records no wall-clock authority to resolve TIMESTAMP AS OF")

  override def tableExists(ident: Identifier): Boolean =
    VersionedTable.latestVersion(basePath(ident)).isDefined

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables cluster via OPTIMIZE ZORDER, not PARTITIONED BY")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val base = basePath(ident)
    val s = SparkSession.active
    // an empty v1 whose manifest carries the declared schema header —
    // the table reads as zero rows of that shape until the first write
    VersionedTable.commitAppend(s,
      base, s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    load(ident, None)
  }

  /** `ALTER TABLE ... ADD COLUMNS (...)` — a METADATA-ONLY
    * `alter_schema` commit (zero files touched; old files null-fill at
    * read). Only top-level ADD COLUMN is supported: nested-field
    * surgery, renames, drops and type changes are refused loudly —
    * each either needs a rewrite this format deliberately never does
    * implicitly, or (rename/drop) would silently orphan zone-map and
    * bloom manifest tokens keyed by the old name.
    */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft ALTER TABLE adds top-level columns only, got nested " +
            s"field ${a.fieldNames.mkString(".")}")
        require(a.position() == null,
          "graft ALTER TABLE appends columns at the end (no FIRST/AFTER " +
            "— column order is the declared schema's, not the files')")
        require(a.isNullable,
          s"graft ALTER TABLE: column '${a.fieldNames.head}' must be " +
            "nullable — existing rows have no value to satisfy NOT NULL")
        StructField(a.fieldNames.head, a.dataType(), nullable = true)
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE on graft supports ADD COLUMNS only, got $other — " +
          "schema otherwise evolves through writes (append/merge with " +
          "extra columns); renames/drops/retypes need an explicit rewrite")
    }
    VersionedTable.alterAddColumns(basePath(ident), adds)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val base = Paths.get(basePath(ident))
    if (!Files.isDirectory(base)) return false
    // depth-first delete of the table directory (log + data)
    val stream = Files.walk(base)
    try stream.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.delete)
    finally stream.close()
    true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    val dst = Paths.get(basePath(to))
    Files.createDirectories(dst.getParent)
    Files.move(Paths.get(basePath(from)), dst)
    ()
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get((warehouse +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(dir)) return Array.empty
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .filter(p => Files.isDirectory(p.resolve("_log")))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally stream.close()
  }

  // -------------------------------------------------------------------
  // Maintenance procedures — `CALL graft.system.<proc>(...)` (see
  // [[GraftProcedures]]). The table argument resolves through the SAME
  // warehouse layout the name-based reads use, dots separating
  // namespace levels exactly as in `graft.ns.t`.

  private def tableBase(dotted: String): String =
    (warehouse +: dotted.split('.').toSeq.filter(_.nonEmpty)).mkString("/")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system"))) GraftProcedures.identifiers
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    val found =
      if (ident.namespace().sameElements(Array("system")))
        GraftProcedures.load(ident.name(), tableBase)
      else None
    found.getOrElse(throw new RuntimeException(
      s"no such graft procedure: ${ident.namespace().mkString(".")}." +
        s"${ident.name()} (have: system.{${GraftProcedures.names.mkString(",")}})"))
  }
}
