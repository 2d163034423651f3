package graft.operators

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** COLUMN MAPPING — stable physical identities under logical renames
  * (the Delta `columnMapping` idea, reconstructed): every field of a
  * MAPPED table's declared schema carries
  *
  *   - `graft.id`        a stable, strictly-increasing column id,
  *   - `graft.physical`  the name the column lives under in DATA FILES
  *                       and MANIFEST STATS TOKENS (never changes once
  *                       assigned),
  *   - `graft.dropped`   tombstone marker: the field is retired from
  *                       the visible schema but stays in the header so
  *                       the id high-water mark never regresses and
  *                       its physical name stays reserved — re-adding
  *                       the same LOGICAL name mints a fresh id and a
  *                       fresh physical (`c<id>`), so dropped data can
  *                       never silently resurrect.
  *
  * RENAME = update the logical name, keep id+physical (files and zone
  * maps untouched — metadata-only). DROP = set the tombstone
  * (metadata-only; the bytes remain in existing files until a rewrite
  * — compaction/OPTIMIZE physically purge, the GDPR note). Activation
  * happens at the FIRST rename/drop: every live field gets id =
  * ordinal, physical = its then-current name (so all existing data
  * reads unchanged); unmapped tables take exactly the pre-mapping code
  * paths, byte-for-byte. Mapped tables declare the `colmap` protocol
  * feature — a mapping-blind reader would resolve renamed columns to
  * nulls, which is precisely the silent-wrong-results class the
  * feature gate exists to refuse.
  */
object ColumnMapping {

  val IdKey = "graft.id"
  val PhysKey = "graft.physical"
  val DroppedKey = "graft.dropped"

  /** The name this field's data lives under in files + stats tokens. */
  def physical(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey)
    else f.name

  def isDropped(f: StructField): Boolean =
    f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)

  /** Has mapping ever been activated on this schema? */
  def isMapped(st: StructType): Boolean =
    st.fields.exists(f => f.metadata.contains(PhysKey) ||
      f.metadata.contains(IdKey) || f.metadata.contains(DroppedKey))

  /** The user-facing schema: tombstones filtered out, mapping
    * metadata retained on live fields (reads need the physicals).
    */
  def visible(st: StructType): StructType =
    StructType(st.fields.filterNot(isDropped))

  /** Column-id high-water mark — includes tombstones, so ids (and the
    * `c<id>` physicals minted from them) are never reused.
    */
  def maxId(st: StructType): Long =
    st.fields.map(f =>
      if (f.metadata.contains(IdKey)) f.metadata.getLong(IdKey) else 0L)
      .foldLeft(0L)(math.max)

  /** The declared schema renamed to PHYSICAL names (tombstones
    * dropped) — what [[VersionedTable]] reads data files with.
    */
  def physicalSchema(st: StructType): StructType =
    StructType(visible(st).fields.map(f => f.copy(name = physical(f))))

  /** logical name → physical name over the visible fields. */
  def toPhysical(st: StructType): Map[String, String] =
    visible(st).fields.map(f => f.name -> physical(f)).toMap

  /** physical name → logical name over the visible fields (a dropped
    * column's physical maps to nothing — its stats tokens orphan
    * harmlessly and stop being re-collected).
    */
  def toLogical(st: StructType): Map[String, String] =
    visible(st).fields.map(f => physical(f) -> f.name).toMap

  private def withMeta(f: StructField, id: Long, phys: String,
                       dropped: Boolean = false): StructField = {
    val b = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(IdKey, id).putString(PhysKey, phys)
    if (dropped) b.putBoolean(DroppedKey, true)
    f.copy(metadata = b.build())
  }

  /** Activation: stamp every field with id = ordinal and physical =
    * its current name. Idempotent on already-mapped schemas.
    */
  def activate(st: StructType): StructType =
    if (isMapped(st)) st
    else StructType(st.fields.zipWithIndex.map { case (f, i) =>
      withMeta(f, i + 1L, f.name)
    })

  /** A brand-new field joining a MAPPED schema: fresh id, synthetic
    * collision-free physical.
    */
  def mintField(f: StructField, id: Long): StructField =
    withMeta(f, id, s"c$id")

  /** Tombstone `f` (keeps id + physical reserved). */
  def drop(f: StructField): StructField = {
    val b = new MetadataBuilder().withMetadata(f.metadata)
      .putBoolean(DroppedKey, true)
    f.copy(metadata = b.build())
  }

  /** Strip mapping metadata from a REPORTED schema where callers
    * shouldn't see it (DataFrame outputs keep logical names only).
    */
  def stripMeta(st: StructType): StructType =
    StructType(st.fields.map(_.copy(metadata = Metadata.empty)))

  /** Map prune ranges stated over LOGICAL names onto the physical
    * stats-token names of `schemaOpt` — identity for unmapped tables
    * and for names the mapping doesn't know (conservative: an unknown
    * name matches no stats and prunes nothing).
    */
  def mapRanges(schemaOpt: Option[StructType],
                ranges: Seq[VersionedTable.PruneRange])
      : Seq[VersionedTable.PruneRange] = schemaOpt match {
    case Some(st) if isMapped(st) =>
      val m = toPhysical(st)
      ranges.map {
        case r: VersionedTable.LongRange =>
          r.copy(col = m.getOrElse(r.col, r.col))
        case r: VersionedTable.StrRange =>
          r.copy(col = m.getOrElse(r.col, r.col))
        case r: VersionedTable.KeyProbe =>
          r.copy(col = m.getOrElse(r.col, r.col))
        case r: VersionedTable.BucketProbe =>
          r.copy(col = m.getOrElse(r.col, r.col))
      }
    case _ => ranges
  }
}
