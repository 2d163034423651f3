package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.{ImageHash, ImageSource, SyntheticImages}

/** The image path (S1/S4 binaryFile ingest + glob filter, U1 aHash,
  * J2 content-addressed dedup) registered as a driver-checkable query.
  * Runs over a deterministic synthetic scan directory (sfDir carries no
  * images), so rows-only + ScalaTest golden semantics; excluded from
  * bench (fixture I/O, not engine work).
  */
object ImageQueries {

  val all: Seq[Q] = Seq(
    Q("q44_image_dedup",
      (s, _) => {
        val dir = SyntheticImages.fixtureDir()
        val hashed = ImageSource.withHash(ImageSource.images(s, dir))
        hashed
          .groupBy(col("img_hash"))
          .agg(count(lit(1)).as("n_copies"))
          .select(ImageHash.hexId(col("img_hash")).as("img_id"), col("n_copies"))
          .orderBy(col("img_id"))
      },
      None, bench = false))
}
