package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Random-hyperplane (sign) LSH for cosine similarity — the scale path
  * for nearest-neighbor search: vectors that land in the same bucket of
  * any table are candidates; only candidates are scored. Bucketing is a
  * plain column expression, so candidate generation is an equi-join on
  * (table, bucket) — a hash-partitioned shuffle, never an all-pairs
  * product.
  *
  * Hyperplanes are generated driver-side from a fixed seed (java LCG —
  * stable across JVMs), so signatures are deterministic run-to-run.
  */
object VectorLsh {

  /** `numTables` independent sets of `numPlanes` Gaussian hyperplanes. */
  def hyperplanes(numTables: Int, numPlanes: Int, dim: Int,
                  seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numTables)(Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian())))
  }

  // native codegen'd dot against the literal plane (bit-identical to
  // the aggregate/zip_with form, so bucket signs are unchanged); with
  // T tables × P planes this runs T·P dots per row — the signature
  // pass is the scan-dominated cost at scale
  private def dotConst(emb: Column, plane: Array[Double]): Column =
    VectorFunctions.dotNative(emb, typedLit(plane.toSeq))

  /** Sign-bit bucket id of `emb` (array<double>) under one table. */
  def bucket(emb: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotConst(emb, p) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** (table_id, bucket) pairs for an embedding — explode to index a row
    * into every table.
    */
  def buckets(emb: Column, tables: Seq[Seq[Array[Double]]]): Column =
    array(tables.zipWithIndex.map { case (planes, t) =>
      struct(lit(t).as("tbl"), bucket(emb, planes).as("bucket"))
    }: _*)

  /** Cosine over unit-normalized doubles reduces to a dot product. */
  def cosine(a: Column, b: Column): Column = VectorFunctions.cosine(a, b)
}
