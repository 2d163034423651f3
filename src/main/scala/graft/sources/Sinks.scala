package graft.sources

import java.util.Properties

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, ArrayType, StructType}

/** K1-K4 — the sink surface (reference: SQLModel batch insert
  * `db.py:9-13`, S3 mover `watcher.py:104-118`, DDL bootstrap
  * `main.py:135-141`, Alembic add-column migration
  * `migrations/versions/e5c6e71f62a6_initial_migration.py:20-28`).
  */
object Sinks {

  /** K1 — batch insert through JDBC: one `df.write.jdbc` append is the
    * micro-batch analog of the reference's session-scoped add+commit
    * loop. Complex columns (the `other_data` map) are serialized to
    * JSON strings first — exactly how the reference stores them in its
    * JSON column.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Properties = new Properties): Unit =
    jdbcReady(df).write.mode("append").jdbc(url, table, props)

  def readJdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new Properties)

  /** Maps/arrays/structs → JSON strings (JDBC has no complex types). */
  def jdbcReady(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: MapType | _: ArrayType | _: StructType =>
          acc.withColumn(f.name, to_json(col(f.name)))
        case _ => acc
      }
    }

  /** K3 — DDL bootstrap: create the table from a declared schema with
    * zero rows (SQLModel.metadata.create_all parity).
    */
  def bootstrap(spark: SparkSession, url: String, table: String,
                schema: StructType): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema).write.mode("append").jdbc(url, table, new Properties)

  /** K2 — processed-file mover (the reference's MoveToS3Handler).
    * Same-filesystem moves rename; cross-filesystem moves (local →
    * `s3a://bucket/...`) copy-then-delete, since Hadoop's rename cannot
    * cross schemes.
    */
  def moveFile(spark: SparkSession, src: String, dst: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new HPath(src)
    val dstPath = new HPath(dst)
    val srcFs = srcPath.getFileSystem(conf)
    val dstFs = dstPath.getFileSystem(conf)
    dstFs.mkdirs(dstPath.getParent)
    if (srcFs.getUri == dstFs.getUri) srcFs.rename(srcPath, dstPath)
    else org.apache.hadoop.fs.FileUtil.copy(
      srcFs, srcPath, dstFs, dstPath, /*deleteSource=*/ true, conf)
  }

  /** K4 — schema evolution on read, upgrade direction: parquet written
    * before and after an added column reads as one table (old rows
    * null-filled), the engine-side form of the reference's
    * `ALTER TABLE ... ADD COLUMN other_data JSON` migration.
    */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** K4 — downgrade direction (the migration's `drop_column`): read
    * post-migration parquet through the OLD declared schema. Columns
    * absent from the declaration are never read — the scan's
    * ReadSchema is the declared subset, so the "drop" is a metadata
    * decision at plan time, no data rewrite — and files that predate
    * the dropped column need no special casing. The engine-side form
    * of rolling a table back one schema version.
    */
  def readDeclared(spark: SparkSession, path: String,
                   schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
