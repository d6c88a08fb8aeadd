package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format adapters beyond parquet: CSV (the reference's dimension-table
  * format, cf. the csv lookups under /root/reference/data) and JSON-lines.
  * Schemas are always supplied explicitly — schema inference is a full
  * extra pass over the data and is never acceptable at scale.
  */
object Io {

  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC round-trip — the other columnar format Spark ships natively
    * (predicate pushdown and column pruning work the same way as
    * parquet).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Partitioned parquet writer — the layout that makes downstream
    * partition pruning (`WHERE year = …`) a directory skip.
    */
  def writeParquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Incremental partition refresh: overwrite ONLY the partitions
    * present in `df`, leaving every other partition untouched — the
    * write-side twin of [[graft.operators.Snapshot.diff]] for a
    * recurring pipeline (recompute the changed days/sources, never
    * rewrite the 100 TB table). Uses dynamic partitionOverwriteMode,
    * scoped to this write via the DataFrameWriter option so the
    * session default stays untouched.
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Small-file compaction: rewrite a directory into ~`targetFiles`
    * files. Streaming sinks and per-partition incremental writes leave
    * thousands of KB-sized files whose per-file open/footer cost
    * dominates scans at scale; a periodic coalesce-rewrite restores
    * scan throughput. `coalesce` (not `repartition`) — no shuffle,
    * just fewer write tasks.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    val tmp = path.stripSuffix("/") + ".compact-tmp"
    spark.read.parquet(path).coalesce(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Bucketed + sorted table write: co-locates join keys so equi-joins
    * between tables bucketed the same way need no shuffle at all.
    * (saveAsTable because bucketing metadata lives in the catalog.)
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    writeBucketed(df, tableName, Seq(bucketCol), numBuckets)

  /** Multi-column variant: both join sides bucketed AND joined on the
    * same column list (order matters — bucket hash is positional)
    * equi-join with no exchange.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}
