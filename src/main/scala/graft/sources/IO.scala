package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers beyond the driver's parquet tables.
  *
  * The reference ingests JSON log batches over HTTP and persists JSON
  * history files (/root/reference/src/ingestion/new_relic_fetcher.py,
  * /root/reference/src/dashboard/app.py:46-95). At engine scale those
  * become file sources/sinks:
  *
  *  - always pass an explicit schema to json/csv (schema inference is a
  *    full extra pass over 100 TB);
  *  - write fact tables partitioned by a low-cardinality column so reads
  *    prune partitions (`PartitionFilters` in `.explain`);
  *  - json for interchange, parquet for anything queried again.
  */
object IO {

  /** NDJSON log batches (the shape the reference's API returns). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Partitioned parquet sink — the default for anything re-queried.
    * Partition columns become directories, so filters on them never touch
    * excluded files. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** JSON export (dashboard-history shape). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Bucketed managed table: both sides of a repeated large-to-large join
    * bucketed on the join key never exchange at read time (co-located
    * scans). The sort makes merge joins sort-free too. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol).saveAsTable(table)
}
