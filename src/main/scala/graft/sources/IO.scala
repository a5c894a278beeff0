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

  /** Range-partitioned, sorted parquet layout for range-predicate scans:
    * `repartitionByRange(col)` + `sortWithinPartitions(col)` gives every
    * output file a TIGHT, pairwise-disjoint min/max on `col`, so a
    * range-filtered read ("yesterday's errors") skips whole files and row
    * groups on parquet footer statistics alone — the layout behind
    * time-window queries over a 100 TB history store. Directory
    * partitioning (writePartitioned) prunes at day granularity; this
    * prunes WITHIN a partition too, and keeps file count decoupled from
    * key cardinality (a day with 10⁹ rows still gets size-appropriate
    * files, not one directory entry). Equal key values land in one file
    * (range partitioner), so skipped files provably hold no matches. */
  def writeRangeSorted(df: DataFrame, path: String, colName: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, df(colName))
      .sortWithinPartitions(colName)
      .write.mode("overwrite").parquet(path)

  /** Small-files compaction for a parquet store. Streaming sinks write one
    * file set per micro-batch (the upsert/index sinks here do), and a
    * store of 10⁵ kilobyte files costs more in scan-task launch and
    * footer reads than in data — the classic operational decay of a
    * long-running pipeline. Rewrites the store into
    * ceil(bytes / targetBytes) files via a round-robin repartition (no
    * key skew: compaction balances FILE SIZES, a hash repartition would
    * inherit the data's skew), through a tmp dir + swap because the plan
    * reads the store it replaces. Returns (filesBefore, filesAfter).
    *
    * Partitioned stores should compact per partition (pass the partition
    * dir) so untouched partitions keep their files — at 100 TB compaction
    * is an incremental maintenance job over recent partitions, never a
    * full-store rewrite. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    spark.read.parquet(path).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
    val after = fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (dataFiles.length, after)
  }
}
