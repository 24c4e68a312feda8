package graft.ops

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Storage-layout sinks — where 100 TB performance is won before any
  * query runs:
  *
  *  - `partitionedParquet`: hive-style directory partitioning. Reads
  *    that filter on the partition column never open non-matching files
  *    (partition pruning: `PartitionFilters` in the scan, asserted in
  *    SinksSpec).
  *  - `bucketedTable`: pre-shuffles data into a fixed number of buckets
  *    on the join/agg key at WRITE time. Two tables bucketed on the same
  *    key with the same bucket count join with NO exchange on either
  *    side — the shuffle is paid once when writing, not on every query.
  *  - plain parquet: one file per task, no driver funnel.
  */
object Sinks {

  def partitionedParquet(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table registered in the session catalog at an
    * explicit path (bucket metadata lives in the catalog — this is the
    * one sink that must go through `saveAsTable`).
    */
  def bucketedTable(df: DataFrame, table: String, path: String,
                    buckets: Int, keyCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .option("path", path)
      .saveAsTable(table)

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Range-clustered sorted write: rows range-partitioned on `byCol`
    * into `files` output files, sorted within each. Files end up with
    * NON-OVERLAPPING min/max footer stats on `byCol`, so a filtered
    * read skips whole files/row-groups via parquet predicate pushdown —
    * the sort-key analogue of hive partitioning, without the
    * small-partition explosion (the right layout for high-cardinality
    * or continuous cluster keys like timestamps at 100 TB).
    */
  def rangeSortedParquet(df: DataFrame, path: String, byCol: String, files: Int): Unit =
    df.repartitionByRange(files, org.apache.spark.sql.functions.col(byCol))
      .sortWithinPartitions(byCol)
      .write.mode("overwrite").parquet(path)
}
