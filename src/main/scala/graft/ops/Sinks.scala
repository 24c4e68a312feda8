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

  /** Small-file compaction — the maintenance op every long-lived table
    * needs at 100 TB (streaming sinks and fine-grained partition writes
    * accumulate thousands of KB-scale files; scan cost then goes to
    * file-open/footer overhead and the listing, not bytes). Bin-packs
    * the directory's parquet files into ceil(totalBytes/targetBytes)
    * outputs via `coalesce` (partition MERGE — no shuffle, no
    * re-encoding of the data's order beyond file concatenation), writes
    * to a temp directory, then swaps via two renames — a crashed
    * compaction leaves the ORIGINAL or the NEW directory intact, never
    * a mix, and readers holding the old file handles finish their scan
    * (POSIX/HDFS rename semantics). No-ops (and does NOT rewrite) when
    * the directory is already at or below the target file count.
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp0 = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val bak0 = new org.apache.hadoop.fs.Path(path + "__compact_old")
    // crash recovery BEFORE anything else: a run that died between the
    // two renames left the data staged at __compact_old and no table
    // path — finish the rollback; stale staging from any other crash
    // point is residue over a complete table and is simply cleared
    // (without this, the stale bak path blocks every later rename)
    if (!fs.exists(p) && fs.exists(bak0)) {
      if (!fs.rename(bak0, p))
        throw new java.io.IOException(
          s"compact: found crash residue $bak0 but cannot restore it to $path")
    }
    if (fs.exists(tmp0)) fs.delete(tmp0, true)
    if (fs.exists(bak0)) fs.delete(bak0, true)
    val files = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (nOut >= files.length) return (files.length, files.length)
    val tmp = tmp0
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = bak0
    if (!fs.rename(p, bak))
      throw new java.io.IOException(s"compact: cannot stage $path aside")
    if (!fs.rename(tmp, p)) { // roll back: the original directory wins
      fs.rename(bak, p)
      throw new java.io.IOException(s"compact: cannot swap in $tmp")
    }
    fs.delete(bak, true)
    val after = fs.listStatus(p)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }

  /** Z-order (Morton-curve) clustered write: interleave the bits of TWO
    * normalized sort keys and range-partition + sort on the combined
    * z-value. Each output file then covers a small RECTANGLE in
    * (c1, c2) space — its parquet footer min/max are tight on BOTH
    * dimensions, so filtered reads on EITHER key (or both) skip files.
    * A plain sort on c1 gives perfect c1-skipping but every file spans
    * the full c2 range; z-ordering trades a little of each for
    * two-dimensional skipping — the standard lakehouse layout for
    * two-key scan patterns at 100 TB. Keys are min/max normalized to
    * 16-bit ranks with one tiny pre-pass aggregate (two scalars
    * broadcast back; no global sort of raw keys).
    */
  def zOrderedParquet(df: DataFrame, path: String, c1: String, c2: String, files: Int): Unit = {
    import org.apache.spark.sql.functions._
    val b = df.agg(
      min(col(c1)).cast("double").as("min1"), max(col(c1)).cast("double").as("max1"),
      min(col(c2)).cast("double").as("min2"), max(col(c2)).cast("double").as("max2"))
    val withZ = df.crossJoin(broadcast(b))
      .withColumn("__b1",
        round((col(c1).cast("double") - col("min1")) /
          greatest(col("max1") - col("min1"), lit(1e-12)) * 65535).cast("long"))
      .withColumn("__b2",
        round((col(c2).cast("double") - col("min2")) /
          greatest(col("max2") - col("min2"), lit(1e-12)) * 65535).cast("long"))
      .withColumn("__z",
        (0 until 16).map { i =>
          (shiftright(col("__b1"), i).bitwiseAND(1) * lit(1L << (2 * i + 1))) +
            (shiftright(col("__b2"), i).bitwiseAND(1) * lit(1L << (2 * i)))
        }.reduce(_ + _))
    withZ.repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__b1", "__b2", "min1", "max1", "min2", "max2")
      .write.mode("overwrite").parquet(path)
  }
}
