package graft.io

import org.apache.spark.sql.DataFrame

/** Physical-layout helpers for the cluster-scale deployment.
  *
  * At 100 TB the dominant cost of repeated fact-to-fact joins and
  * aggregations is the shuffle. Bucketing fixes the partitioning at write
  * time: two tables bucketed by the same key into the same bucket count
  * join with ZERO exchanges (and aggregation on the bucket key skips its
  * shuffle too). The trade: a one-time clustered write + a metastore
  * entry per table.
  */
object Layouts {

  /** Write `df` as a parquet table bucketed (and sorted) by one or more
    * keys. Joins/aggregations on exactly those keys between tables
    * sharing `buckets` then run shuffle-free — verified by
    * `LayoutsSpec`. Bucket by the FULL join key list with `buckets`
    * equal to `spark.sql.shuffle.partitions`: a subset bucketing is
    * ignored by the planner for multi-key joins, and a mismatched
    * bucket count forces the probe side to re-shuffle to it.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, moreKeys: String*): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .saveAsTable(table)

  /** Repartition-then-write for plain directories (no metastore): gives
    * one file per key-range so downstream range predicates prune files,
    * but unlike bucketing does NOT carry partitioning metadata into
    * future joins.
    */
  def writeRangeClustered(df: DataFrame, dir: String, key: String,
      partitions: Int): Unit =
    df.repartitionByRange(partitions, df(key))
      .sortWithinPartitions(df(key))
      .write.mode("overwrite").parquet(dir)

  /** Balanced, size-capped shard write: AQE's REBALANCE hint splits
    * oversized and coalesces undersized post-shuffle partitions to the
    * advisory size at runtime (no counting pass, skew handled), and
    * `maxRecordsPerFile` hard-caps what one file can hold. The answer
    * to "a 100 TB job must not emit 7 files of 3 TB next to 40k of
    * 2 MB" — downstream scan parallelism is set by this layout.
    */
  def writeSizedShards(df: DataFrame, dir: String,
      maxRecordsPerFile: Long): Unit =
    df.hint("rebalance")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dir)

  /** Compact a parquet directory into files near `targetBytes` — the
    * ACTION behind `Statistics.fileSizeProfile`'s small-file warning.
    * The target file count comes from the directory's on-disk byte
    * total (FS metadata, no data pass), then one rebalance-hinted
    * write re-lays the data: AQE splits oversized and coalesces
    * undersized post-shuffle partitions at runtime, so skewed inputs
    * still land near the target without a counting job. Writes to
    * `destDir` (never in place — the source stays readable until the
    * caller swaps directories), preserving any Hive `col=value`
    * subdirectory columns Spark surfaces on read.
    *
    * A 40k-small-file directory is a scheduler DoS at 100 TB scan time
    * (one task per file, open/footer overhead dominating); compaction
    * is the standing maintenance job that keeps scan parallelism set
    * by data size, not by ingest batch boundaries.
    *
    * Sizing uses the source's on-disk (compressed) byte total, so a
    * round-robin `repartition` to `ceil(total / targetBytes)`
    * partitions lands files near `targetBytes` at similar re-written
    * compression — unlike AQE's advisory partition size, which tracks
    * in-memory shuffle bytes and over-shoots parquet files ~3-5×.
    *
    * @return the file count written (one per partition)
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      destDir: String, targetBytes: Long = 512L << 20): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val files = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(dir)
      .repartition(files)
      .write.mode("overwrite").parquet(destDir)
    files
  }

  /** Hive-style directory partitioning (`dir/col=value/...`): the
    * layout for low-cardinality pruning columns (language, date,
    * source). Readers with an equality/IN predicate on `cols` touch
    * only matching directories — partition pruning happens before any
    * file is opened. Combine with [[writeSizedShards]] semantics via
    * `maxRecordsPerFile` to keep per-directory files bounded.
    */
  def writeHivePartitioned(df: DataFrame, dir: String, cols: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(dir)
}
