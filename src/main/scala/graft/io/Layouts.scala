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
