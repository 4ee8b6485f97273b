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

  /** Write `df` as a parquet table bucketed (and sorted) by `key`.
    * Joins/aggregations on `key` between tables sharing `buckets` then
    * run shuffle-free — verified by `LayoutsSpec`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
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
}
