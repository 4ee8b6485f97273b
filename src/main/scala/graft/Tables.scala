package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the synthetic test tables described in TESTDATA.md.
  *
  * One parquet file per table under `dir` (e.g. /root/testdata/sf0.01).
  * At the 100 TB target each "file" becomes a partitioned directory; the
  * reader below is agnostic to that (Spark handles both transparently).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Every query path passes through here: make sure the graft_* custom
    // expressions resolve in this session (idempotent; clusters can use
    // spark.sql.extensions=graft.functions.GraftExtensions instead).
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` contract downstream: epoch-nanosecond Long. The testdata
    * generator has shipped the column two ways across rounds — parquet
    * TIMESTAMP(NANOS) (which Spark 4 rejects unless read as Long via
    * `nanosAsLong`, exactly) and TIMESTAMP(MICROS) (which arrives as
    * TIMESTAMP_NTZ). [[tsAsNanos]] folds both into the same Long-nanos
    * column, so every window/session/as-of consumer does exact integer
    * arithmetic and agrees with DuckDB's `epoch_ns(ts)` on either file
    * generation (session tz is UTC, so the NTZ wall-clock → epoch mapping
    * is the same one DuckDB uses).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsAsNanos(load(s, d, "events"))
  }

  /** Normalize a `ts` column to epoch-nanosecond Long in place (no-op when
    * already Long). Works on streaming DataFrames too — pure projection.
    */
  def tsAsNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case _ =>
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
