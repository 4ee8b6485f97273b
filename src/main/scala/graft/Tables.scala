package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects; read it
    * as a Long of epoch-nanoseconds instead (exact — no µs truncation), and
    * derive a µs `TimestampType` column where needed via `ts DIV 1000`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
