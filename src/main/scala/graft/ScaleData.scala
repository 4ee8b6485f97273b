package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an R×-scale fixture set from a driver testdata directory
  * (round-8 task: scale-validate the suite at sf1 = 10 × sf0.1 without
  * touching the read-only driver generator).
  *
  * Construction, per replica k (replica 0 is the source data verbatim,
  * so literal-id queries keep their referents):
  *  - every id column shifts by k·10⁸ — disjoint id spaces, and 10⁸ is
  *    divisible by every modulus the queries slice on (%5, %10, %50),
  *    so train/test/dup-plant slices scale proportionally;
  *  - foreign keys shift by the SAME offset, so join fan-out per key is
  *    preserved (customer→orders→lineitem, part/supplier→lineitem,
  *    user→events);
  *  - region/nation stay fixed (dimension tables don't grow with sf,
  *    matching TPC-H);
  *  - document text: every token gets a replica suffix (`_r<k>`) — an
  *    INJECTIVE vocabulary renaming, so within-replica Jaccard/shingle/
  *    window structure is EXACTLY preserved (organic near-dup pairs
  *    scale linearly with the corpus) while cross-replica token overlap
  *    is zero (replicas don't read as near-dups of each other, so dup
  *    density stays linear instead of the R²-inflated shape the bench's
  *    20×-replica stress probe plants on purpose). Every 50th doc keeps
  *    its base text verbatim — cross-replica exact-dup cliques of size
  *    R, the mass-duplication shape exact dedup must collapse.
  *    The rename is an in-place regexp (whitespace preserved
  *    byte-exact, so distinct base texts stay distinct in every
  *    replica); `n_chars` is recomputed from the rebuilt text, keeping
  *    the source invariant n_chars = length(text);
  *  - embeddings: circular shift by (k·7) mod 64 (norm- and
  *    within-replica-geometry-preserving; all shifts distinct for
  *    R ≤ 10 since 7 is invertible mod 64), with every 50th vector
  *    identical across replicas — planted duplicate cliques.
  *
  * Usage: runMain graft.ScaleData <outDir> [replicas=10] [srcDir=sf0.1]
  */
object ScaleData {

  private val Off = 100000000L

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val replicas = if (args.length > 1) args(1).toInt else 10
    val srcDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-scale-data")
    try generate(spark, outDir, replicas, srcDir)
    finally spark.stop()
  }

  def generate(spark: SparkSession, outDir: String, replicas: Int,
      srcDir: String): Unit = {
    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scale-data] wrote $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }
    def shifted(c: String, k: Int) = (col(c) + lit(k * Off)).as(c)
    def suffixed(c: String, k: Int) =
      (if (k == 0) col(c) else concat(col(c), lit(s"_r$k"))).as(c)
    def rep(f: Int => DataFrame): DataFrame =
      (0 until replicas).map(f).reduce(_ unionByName _)

    write("region", src("region"))
    write("nation", src("nation"))
    val customer = src("customer")
    write("customer", rep(k => customer.select(
      shifted("c_custkey", k), suffixed("c_name", k), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"))))
    val supplier = src("supplier")
    write("supplier", rep(k => supplier.select(
      shifted("s_suppkey", k), suffixed("s_name", k), col("s_nationkey"),
      col("s_acctbal"))))
    val part = src("part")
    write("part", rep(k => part.select(
      shifted("p_partkey", k), suffixed("p_name", k), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice"))))
    val orders = src("orders")
    write("orders", rep(k => orders.select(
      shifted("o_orderkey", k), shifted("o_custkey", k),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"))))
    val lineitem = src("lineitem")
    write("lineitem", rep(k => lineitem.select(
      shifted("l_orderkey", k), shifted("l_partkey", k),
      shifted("l_suppkey", k), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))))
    // Normalize ts to TIMESTAMP(MICROS) whatever the source generation:
    // a TIMESTAMP(NANOS)-round fixture arrives as Long (the global
    // nanosAsLong flag) and would otherwise be WRITTEN as BIGINT, on
    // which every events oracle's epoch_ns(ts) fails to bind. µs
    // truncation is the emitted-timestamp contract; current-generation
    // (µs) sources pass through unchanged.
    val events0 = src("events")
    val events =
      if (events0.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        events0.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else events0
    write("events", rep(k => events.select(
      shifted("event_id", k), col("ts"), shifted("user_id", k),
      col("event_type"), col("value"), col("props"))))
    val documents = src("documents")
    write("documents", rep { k =>
      // suffix every maximal non-space run in place (regexp_replace),
      // NOT split/concat_ws: the split form collapsed whitespace runs
      // and trimmed, so two base docs differing only in whitespace
      // became IDENTICAL strings in every k>0 replica — unplanted
      // cross-doc exact dups that broke the linear-dup-density
      // invariant (and turned null/blank text into a bare "_rk" token).
      // In-place replacement keeps the original whitespace byte-exact.
      val renamed =
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"$$1_r$k")
      val text = when(col("doc_id") % 50 === 0, col("text"))
        .otherwise(renamed)
      documents.select(shifted("doc_id", k), text.as("text"), col("lang"),
        col("source"), length(text).cast("long").as("n_chars"))
    })
    val embeddings = src("embeddings")
    write("embeddings", rep { k =>
      val s = (k * 7) % 64
      val shiftedVec =
        if (s == 0) col("embedding")
        else concat(slice(col("embedding"), s + 1, 64 - s),
          slice(col("embedding"), 1, s))
      val vec = when(col("vec_id") % 50 === 0, col("embedding"))
        .otherwise(shiftedVec)
      embeddings.select(shifted("vec_id", k), vec.as("embedding"),
        col("label"))
    })
  }
}
