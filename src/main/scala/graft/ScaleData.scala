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
  * ROUND-11 ADDITIONS (the second/third-decade fixture lessons):
  *  - `tables` selects which tables to derive — a probe that only reads
  *    documents+embeddings shouldn't pay for a 10M-row events rebuild;
  *  - `idOffset` parametrizes the replica shift. The fixed 10⁸ offset
  *    COLLIDES when the source is itself a replicated fixture (sf1 ids
  *    already occupy k·10⁸ blocks: re-shifting them by k₂·10⁸ mapped
  *    500k rows onto 95k distinct ids — the round-10 sf10 fixture's
  *    flaw, measured in round 11). Derive a third decade either from
  *    the BASE fixture with replicas=100, or from a derived one with
  *    `idOffset` ≥ its id span;
  *  - `embMode = "signflip"` replaces the circular shift with a
  *    per-replica deterministic ±1 diagonal (splitmix64 bits of
  *    `signSeed + k`; replica 0 stays identity): sign flips preserve
  *    norms AND within-replica dot products exactly (D diagonal ±1 ⇒
  *    ⟨Dv, Dw⟩ = ⟨v, w⟩) while decorrelating cross-replica pairs —
  *    needed past ~64 replicas, where only 64 distinct rotations exist
  *    and colliding shifts would plant unintended whole-replica
  *    exact-dup cliques. Distinct seeds keep COMPOSED transforms
  *    distinct when a signflip fixture is re-replicated.
  *
  * Usage: runMain graft.ScaleData <outDir> [replicas=10] [srcDir=sf0.1]
  *          [tables=all|csv] [idOffset=100000000] [embMode=shift|signflip]
  *          [signSeed=0]
  */
object ScaleData {

  private val Off = 100000000L

  val AllTables: Set[String] = Set("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val replicas = if (args.length > 1) args(1).toInt else 10
    val srcDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val tables =
      if (args.length > 3 && args(3) != "all")
        args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else AllTables
    val idOffset = if (args.length > 4) args(4).toLong else Off
    val embMode = if (args.length > 5) args(5) else "shift"
    val signSeed = if (args.length > 6) args(6).toLong else 0L
    val spark = GraftSession.local("graft-scale-data")
    try generate(spark, outDir, replicas, srcDir, tables, idOffset,
      embMode, signSeed)
    finally spark.stop()
  }

  /** splitmix64: the per-replica sign mask for `embMode = "signflip"`.
    * Replica 0 is special-cased to identity by the caller, so the mask
    * value at k = 0 never applies.
    */
  private[graft] def signMask(seed: Long, k: Int): Long = {
    var z = seed + k * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def generate(spark: SparkSession, outDir: String, replicas: Int,
      srcDir: String, tables: Set[String] = AllTables,
      idOffset: Long = Off, embMode: String = "shift",
      signSeed: Long = 0L): Unit = {
    require(embMode == "shift" || embMode == "signflip",
      s"unknown embMode '$embMode' (shift | signflip)")
    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(t: String, df: => DataFrame): Unit = if (tables(t)) {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scale-data] wrote $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }
    // fail-fast id-collision guard (the round-10 sf10 fixture flaw,
    // round-11 advisor finding): re-replicating an already-replicated
    // source with an idOffset smaller than its id span maps DISTINCT
    // rows onto DUPLICATE ids (500k rows on 95k ids, measured) —
    // silently, since every downstream query still runs. One max()
    // per shifted column of each table actually being derived, before
    // any row is written.
    def guardIds(t: String, idCols: String*): Unit =
      if (tables(t) && replicas > 1) {
        val d = src(t)
        val maxes = d.agg(max(col(idCols.head).cast("long")),
          idCols.tail.map(c => max(col(c).cast("long"))): _*).head()
        idCols.zipWithIndex.foreach { case (c, i) =>
          val m = if (maxes.isNullAt(i)) 0L else maxes.getLong(i)
          require(m < idOffset,
            s"ScaleData: $t.$c spans to $m >= idOffset $idOffset — " +
              "replica shifts would collide (distinct rows mapped onto " +
              "duplicate ids). Derive from the BASE fixture, or pass an " +
              "idOffset above the source id span.")
        }
      }
    def shifted(c: String, k: Int) = (col(c) + lit(k * idOffset)).as(c)
    def suffixed(c: String, k: Int) =
      (if (k == 0) col(c) else concat(col(c), lit(s"_r$k"))).as(c)
    def rep(f: Int => DataFrame): DataFrame =
      (0 until replicas).map(f).reduce(_ unionByName _)

    guardIds("customer", "c_custkey")
    guardIds("supplier", "s_suppkey")
    guardIds("part", "p_partkey")
    guardIds("orders", "o_orderkey", "o_custkey")
    guardIds("lineitem", "l_orderkey", "l_partkey", "l_suppkey")
    guardIds("events", "event_id", "user_id")
    guardIds("documents", "doc_id")
    guardIds("embeddings", "vec_id")
    write("region", src("region"))
    write("nation", src("nation"))
    lazy val customer = src("customer")
    write("customer", rep(k => customer.select(
      shifted("c_custkey", k), suffixed("c_name", k), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"))))
    lazy val supplier = src("supplier")
    write("supplier", rep(k => supplier.select(
      shifted("s_suppkey", k), suffixed("s_name", k), col("s_nationkey"),
      col("s_acctbal"))))
    lazy val part = src("part")
    write("part", rep(k => part.select(
      shifted("p_partkey", k), suffixed("p_name", k), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice"))))
    lazy val orders = src("orders")
    write("orders", rep(k => orders.select(
      shifted("o_orderkey", k), shifted("o_custkey", k),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"))))
    lazy val lineitem = src("lineitem")
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
    lazy val events0 = src("events")
    lazy val events =
      if (events0.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        events0.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else events0
    write("events", rep(k => events.select(
      shifted("event_id", k), col("ts"), shifted("user_id", k),
      col("event_type"), col("value"), col("props"))))
    lazy val documents = src("documents")
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
    lazy val embeddings = src("embeddings")
    write("embeddings", rep { k =>
      val transformed = embMode match {
        case "shift" =>
          val s = (k * 7) % 64
          if (s == 0) col("embedding")
          else concat(slice(col("embedding"), s + 1, 64 - s),
            slice(col("embedding"), 1, s))
        case "signflip" =>
          if (k == 0) col("embedding")
          else {
            // ±1f per coordinate from the replica's splitmix64 mask:
            // x * ±1f is EXACT in float, so norms and within-replica
            // dot products are bit-preserved
            val mask = signMask(signSeed, k)
            val signs = (0 until 64).map(i =>
              if (((mask >>> i) & 1L) == 1L) -1.0f else 1.0f)
            zip_with(col("embedding"), typedLit(signs),
              (x, sgn) => x * sgn)
          }
      }
      val vec = when(col("vec_id") % 50 === 0, col("embedding"))
        .otherwise(transformed)
      embeddings.select(shifted("vec_id", k), vec.as("embedding"),
        col("label"))
    })
  }
}
