package graft

import org.apache.spark.sql.functions._

/** Fixture-fidelity pins for [[ScaleData]] — the sf1 scale-validation
  * evidence is only as good as the generator's invariants, so each
  * construction rule in its scaladoc is asserted here on a 3×-replica
  * build from sf0.001.
  */
class ScaleDataSpec extends SparkSuite {

  private lazy val outDir = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scaledata-spec").toString
    ScaleData.generate(spark, dir, replicas = 3, srcDir = sfDir)
    dir
  }
  private def out(t: String) = spark.read.parquet(s"$outDir/$t.parquet")
  private def base(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")

  test("fact tables triple; dimensions stay fixed; ids stay disjoint") {
    for (t <- Seq("customer", "orders", "lineitem", "events",
        "documents", "embeddings"))
      assert(out(t).count() === 3 * base(t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(out(t).count() === base(t).count(), t)
    // disjoint id spaces: every id distinct across replicas
    assert(out("documents").select("doc_id").distinct().count() ===
      3 * base("documents").count())
    assert(out("orders").select("o_orderkey").distinct().count() ===
      3 * base("orders").count())
  }

  test("foreign keys shift with their parents: join fan-out is preserved") {
    // every order resolves to a customer in the SAME replica, and the
    // per-customer order-count distribution is exactly the base one ×3
    val dangling = out("orders").join(out("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti")
    assert(dangling.count() === 0)
    def fanout(orders: org.apache.spark.sql.DataFrame) = orders
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("customers"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseFan = fanout(base("orders"))
    val outFan = fanout(out("orders"))
    assert(outFan === baseFan.map { case (n, c) => n -> 3 * c })
  }

  test("documents: every-50th cross-replica exact-dup cliques, injective " +
      "renaming elsewhere, n_chars invariant") {
    val docs = out("documents")
    // n_chars = length(text) everywhere (the source invariant)
    assert(docs.where(col("n_chars") =!= length(col("text"))).count() === 0)
    // doc_id % 50 == 0 keeps base text verbatim → each such base doc's
    // text multiplicity exactly triples (cross-replica exact-dup clique)
    val keepers = docs.where(col("doc_id") % 50 === 0)
    val baseKeepers = base("documents").where(col("doc_id") % 50 === 0)
    def mult(df: org.apache.spark.sql.DataFrame) = df.groupBy("text")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mult(keepers) === mult(baseKeepers).map { case (t, n) => t -> 3 * n })
    // all other docs: replica vocabularies are disjoint (injective token
    // renaming), so distinct texts exactly triple — no cross-replica
    // collision, and within-replica duplicate structure is preserved
    val rest = docs.where(col("doc_id") % 50 =!= 0)
    val baseRest = base("documents").where(col("doc_id") % 50 =!= 0)
    assert(rest.select("text").distinct().count() ===
      3 * baseRest.select("text").distinct().count())
    // and the within-replica token-sequence SHAPE is preserved: token
    // counts per doc match the base doc's exactly
    val baseTok = base("documents").select(
      col("doc_id").as("__b"), size(split(trim(col("text")), " +")).as("nt"))
    val outTok = rest.select(pmod(col("doc_id"), lit(100000000L)).as("__b"),
      size(split(trim(col("text")), " +")).as("nt_out"))
    val joined = outTok.join(baseTok, Seq("__b"))
    assert(joined.where(col("nt_out") =!= col("nt")).count() === 0)
  }

  test("embeddings: norms preserved, every-50th identical-vector cliques") {
    val emb = out("embeddings")
    assert(emb.select(size(col("embedding")).as("d"))
      .where(col("d") =!= 64).count() === 0)
    // circular shift preserves the norm: each replica vector's norm
    // equals its base vector's norm exactly (same floats, reordered)
    val baseN = base("embeddings").select(col("vec_id").as("__b"),
      aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x * x).as("n2"))
    val outN = emb.select(pmod(col("vec_id"), lit(100000000L)).as("__b"),
      aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x * x).as("n2_out"))
    assert(outN.join(baseN, Seq("__b"))
      .where(abs(col("n2_out") - col("n2")) > 1e-9).count() === 0)
    // planted duplicate cliques at vec_id % 50 == 0: three copies per
    // base vector, no new distinct vectors introduced
    val keepers = emb.where(col("vec_id") % 50 === 0)
    val baseKeepers = base("embeddings").where(col("vec_id") % 50 === 0)
    assert(keepers.count() === 3 * baseKeepers.count())
    assert(keepers.select("embedding").distinct().count() ===
      baseKeepers.select("embedding").distinct().count())
  }

  test("tables filter + idOffset: derive only docs/embeddings from a " +
      "partial source with a collision-safe offset") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scaledata-partial").toString
    // outDir (docs+emb only) becomes the SOURCE of a second derivation:
    // the missing fact tables must never be touched, and the bigger
    // offset keeps re-replicated ids disjoint (the r10 sf10 flaw)
    ScaleData.generate(spark, dir, replicas = 2, srcDir = outDir,
      tables = Set("documents", "embeddings"), idOffset = 10000000000L)
    assert(!new java.io.File(s"$dir/orders.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = 2 * 3 * base("documents").count()
    assert(docs.count() === n)
    assert(docs.select("doc_id").distinct().count() === n)
  }

  test("id-collision guard: an idOffset inside the source id span fails " +
      "fast before writing anything") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scaledata-collide").toString
    // outDir's documents span 3 replicas of 1e8 blocks — re-replicating
    // with the DEFAULT 1e8 offset is exactly the round-10 sf10 flaw:
    // distinct rows map onto duplicate ids. generate() must refuse.
    val e = intercept[IllegalArgumentException] {
      ScaleData.generate(spark, dir, replicas = 2, srcDir = outDir,
        tables = Set("documents"))
    }
    assert(e.getMessage.contains("idOffset"), e.getMessage)
    assert(!new java.io.File(s"$dir/documents.parquet").exists())
    // replicas = 1 is a pure copy — no shifts, no collision possible,
    // the guard must not block it
    ScaleData.generate(spark, dir, replicas = 1, srcDir = outDir,
      tables = Set("documents"))
    assert(spark.read.parquet(s"$dir/documents.parquet").count() ===
      3 * base("documents").count())
  }

  test("signflip mode: norms and within-replica dot products exact, " +
      "distinct replica transforms, replica 0 verbatim") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scaledata-signflip").toString
    ScaleData.generate(spark, dir, replicas = 3, srcDir = sfDir,
      tables = Set("embeddings"), embMode = "signflip", signSeed = 42L)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // norms bit-preserved (x * ±1f is exact): squared norm matches base
    val baseN = base("embeddings").select(col("vec_id").as("__b"),
      aggregate(col("embedding"), lit(0.0d), (a, x) => a + x * x).as("n2"))
    val outN = emb.select(pmod(col("vec_id"), lit(100000000L)).as("__b"),
      aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x * x).as("n2_out"))
    assert(outN.join(baseN, Seq("__b"))
      .where(col("n2_out") =!= col("n2")).count() === 0)
    // replica 0 is the base verbatim
    val r0 = emb.where(col("vec_id") < 100000000L)
    assert(r0.exceptAll(base("embeddings")).count() === 0)
    // within-replica dot products are EXACT under a shared ±1 diagonal:
    // check vec 1 · vec 2 in every replica against the base pair
    def dot(df: org.apache.spark.sql.DataFrame, a: Long, b: Long) = {
      val va = df.where(col("vec_id") % 100000000L === a)
        .select(col("vec_id"), col("embedding").as("ea"))
      val vb = df.where(col("vec_id") % 100000000L === b)
        .select((col("vec_id") + (a - b)).as("vec_id"),
          col("embedding").as("eb"))
      va.join(vb, "vec_id")
        .select(aggregate(zip_with(col("ea"), col("eb"),
          (x, y) => x * y), lit(0.0d), (acc, x) => acc + x).as("d"))
        .collect().map(_.getDouble(0)).toSeq
    }
    val dots = dot(emb, 1L, 2L)
    assert(dots.size === 3)
    assert(dots.distinct.size === 1, s"within-replica dot changed: $dots")
    // distinct transforms: non-planted vectors differ across replicas
    val v1 = emb.where(col("vec_id") % 100000000L === 1L)
      .select("embedding").distinct().count()
    assert(v1 === 3L, "each replica must apply a distinct sign pattern")
  }
}
