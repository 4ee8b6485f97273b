package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design notes (100 TB target):
  *  - [[bruteForceTopK]] broadcasts the query vector and runs one narrow
  *    scan + a tree-reduced top-k (TakeOrdered) — no shuffle of the corpus;
  *    it is the exact baseline.
  *  - [[signLshBuckets]] assigns each vector to a random-hyperplane bucket
  *    computed scan-side from deterministic hash-derived projections; an
  *    ANN query then touches only matching buckets (a broadcast-join probe
  *    instead of a full scan). Recall is tunable via `planes` (fewer planes
  *    → bigger buckets → higher recall, more compute).
  *  - all vector math accumulates left-to-right in Double, matching the
  *    engine-independent sequential fold the DuckDB oracle uses.
  */
object Similarity {

  /** Dot product in Double (sequential fold — custom codegen'd expression,
    * bit-identical to the `aggregate(zip_with(...))` formulation it
    * replaced but ~50× cheaper per row; see graft.functions).
    */
  def dotProduct(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** L2 norm in Double. */
  def l2Norm(a: Column): Column = call_function("graft_norm", a)

  /** Cosine similarity, computed as dot/(|a|*|b|) like the oracle (one
    * fused kernel pass; per-accumulator fold order unchanged).
    */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Exact top-k nearest neighbors of the vector with id `queryId` by
    * cosine similarity. The query row is broadcast; the corpus is scanned
    * once with no shuffle (top-k is a TakeOrdered, not a sort).
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("__qvec")).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** All pairs above a cosine threshold (embedding near-dup detection).
    * Quadratic — at scale, run [[signLshBuckets]] first and pair within
    * buckets only.
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // Norms are computed once per vector (N of them), not once per pair
    // (N²); dot/(na·nb) yields the same doubles as the fused cosine.
    val a = emb.select(col(idCol).as("idA"), col(vecCol).as("__va"),
      l2Norm(col(vecCol)).as("__na"))
    val b = emb.select(col(idCol).as("idB"), col(vecCol).as("__vb"),
      l2Norm(col(vecCol)).as("__nb"))
    a.crossJoin(b)
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        (dotProduct(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
          .as("cosine"))
      .where(col("cosine") > threshold)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1), derived
    * from xxhash64(plane, dimension) — no stored model, reproducible on
    * any cluster.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (xxhash64(lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-LSH bucket id in [0, 2^planes): bit p is the sign of the
    * projection onto pseudo-random hyperplane p. Computed scan-side.
    */
  def signLshBucket(vec: Column, planes: Int): Column = {
    val projections = (0 until planes).map { p =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
    }
    projections.zipWithIndex.map { case (proj, p) =>
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Corpus bucketed by sign-LSH: adds a `bucket` column. Persist this
    * (or bucket-partition the table by it) so ANN queries prune to one
    * bucket instead of scanning the corpus.
    */
  def signLshBuckets(emb: DataFrame, vecCol: String, planes: Int): DataFrame =
    emb.withColumn("bucket", signLshBucket(col(vecCol), planes))

  /** Approximate top-k: exact ranking restricted to the query's LSH
    * bucket. Fast path for the 100 TB corpus; recall < 1 by construction.
    */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, planes: Int = 4): DataFrame = {
    val bucketed = signLshBuckets(emb, vecCol, planes)
    val q = bucketed.where(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"), col("bucket").as("__qbucket"))
    bucketed.join(broadcast(q), col("bucket") === col("__qbucket"))
      .where(col(idCol) =!= queryId)
      .select(col(idCol), cosine(col(vecCol), col("__qvec")).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }
}
