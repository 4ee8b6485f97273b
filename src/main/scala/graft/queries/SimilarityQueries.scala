package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Decontamination, Similarity}

/** Similarity search over the `embeddings` table (array<float>, 64-dim).
  *
  * The brute-force queries are oracle-checked: DuckDB's
  * `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])` computes
  * dot/(|a|*|b|) with a sequential double fold, which is bit-identical to
  * our `aggregate(zip_with(...))` expression (verified empirically). The
  * LSH-bucketed ANN variant has recall < 1 → rows-only check.
  */
object SimilarityQueries {

  /** Exact brute-force top-10 cosine neighbors of vec_id 0. */
  private def q30(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.bruteForceTopK(Tables.embeddings(s, dir),
      "vec_id", "embedding", queryId = 0L, k = 10)
  }

  /** Embedding near-dup pairs above a cosine threshold (exact, blocked by
    * nothing — fine at test scale; LSH-bucket at 100 TB).
    */
  private def q31(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.cosineNearDupPairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.3)
      .orderBy($"idA", $"idB")
  }

  /** Semantic decontamination: every corpus vector's max cosine against
    * the vec_id ≡ 0 (mod 97) eval slice, its nearest eval id, and the
    * ≥ 0.35 drop decision (the threshold bites on this corpus: max
    * observed eval-cosine ≈ 0.47). Max/argmax over identical doubles in
    * both engines — hash-checked like q30/q31.
    */
  private def q111(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Decontamination.semanticContamination(
        emb.where($"vec_id" % 97 =!= 0), emb.where($"vec_id" % 97 === 0),
        "vec_id", "embedding", "vec_id", "embedding", threshold = 0.35)
      .orderBy($"vec_id")
  }

  /** Cluster-balanced diverse sampling: every vector is assigned its
    * nearest of 8 md5-seeded centroids, each cell capped at 20 by the
    * deterministic md5 take — dense modes downsample, sparse modes
    * survive. Assignment AND selection hash-checked.
    */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.diverseSample(Tables.embeddings(s, dir), "vec_id",
        "embedding", numCentroids = 8, perCell = 20)
      .select($"vec_id", $"label", $"centroid_id".cast("long").as("centroid_id"))
      .orderBy($"vec_id")
  }

  /** Embedding-table QA: per-label dimension/zero-vector/unit-norm
    * integrity counts — the report run before an ANN index build. All
    * columns are integer counts (the norm test uses a margin ≫ ulp), so
    * the whole report hash-checks.
    */
  private def q115(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.embeddingQa(Tables.embeddings(s, dir), "embedding", "label",
        expectedDim = 64)
      .orderBy($"label")
  }

  /** ANN via sign-LSH bucket pruning. Approximate (recall < 1 vs q30)
    * but fully deterministic, and the md5-derived plane basis lets DuckDB
    * rebuild the bucket assignment — hash-checked.
    */
  private def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.annTopK(Tables.embeddings(s, dir),
      "vec_id", "embedding", queryId = 0L, k = 10, planes = 2)
  }

  /** Per-label centroid-ish stats: mean of first embedding component and
    * vector norms per label (array math + grouped agg, oracle-checked with
    * integer-exact sums where accumulation order could matter).
    */
  private def q33(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"label", $"vec_id",
        element_at($"embedding", 1).cast("double").as("c0"),
        Similarity.l2Norm($"embedding").as("norm"))
      .groupBy($"label")
      .agg(
        count(lit(1)).as("n_vecs"),
        max($"norm").as("max_norm"),
        min($"c0").as("min_c0"),
        max($"c0").as("max_c0"))
      .orderBy($"label")
  }

  /** ANN via IVF cell pruning. Approximate but deterministic: centroids
    * are the 16 vectors with the lowest md5(vec_id) hash, assignment is
    * argmax cosine (ties to the lower cell), probes are the query's 4
    * best cells — every stage is md5/cosine arithmetic DuckDB reproduces,
    * so the full index → assign → probe → rank pipeline is hash-checked.
    */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    Similarity.ivfTopK(emb, "vec_id", "embedding", queryId = 0L, k = 10,
      centroids, nprobe = 4)
  }

  /** The 100 TB-scale near-dup plan — multi-band sign-LSH candidates +
    * exact cosine verification — hash-checked end to end: the md5-derived
    * plane matrix lets DuckDB rebuild the exact bucket assignment, so the
    * oracle reproduces candidates AND verification bit-for-bit. Subset of
    * q31's exact pair set by construction (recall = rows(q50)/rows(q31)).
    */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.cosineNearDupPairsBucketed(Tables.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.3, planesPerBand = 8, bands = 4)
      .orderBy($"idA", $"idB")
  }

  /** Embedding-corpus dedup end to end: banded-LSH cosine pairs (q50's
    * plan) → connected-component collapse → surviving vec_ids. The
    * embedding twin of the q52 document pipeline, hash-checked the same
    * way (md5-reproducible buckets + recursive-CTE closure).
    */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val pairs = Similarity.cosineNearDupPairsBucketed(emb,
      "vec_id", "embedding", threshold = 0.3, planesPerBand = 8, bands = 4)
    graft.ops.Dedup.collapseNearDups(emb, "vec_id", pairs)
      .select($"vec_id")
      .orderBy($"vec_id")
  }

  /** Batch exact ANN: top-5 neighbors for every query in the eval slice
    * (vec_id ≡ 0 mod 100) from ONE corpus scan — the retrieval-eval
    * workload. Broadcast query set, windowed per-query top-k.
    */
  private def q69(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
        emb.where($"vec_id" % 100 === 0), "vec_id", "embedding", k = 5)
      .orderBy($"query_id", $"vec_id")
  }

  /** Incremental embedding near-dup: the vec_id ≡ 0 (mod 10) slice
    * arrives as the new batch; the rest are the existing corpus. Batch
    * vectors that re-embed corpus content (cosine > 0.3) are found via
    * sign-LSH band collisions BETWEEN the sides — the ingest-time twin of
    * q50, hash-checked the same way (md5-reproducible plane matrix).
    */
  private def q74(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.incrementalCosineNearDups(
        emb.where($"vec_id" % 10 === 0),
        emb.where($"vec_id" % 10 =!= 0), "vec_id", "embedding",
        threshold = 0.3, planesPerBand = 8, bands = 4)
      .orderBy($"idA", $"idB")
  }

  /** Semantic dedup candidates via IVF cells (SemDeDup shape): vectors
    * sharing one of 16 hash-sample-centroid cells, paired and exact-
    * cosine verified — reuses q43's deterministic index, so the full
    * cluster → pair → verify pipeline is hash-checked against DuckDB
    * rebuilding the identical cells.
    */
  private def q77(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    Similarity.ivfNearDupPairs(emb, "vec_id", "embedding", centroids,
        threshold = 0.3)
      .orderBy($"idA", $"idB")
  }

  /** The composed IVF dedup pipeline: cell-pair candidates (q77's plan)
    * → connected-component collapse → surviving vec_ids. The IVF twin of
    * q53's LSH-based collapse — index build, near-dup detection and
    * dedup share one cell assignment. Hash-checked end to end
    * (deterministic cells + recursive-CTE closure).
    */
  private def q78(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val pairs = Similarity.ivfNearDupPairs(emb, "vec_id", "embedding",
      centroids, threshold = 0.3)
    graft.ops.Dedup.collapseNearDups(emb, "vec_id", pairs)
      .select($"vec_id")
      .orderBy($"vec_id")
  }

  /** ANN over the int8-quantized representation: top-40 candidates by
    * the fused dequantize-cosine kernel over (qvec, scale), exact
    * float re-rank to top-10. Codes are bit-exact cross-engine (q70)
    * and the fused fold matches list_cosine_similarity over the
    * dequantized doubles, so the quantized candidate ranking AND the
    * re-ranked result are hash-checked.
    */
  private def q79(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.quantizedTopK(Tables.embeddings(s, dir),
      "vec_id", "embedding", queryId = 0L, k = 10, rerankFactor = 4)
  }

  /** Int8 quantization round-trip: per-vector scale, code fingerprint,
    * and max reconstruction error — all deterministic double arithmetic,
    * hash-checked against DuckDB rebuilding the identical codes.
    */
  private def q70(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.quantizeInt8(Tables.embeddings(s, dir), "embedding")
      .select($"vec_id", $"scale",
        md5(array_join(transform($"qvec", q => q.cast("int").cast("string")), ","))
          .as("qvec_md5"),
        array_max(zip_with($"embedding", $"qvec", (x, q) =>
          abs(x.cast("double") - q.cast("double") * $"scale".cast("double"))))
          .as("max_err"))
      .orderBy($"vec_id")
  }

  /** Measured recall@5 of the batch sign-LSH ANN against the exact batch
    * ground truth, per query — the parameter-tuning measurement as a
    * first-class query. Every stage (bucket assignment, both top-k
    * rankings, the hit join) is md5/cosine arithmetic DuckDB reproduces,
    * so even the RECALL VALUES are hash-checked.
    */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    val ann = Similarity.annTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, planes = 2)
    Similarity.recallAtK(ann, exact, "query_id", "vec_id")
      .orderBy($"query_id")
  }

  /** q81 for the IVF index: measured recall@5 of the batch IVF ANN
    * (16 deterministic cells, nprobe=4) against the exact batch ground
    * truth. Fully deterministic (md5-sampled centroids, argmax-cosine
    * assignment, id tie-breaks), so the oracle rebuilds the whole thing:
    * q43's centroid/cell/probe CTEs generalized to the per-query probe
    * fan-out, composed with q81's recall shape — assignment, both
    * rankings, and the recall VALUES are hash-checked.
    */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where($"vec_id" % 100 === 0)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val exact = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    val ann = Similarity.ivfTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, centroids, nprobe = 4)
    Similarity.recallAtK(ann, exact, "query_id", "vec_id")
      .orderBy($"query_id")
  }

  /** SemDeDup (Abbas et al. 2023): q77's within-cell dup graph under the
    * paper's keep-rule — each duplicate group survives through its member
    * least similar to the cell centroid, not its lowest id (q78's rule).
    * Hash-checked end to end: deterministic md5-sampled centroid model
    * (q43's), recursive-CTE closure, and the emitted `centroid_sim` is
    * the same double fold both engines compute bit-identically (q30/q43
    * precedent).
    */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    Similarity.semDedup(emb, "vec_id", "embedding", centroids,
        threshold = 0.3)
      .select($"vec_id", $"centroid_id", $"centroid_sim")
      .orderBy($"vec_id")
  }

  /** Embedding drift between two synthetic releases (ids ∉ 3ℤ vs
    * ∉ 5ℤ): exact TV distance between their cell-assignment histograms
    * under the shared deterministic centroid model — q105's monitor for
    * the embedding modality.
    */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    Similarity.assignmentDrift(
      emb.where($"vec_id" % 3 =!= 0),
      emb.where($"vec_id" % 5 =!= 0), "embedding", cents)
      // DECIMAL internally (exact L1 numerator); BIGINT at the gated
      // boundary (round-6: DECIMAL output doesn't hash-digest). Gate-
      // only cast — the op's DECIMAL output remains the production API
      // (Long overflows diverge between engines at extreme scale).
      .withColumn("l1_num", col("l1_num").cast("long"))
  }

  /** Contrastive hard-negative mining: for each of 20 hash-chosen anchor
    * vectors, the 5 most-cosine-similar vectors with a DIFFERENT label —
    * the near-miss training pairs an embedding model learns from. Exact
    * scores ride the hash gate (the q30-proven identical double fold).
    */
  private def q126(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        anchors = emb.where($"vec_id" % 25 === 0), m = 5)
      .orderBy($"anchor_id", $"rank")
  }

  /** Approximate kNN graph at q50's 8×4 sign-LSH geometry: every
    * vector's top-3 bucket-collision neighbors, exact-cosine ranked.
    * The oracle rebuilds the md5 hyperplanes, bands both directions and
    * replays the per-id window, so banding recall is replicated, not
    * approximated (the bucket cap cannot trigger at sf0.01).
    */
  private def q130(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.knnGraph(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 3, planesPerBand = 8, bands = 4)
      .orderBy($"id", $"rank")
  }

  /** Embedding-truncation quality (the Matryoshka/index-dim decision):
    * recall@10 of exact search over the FIRST-16-dims truncation
    * against exact search over the full 64 dims, per query — the
    * measured answer to "how small can the index vectors be". Both
    * rankings are exact cosine (the q30-proven double fold), so the
    * whole table hash-gates.
    */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val trunc = emb.select($"vec_id",
      slice($"embedding", 1, 16).as("embedding"))
    val exact = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
      emb.where($"vec_id" % 100 === 0), "vec_id", "embedding", k = 10)
    val approx = Similarity.bruteForceTopKBatch(trunc, "vec_id", "embedding",
      trunc.where($"vec_id" % 100 === 0), "vec_id", "embedding", k = 10)
    Similarity.recallAtK(approx, exact, "query_id", "vec_id")
      .orderBy($"query_id")
  }

  /** Semantic clusters: the kNN graph's strong edges (cosine ≥ 0.35)
    * collapsed to connected components — corpus topic/duplication
    * structure from the q130 graph feeding the q48 CC machinery, per
    * vector its cluster label (min reachable id).
    */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = Similarity.knnGraph(Tables.embeddings(s, dir), "vec_id",
        "embedding", k = 5, planesPerBand = 8, bands = 4)
      .where($"cosine" >= 0.35)
      .select(least($"id", $"neighbor_id").as("idA"),
        greatest($"id", $"neighbor_id").as("idB"))
      .distinct()
    graft.ops.Dedup.clusterLabels(edges)
      .orderBy($"id")
  }

  /** Per-dimension embedding QA: range + zero counts per component —
    * dead dimensions and scale imbalance, the index-geometry
    * preconditions q115's whole-vector checks can't see.
    */
  private def q147(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.dimensionProfile(Tables.embeddings(s, dir), "embedding")
      // long dim aligns the published schema with the oracle's BIGINT
      // range() unnest. NOT load-bearing for the hash gate — integer
      // widths are hash-equivalent (SURVEY §8 calibration; q21/q22/q23
      // were driver-green on int32-vs-int64); q147's round-6 failure
      // was n_zero's HUGEINT, fixed in the oracle SQL.
      .withColumn("dim", col("dim").cast("long"))
      .orderBy($"dim")
  }

  /** PQ codes + exact norms for the whole corpus — the compressed ANN
    * representation (64 floats → 8 codeword indices, Jégou et al. 2011)
    * as a first-class table. Deterministic end to end: codebooks are
    * per-subspace slices of the md5-hash-sampled vectors (q43's
    * discipline), assignment is L2 argmin in the same sequential double
    * fold DuckDB's `list_distance(DOUBLE[],DOUBLE[])` computes (ties to
    * the lower code), so codes AND norms hash-gate.
    */
  private def q148(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    Similarity.pqEncode(emb, "embedding", cbs)
      .select($"vec_id",
        posexplode($"pq_code").as(Seq("subspace", "code")), $"vnorm")
      .withColumn("subspace", $"subspace".cast("long"))
      .withColumn("code", $"code".cast("long"))
      .orderBy($"vec_id", $"subspace")
  }

  /** IVFADC batch ANN (the 100 TB serving shape): per eval query, IVF
    * cells prune candidates, PQ codes rank them (no vector reads), and
    * only the ADC top-20 shortlist is re-scored with exact cosine.
    * Every arithmetic stage (probe ranking, the m×ksub ADC table, the
    * per-candidate lookup fold, the |q|·|d| normalization, the re-rank)
    * is fixed-order double math the oracle reproduces, so the
    * approximate AND exact scores hash-gate.
    *
    * Round 10: serving runs through the STORED index — the
    * (id, pq_code, vnorm, centroid_id) table is materialized once,
    * bucketed by `centroid_id` (the `corpusLshKeys` discipline applied
    * to PQ), and [[Similarity.pqAdcTopKBatchWithCodes]] probes it
    * without re-encoding the corpus per query batch. Same arithmetic,
    * same oracle, so the hash gate proves the stored path end to end;
    * the timed number now includes the one-time encode+write a
    * production ingest amortizes.
    */
  private def q149(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    val table = "graft_q149_codes"
    graft.io.Layouts.replaceBucketed(
      Similarity.pqEncode(
          Similarity.ivfAssign(emb, "embedding", centroids), "embedding", cbs)
        .select($"vec_id", $"pq_code", $"vnorm", $"centroid_id"),
      table, "centroid_id",
      s.conf.get("spark.sql.shuffle.partitions").toInt)
    Similarity.pqAdcTopKBatchWithCodes(emb, s.table(table),
        "vec_id", "embedding",
        emb.where($"vec_id" % 100 === 0), "vec_id", "embedding", k = 5,
        cbs, centroids, nprobe = 4)
      .orderBy($"query_id", $"vec_id")
  }

  /** Measured recall@5 of IVFADC against the exact batch ground truth —
    * q83's measurement for the quantized index: how much ranking quality
    * the 32× compression costs, per query, hash-checked end to end.
    */
  private def q150(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val queries = emb.where($"vec_id" % 100 === 0)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, ksub = 16)
    val exact = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    val ann = Similarity.pqAdcTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, cbs, centroids, nprobe = 4)
    Similarity.recallAtK(ann, exact, "query_id", "vec_id")
      .orderBy($"query_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q148_pq_codes" -> (q148 _),
    "q149_pq_adc_topk" -> (q149 _),
    "q150_pq_recall" -> (q150 _),
    "q136_truncation_recall" -> (q136 _),
    "q144_semantic_clusters" -> (q144 _),
    "q147_dimension_profile" -> (q147 _),
    "q130_knn_graph" -> (q130 _),
    "q126_hard_negatives" -> (q126 _),
    "q99_semdedup" -> (q99 _),
    "q108_embedding_drift" -> (q108 _),
    "q69_ann_batch" -> (q69 _),
    "q81_ann_recall" -> (q81 _),
    "q83_ann_recall_ivf" -> (q83 _),
    "q70_quantize_i8" -> (q70 _),
    "q53_embedding_dedup" -> (q53 _),
    "q30_ann_bruteforce" -> (q30 _),
    "q31_cosine_neardup" -> (q31 _),
    "q111_semantic_decontam" -> (q111 _),
    "q115_embedding_qa" -> (q115 _),
    "q120_diverse_sample" -> (q120 _),
    "q32_ann_lsh" -> (q32 _),
    "q33_label_stats" -> (q33 _),
    "q43_ann_ivf" -> (q43 _),
    "q50_cosine_neardup_bucketed" -> (q50 _),
    "q74_incremental_cosine_neardup" -> (q74 _),
    "q77_semantic_dedup_ivf" -> (q77 _),
    "q78_embedding_dedup_ivf" -> (q78 _),
    "q79_ann_quantized" -> (q79 _))

  val oracles: Map[String, String] = Map(
    // q148: PQ codebooks = 8-wide slices of the 16 lowest-md5(vec_id)
    // vectors (q43's sample); code = L2-argmin (list_distance on DOUBLE[]
    // is the kernel's sequential fold bit-for-bit), ties to lower code;
    // vnorm = sqrt(Σx²) in the same fold.
    "q148_pq_codes" ->
      """WITH h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |samp AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS code,
        |                embedding AS svec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |cw AS (SELECT j.j, s.code, s.svec[j.j*8+1 : j.j*8+8] AS cvec
        |       FROM samp s, (SELECT unnest(range(0, 8)) AS j) j),
        |asg AS (SELECT e.vec_id, c.j, c.code,
        |               row_number() OVER (PARTITION BY e.vec_id, c.j
        |                 ORDER BY list_distance(e.embedding[c.j*8+1 : c.j*8+8]::DOUBLE[],
        |                                        c.cvec::DOUBLE[]),
        |                          c.code) AS rn
        |        FROM embeddings e, cw c)
        |SELECT a.vec_id, a.j AS subspace, a.code,
        |       sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) AS vnorm
        |FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id
        |WHERE a.rn = 1
        |ORDER BY a.vec_id, subspace""".stripMargin,
    // q149: q83's cells/probes + q148's codes; ADC dot = the j-ordered
    // table-lookup list inner-product'd against ones (the same 0+t0+t1+…
    // double sequence Spark's aggregate fold computes), normalized by
    // the two exact norms.
    "q149_pq_adc_topk" ->
      """WITH h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
        |                embedding AS cvec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |samp AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS code,
        |                embedding AS svec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |cw AS (SELECT j.j, s.code, s.svec[j.j*8+1 : j.j*8+8] AS cvec
        |       FROM samp s, (SELECT unnest(range(0, 8)) AS j) j),
        |asg AS (SELECT e.vec_id, c.cid,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                          c.cid) AS rn
        |        FROM embeddings e, cent c),
        |cells AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
        |cr AS (SELECT e.vec_id, c.j, c.code,
        |              row_number() OVER (PARTITION BY e.vec_id, c.j
        |                ORDER BY list_distance(e.embedding[c.j*8+1 : c.j*8+8]::DOUBLE[],
        |                                       c.cvec::DOUBLE[]),
        |                         c.code) AS rn
        |       FROM embeddings e, cw c),
        |codes AS (SELECT vec_id, j, code FROM cr WHERE rn = 1),
        |vn AS (SELECT vec_id,
        |              sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vnorm
        |       FROM embeddings),
        |qs AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |       WHERE vec_id % 100 = 0),
        |qn AS (SELECT query_id,
        |              sqrt(list_inner_product(qv::DOUBLE[], qv::DOUBLE[])) AS qnorm
        |       FROM qs),
        |pr AS (SELECT q.query_id, c.cid,
        |              row_number() OVER (PARTITION BY q.query_id
        |                ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                         c.cid) AS rn
        |       FROM qs q, cent c),
        |probes AS (SELECT query_id, cid FROM pr WHERE rn <= 4),
        |tbl AS (SELECT q.query_id, c.j, c.code,
        |               list_inner_product(q.qv[c.j*8+1 : c.j*8+8]::DOUBLE[],
        |                                  c.cvec::DOUBLE[]) AS tv
        |        FROM qs q, cw c),
        |adc AS (SELECT p.query_id, cl.vec_id,
        |               list_inner_product(list(t.tv ORDER BY t.j),
        |                 [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS dots
        |        FROM probes p
        |        JOIN cells cl ON cl.cid = p.cid
        |        JOIN codes co ON co.vec_id = cl.vec_id
        |        JOIN tbl t ON t.query_id = p.query_id AND t.j = co.j
        |                  AND t.code = co.code
        |        WHERE cl.vec_id <> p.query_id
        |        GROUP BY p.query_id, cl.vec_id),
        |rk AS (SELECT a.query_id, a.vec_id,
        |              a.dots / (qn.qnorm * vn.vnorm) AS adc_cosine,
        |              row_number() OVER (PARTITION BY a.query_id
        |                ORDER BY a.dots / (qn.qnorm * vn.vnorm) DESC, a.vec_id) AS rn
        |       FROM adc a
        |       JOIN qn ON qn.query_id = a.query_id
        |       JOIN vn ON vn.vec_id = a.vec_id),
        |short AS (SELECT query_id, vec_id, adc_cosine FROM rk WHERE rn <= 20),
        |rr AS (SELECT s.query_id, s.vec_id, s.adc_cosine,
        |              list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS cosine,
        |              row_number() OVER (PARTITION BY s.query_id
        |                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |                         s.vec_id) AS rn
        |       FROM short s
        |       JOIN embeddings e ON e.vec_id = s.vec_id
        |       JOIN qs q ON q.query_id = s.query_id)
        |SELECT query_id, vec_id, adc_cosine, cosine FROM rr WHERE rn <= 5
        |ORDER BY query_id, vec_id""".stripMargin,
    // q150: q149's ADC ranking vs q83's exact arm, q81's recall shape.
    "q150_pq_recall" ->
      """WITH h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
        |                embedding AS cvec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |samp AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS code,
        |                embedding AS svec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |cw AS (SELECT j.j, s.code, s.svec[j.j*8+1 : j.j*8+8] AS cvec
        |       FROM samp s, (SELECT unnest(range(0, 8)) AS j) j),
        |asg AS (SELECT e.vec_id, c.cid,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                          c.cid) AS rn
        |        FROM embeddings e, cent c),
        |cells AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
        |cr AS (SELECT e.vec_id, c.j, c.code,
        |              row_number() OVER (PARTITION BY e.vec_id, c.j
        |                ORDER BY list_distance(e.embedding[c.j*8+1 : c.j*8+8]::DOUBLE[],
        |                                       c.cvec::DOUBLE[]),
        |                         c.code) AS rn
        |       FROM embeddings e, cw c),
        |codes AS (SELECT vec_id, j, code FROM cr WHERE rn = 1),
        |vn AS (SELECT vec_id,
        |              sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vnorm
        |       FROM embeddings),
        |qs AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |       WHERE vec_id % 100 = 0),
        |qn AS (SELECT query_id,
        |              sqrt(list_inner_product(qv::DOUBLE[], qv::DOUBLE[])) AS qnorm
        |       FROM qs),
        |pr AS (SELECT q.query_id, c.cid,
        |              row_number() OVER (PARTITION BY q.query_id
        |                ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                         c.cid) AS rn
        |       FROM qs q, cent c),
        |probes AS (SELECT query_id, cid FROM pr WHERE rn <= 4),
        |tbl AS (SELECT q.query_id, c.j, c.code,
        |               list_inner_product(q.qv[c.j*8+1 : c.j*8+8]::DOUBLE[],
        |                                  c.cvec::DOUBLE[]) AS tv
        |        FROM qs q, cw c),
        |adc AS (SELECT p.query_id, cl.vec_id,
        |               list_inner_product(list(t.tv ORDER BY t.j),
        |                 [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS dots
        |        FROM probes p
        |        JOIN cells cl ON cl.cid = p.cid
        |        JOIN codes co ON co.vec_id = cl.vec_id
        |        JOIN tbl t ON t.query_id = p.query_id AND t.j = co.j
        |                  AND t.code = co.code
        |        WHERE cl.vec_id <> p.query_id
        |        GROUP BY p.query_id, cl.vec_id),
        |rk AS (SELECT a.query_id, a.vec_id,
        |              row_number() OVER (PARTITION BY a.query_id
        |                ORDER BY a.dots / (qn.qnorm * vn.vnorm) DESC, a.vec_id) AS rn
        |       FROM adc a
        |       JOIN qn ON qn.query_id = a.query_id
        |       JOIN vn ON vn.vec_id = a.vec_id),
        |short AS (SELECT query_id, vec_id FROM rk WHERE rn <= 20),
        |rr AS (SELECT s.query_id, s.vec_id,
        |              row_number() OVER (PARTITION BY s.query_id
        |                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |                         s.vec_id) AS rn
        |       FROM short s
        |       JOIN embeddings e ON e.vec_id = s.vec_id
        |       JOIN qs q ON q.query_id = s.query_id),
        |a AS (SELECT query_id, vec_id FROM rr WHERE rn <= 5),
        |er AS (SELECT q.query_id, e.vec_id,
        |              row_number() OVER (PARTITION BY q.query_id
        |                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |                         e.vec_id) AS rn
        |       FROM embeddings e, qs q WHERE e.vec_id <> q.query_id),
        |x AS (SELECT query_id, vec_id FROM er WHERE rn <= 5)
        |SELECT x.query_id,
        |       CAST(count(*) AS BIGINT) AS n_truth,
        |       CAST(count(a.vec_id) AS BIGINT) AS n_hit,
        |       CAST(count(a.vec_id) AS DOUBLE) / count(*) AS recall
        |FROM x LEFT JOIN a ON a.query_id = x.query_id AND a.vec_id = x.vec_id
        |GROUP BY x.query_id ORDER BY x.query_id""".stripMargin,
    // q147: per-dimension range/zero counts — exact on identical
    // floats (min/max/counts, no order-dependent sums).
    "q147_dimension_profile" ->
      """SELECT i.i AS dim,
        |       count(*) AS n,
        |       CAST(sum(CASE WHEN e.embedding[i.i] = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |       min(CAST(e.embedding[i.i] AS DOUBLE)) AS min_v,
        |       max(CAST(e.embedding[i.i] AS DOUBLE)) AS max_v
        |FROM embeddings e, (SELECT unnest(range(1, 65)) AS i) i
        |GROUP BY i.i
        |ORDER BY dim""".stripMargin,
    // q144: q130's kNN-edge CTEs (rank ≤ 5, cosine ≥ 0.35, normalized
    // undirected) + q53's recursive closure → per-id min-reachable
    // label.
    "q144_semantic_clusters" ->
      """WITH RECURSIVE pl AS (
        |  SELECT b.b AS band, pp.p AS p, d.i AS i,
        |         (('0x' || substr(md5('plane:' || (b.b*8 + pp.p) || ':' || d.i), 1, 15))::BIGINT
        |           / 576460752303423488.0) - 1.0 AS c
        |  FROM (SELECT unnest(range(0, 4)) AS b) b,
        |       (SELECT unnest(range(0, 8)) AS p) pp,
        |       (SELECT unnest(range(0, 64)) AS i) d),
        |pv AS (SELECT band, p, list(c ORDER BY i) AS pvec FROM pl GROUP BY band, p),
        |proj AS (SELECT e.vec_id, pv.band, pv.p,
        |                list_dot_product(e.embedding::DOUBLE[], pv.pvec) AS pr
        |         FROM embeddings e, pv),
        |k AS (SELECT vec_id, band,
        |             sum(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END) AS key
        |      FROM proj GROUP BY vec_id, band),
        |cand AS (SELECT DISTINCT a.vec_id AS id, b.vec_id AS neighbor_id
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key
        |         WHERE a.vec_id <> b.vec_id),
        |scored AS (SELECT c.id, c.neighbor_id,
        |                  list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS cosine
        |           FROM cand c
        |           JOIN embeddings ea ON ea.vec_id = c.id
        |           JOIN embeddings eb ON eb.vec_id = c.neighbor_id),
        |ranked AS (SELECT id, neighbor_id, cosine,
        |                  row_number() OVER (PARTITION BY id
        |                    ORDER BY cosine DESC, neighbor_id) AS rn
        |           FROM scored),
        |p AS (SELECT DISTINCT least(id, neighbor_id) AS idA,
        |             greatest(id, neighbor_id) AS idB
        |      FROM ranked WHERE rn <= 5 AND cosine >= 0.35),
        |e AS (SELECT idA AS src, idB AS dst FROM p UNION ALL SELECT idB, idA FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id)
        |SELECT id, min(r) AS label FROM reach GROUP BY id
        |ORDER BY id""".stripMargin,
    // q136: exact rankings over the sliced and full embeddings (same
    // per-query window + id tie-break as q81's CTEs), recall from the
    // left join off the full-dim ground truth.
    "q136_truncation_recall" ->
      """WITH tr AS (SELECT vec_id, list_slice(embedding, 1, 16) AS tv FROM embeddings),
        |qs AS (SELECT e.vec_id AS query_id, e.embedding AS qv, t.tv AS qt
        |       FROM embeddings e JOIN tr t ON t.vec_id = e.vec_id
        |       WHERE e.vec_id % 100 = 0),
        |ar AS (SELECT q.query_id, t.vec_id,
        |         row_number() OVER (PARTITION BY q.query_id
        |           ORDER BY list_cosine_similarity(t.tv::DOUBLE[], q.qt::DOUBLE[]) DESC,
        |                    t.vec_id) AS rn
        |       FROM tr t, qs q WHERE t.vec_id <> q.query_id),
        |a AS (SELECT query_id, vec_id FROM ar WHERE rn <= 10),
        |er AS (SELECT q.query_id, e.vec_id,
        |         row_number() OVER (PARTITION BY q.query_id
        |           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |                    e.vec_id) AS rn
        |       FROM embeddings e, qs q WHERE e.vec_id <> q.query_id),
        |x AS (SELECT query_id, vec_id FROM er WHERE rn <= 10)
        |SELECT x.query_id,
        |       CAST(count(*) AS BIGINT) AS n_truth,
        |       CAST(count(a.vec_id) AS BIGINT) AS n_hit,
        |       CAST(count(a.vec_id) AS DOUBLE) / count(*) AS recall
        |FROM x LEFT JOIN a ON a.query_id = x.query_id AND a.vec_id = x.vec_id
        |GROUP BY x.query_id ORDER BY x.query_id""".stripMargin,
    // q130: q50's md5-derived hyperplane/band-key CTEs, candidates in
    // BOTH directions (a <> b), exact cosine, per-id row_number <= 3
    // with ties to the lower neighbor id — value-identical to the Spark
    // kernel (q50's proven basis).
    "q130_knn_graph" ->
      """WITH pl AS (
        |  SELECT b.b AS band, pp.p AS p, d.i AS i,
        |         (('0x' || substr(md5('plane:' || (b.b*8 + pp.p) || ':' || d.i), 1, 15))::BIGINT
        |           / 576460752303423488.0) - 1.0 AS c
        |  FROM (SELECT unnest(range(0, 4)) AS b) b,
        |       (SELECT unnest(range(0, 8)) AS p) pp,
        |       (SELECT unnest(range(0, 64)) AS i) d),
        |pv AS (SELECT band, p, list(c ORDER BY i) AS pvec FROM pl GROUP BY band, p),
        |proj AS (SELECT e.vec_id, pv.band, pv.p,
        |                list_dot_product(e.embedding::DOUBLE[], pv.pvec) AS pr
        |         FROM embeddings e, pv),
        |k AS (SELECT vec_id, band,
        |             sum(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END) AS key
        |      FROM proj GROUP BY vec_id, band),
        |cand AS (SELECT DISTINCT a.vec_id AS id, b.vec_id AS neighbor_id
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key
        |         WHERE a.vec_id <> b.vec_id),
        |scored AS (SELECT c.id, c.neighbor_id,
        |                  list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS cosine
        |           FROM cand c
        |           JOIN embeddings ea ON ea.vec_id = c.id
        |           JOIN embeddings eb ON eb.vec_id = c.neighbor_id),
        |ranked AS (SELECT id, neighbor_id, cosine,
        |                  row_number() OVER (PARTITION BY id
        |                    ORDER BY cosine DESC, neighbor_id) AS rank
        |           FROM scored)
        |SELECT id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 3
        |ORDER BY id, rank""".stripMargin,
    // per-anchor top-5 different-label neighbors; cosine via the same
    // double fold as q30, rank ties to the smaller candidate id
    "q126_hard_negatives" ->
      """WITH a AS (SELECT vec_id AS anchor_id, embedding AS avec, label AS albl
        |           FROM embeddings WHERE vec_id % 25 = 0),
        |s AS (SELECT a.anchor_id, b.vec_id AS negative_id,
        |             b.label AS negative_label,
        |             list_cosine_similarity(b.embedding::DOUBLE[], a.avec::DOUBLE[]) AS cosine
        |      FROM embeddings b CROSS JOIN a
        |      WHERE b.label <> a.albl),
        |r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
        |                                   ORDER BY cosine DESC, negative_id) AS rank
        |      FROM s)
        |SELECT anchor_id, negative_id, negative_label, cosine, rank
        |FROM r WHERE rank <= 5
        |ORDER BY anchor_id, rank""".stripMargin,
    // q32's plane/bucket CTEs generalized to the q69 query set: ANN
    // top-5 from the bucket equi-join, exact top-5 from the full scan,
    // recall = hits/truth per query via a left join from ground truth.
    "q81_ann_recall" ->
      """WITH pl AS (
        |  SELECT pp.p AS p, d.i AS i,
        |         (('0x' || substr(md5('plane:' || pp.p || ':' || d.i), 1, 15))::BIGINT
        |           / 576460752303423488.0) - 1.0 AS c
        |  FROM (SELECT unnest(range(0, 2)) AS p) pp,
        |       (SELECT unnest(range(0, 64)) AS i) d),
        |pv AS (SELECT p, list(c ORDER BY i) AS pvec FROM pl GROUP BY p),
        |k AS (SELECT e.vec_id,
        |             sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pv.pvec) > 0
        |                      THEN (1::BIGINT << p) ELSE 0 END) AS bucket
        |      FROM embeddings e, pv GROUP BY e.vec_id),
        |qs AS (SELECT e.vec_id AS query_id, e.embedding AS qv, k.bucket AS qb
        |       FROM embeddings e JOIN k ON k.vec_id = e.vec_id
        |       WHERE e.vec_id % 100 = 0),
        |ar AS (SELECT q.query_id, e.vec_id,
        |         row_number() OVER (PARTITION BY q.query_id
        |           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |                    e.vec_id) AS rn
        |       FROM embeddings e JOIN k ON k.vec_id = e.vec_id, qs q
        |       WHERE k.bucket = q.qb AND e.vec_id <> q.query_id),
        |a AS (SELECT query_id, vec_id FROM ar WHERE rn <= 5),
        |er AS (SELECT q.query_id, e.vec_id,
        |         row_number() OVER (PARTITION BY q.query_id
        |           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |                    e.vec_id) AS rn
        |       FROM embeddings e, qs q WHERE e.vec_id <> q.query_id),
        |x AS (SELECT query_id, vec_id FROM er WHERE rn <= 5)
        |SELECT x.query_id,
        |       CAST(count(*) AS BIGINT) AS n_truth,
        |       CAST(count(a.vec_id) AS BIGINT) AS n_hit,
        |       CAST(count(a.vec_id) AS DOUBLE) / count(*) AS recall
        |FROM x LEFT JOIN a ON a.query_id = x.query_id AND a.vec_id = x.vec_id
        |GROUP BY x.query_id ORDER BY x.query_id""".stripMargin,
    "q69_ann_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |           WHERE vec_id % 100 = 0),
        |s AS (SELECT q.query_id, e.vec_id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS cosine
        |      FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, vec_id) AS rn FROM s)
        |SELECT query_id, vec_id, cosine FROM r WHERE rn <= 5
        |ORDER BY query_id, vec_id""".stripMargin,
    "q70_quantize_i8" ->
      """WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |         CAST(CAST(list_max(list_transform(v, x -> abs(x))) / 127.0 AS REAL)
        |           AS DOUBLE) AS s
        |       FROM b),
        |qz AS (SELECT vec_id, v, s,
        |         CASE WHEN s = 0 THEN list_transform(v, x -> 0)
        |              ELSE list_transform(v, x -> CAST(floor(x / s + 0.5) AS INTEGER))
        |         END AS q
        |       FROM sc)
        |SELECT vec_id, CAST(s AS REAL) AS scale,
        |       md5(array_to_string(list_transform(q, x -> x::VARCHAR), ',')) AS qvec_md5,
        |       list_max(list_transform(range(1, len(v) + 1),
        |         i -> abs(v[i] - q[i] * s))) AS max_err
        |FROM qz ORDER BY vec_id""".stripMargin,
    "q30_ann_bruteforce" ->
      """SELECT b.vec_id,
        |       list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id = 0 AND b.vec_id <> 0
        |ORDER BY cosine DESC, b.vec_id
        |LIMIT 10""".stripMargin,
    // q43's md5-seeded centroid + argmax-assignment CTEs, then q54's
    // deterministic md5-ordered per-cell take
    "q120_diverse_sample" ->
      """WITH h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
        |                embedding AS cvec
        |         FROM h ORDER BY hh, vec_id LIMIT 8),
        |asg AS (SELECT e.vec_id, c.cid,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                          c.cid) AS rn
        |        FROM embeddings e, cent c),
        |cells AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
        |r AS (SELECT e.vec_id, e.label, cells.cid AS centroid_id,
        |        row_number() OVER (PARTITION BY cells.cid
        |          ORDER BY md5(e.vec_id::VARCHAR), e.vec_id) AS rn2
        |      FROM embeddings e JOIN cells USING (vec_id))
        |SELECT vec_id, label, centroid_id FROM r WHERE rn2 <= 20
        |ORDER BY vec_id""".stripMargin,
    "q115_embedding_qa" ->
      """WITH n AS (SELECT label, embedding,
        |             list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS nsq
        |           FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(sum(CASE WHEN len(embedding) = 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_dim_ok,
        |       CAST(sum(CASE WHEN nsq = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |       CAST(sum(CASE WHEN abs(nsq - 1.0) <= 0.001 THEN 1 ELSE 0 END) AS BIGINT) AS n_unit
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
    "q111_semantic_decontam" ->
      """WITH e AS (SELECT vec_id AS eid, embedding FROM embeddings
        |           WHERE vec_id % 97 = 0),
        |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 <> 0),
        |s AS (SELECT c.vec_id, e.eid,
        |        list_cosine_similarity(c.embedding::DOUBLE[],
        |                               e.embedding::DOUBLE[]) AS cos,
        |        row_number() OVER (PARTITION BY c.vec_id
        |                           ORDER BY cos DESC, e.eid) AS rn
        |      FROM c CROSS JOIN e)
        |SELECT vec_id, cos AS max_cosine, eid AS nearest_eval_id,
        |       cos >= 0.35 AS contaminated
        |FROM s WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q31_cosine_neardup" ->
      """SELECT a.vec_id AS idA, b.vec_id AS idB,
        |       list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.3
        |ORDER BY idA, idB""".stripMargin,
    "q33_label_stats" ->
      """WITH t AS (SELECT label, vec_id,
        |             CAST(embedding[1] AS DOUBLE) AS c0,
        |             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |           FROM embeddings)
        |SELECT label, count(*) AS n_vecs, max(norm) AS max_norm,
        |       min(c0) AS min_c0, max(c0) AS max_c0
        |FROM t GROUP BY label ORDER BY label""".stripMargin,
    // q70's quantization CTEs → quantized-cosine candidate ranking over
    // the dequantized lists → exact float re-rank. Every stage is
    // deterministic double arithmetic both engines reproduce.
    "q79_ann_quantized" ->
      """WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |         CAST(CAST(list_max(list_transform(v, x -> abs(x))) / 127.0 AS REAL)
        |           AS DOUBLE) AS s
        |       FROM b),
        |qz AS (SELECT vec_id, v, s,
        |         CASE WHEN s = 0 THEN list_transform(v, x -> 0)
        |              ELSE list_transform(v, x -> CAST(floor(x / s + 0.5) AS INTEGER))
        |         END AS q
        |       FROM sc),
        |qv AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (SELECT z.vec_id, z.v,
        |             list_cosine_similarity(list_transform(z.q, x -> x * z.s), qv.qe) AS cosine_q
        |           FROM qz z, qv WHERE z.vec_id <> 0),
        |cand AS (SELECT * FROM scored ORDER BY cosine_q DESC, vec_id LIMIT 40)
        |SELECT c.vec_id, c.cosine_q,
        |       list_cosine_similarity(c.v, qv.qe) AS cosine
        |FROM cand c, qv
        |ORDER BY cosine DESC, c.vec_id
        |LIMIT 10""".stripMargin,
    // Single-band, 2-plane variant of the q50 bucket machinery: assign
    // every vector its bucket, keep the query's bucket, exact top-10.
    "q32_ann_lsh" ->
      """WITH pl AS (
        |  SELECT pp.p AS p, d.i AS i,
        |         (('0x' || substr(md5('plane:' || pp.p || ':' || d.i), 1, 15))::BIGINT
        |           / 576460752303423488.0) - 1.0 AS c
        |  FROM (SELECT unnest(range(0, 2)) AS p) pp,
        |       (SELECT unnest(range(0, 64)) AS i) d),
        |pv AS (SELECT p, list(c ORDER BY i) AS pvec FROM pl GROUP BY p),
        |k AS (SELECT e.vec_id,
        |             sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pv.pvec) > 0
        |                      THEN (1::BIGINT << p) ELSE 0 END) AS bucket
        |      FROM embeddings e, pv GROUP BY e.vec_id),
        |q AS (SELECT e.embedding AS qe, k.bucket AS qb
        |      FROM embeddings e JOIN k ON k.vec_id = e.vec_id
        |      WHERE e.vec_id = 0)
        |SELECT e.vec_id,
        |       list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS cosine
        |FROM embeddings e JOIN k ON k.vec_id = e.vec_id, q
        |WHERE k.bucket = q.qb AND e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    // q43's deterministic cells + within-cell pairing + exact cosine
    // verification. The Spark maxCell cap (100000) cannot trigger at
    // sf0.01 (≤1000 vectors per cell).
    "q77_semantic_dedup_ivf" ->
      """WITH h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
        |                embedding AS cvec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, c.cid,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                          c.cid) AS rn
        |        FROM embeddings e, cent c),
        |cells AS (SELECT vec_id, cid FROM asg WHERE rn = 1)
        |SELECT a.vec_id AS idA, b.vec_id AS idB,
        |       list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS cosine
        |FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |JOIN embeddings ea ON ea.vec_id = a.vec_id
        |JOIN embeddings eb ON eb.vec_id = b.vec_id
        |WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) > 0.3
        |ORDER BY idA, idB""".stripMargin,
    // q43's centroid/cell CTEs with the probe selection fanned out per
    // query (the q81 recall shape): ANN top-5 restricted to each query's
    // best-4 cells, exact top-5 from the full scan, recall per query.
    "q83_ann_recall_ivf" ->
      """WITH h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
        |                embedding AS cvec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, c.cid,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                          c.cid) AS rn
        |        FROM embeddings e, cent c),
        |cells AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
        |qs AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |       WHERE vec_id % 100 = 0),
        |pr AS (SELECT q.query_id, c.cid,
        |              row_number() OVER (PARTITION BY q.query_id
        |                ORDER BY list_cosine_similarity(q.qv::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                         c.cid) AS rn
        |       FROM qs q, cent c),
        |probes AS (SELECT query_id, cid FROM pr WHERE rn <= 4),
        |ar AS (SELECT q.query_id, e.vec_id,
        |              row_number() OVER (PARTITION BY q.query_id
        |                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |                         e.vec_id) AS rn
        |       FROM embeddings e
        |       JOIN cells ON cells.vec_id = e.vec_id
        |       JOIN probes p ON p.cid = cells.cid
        |       JOIN qs q ON q.query_id = p.query_id
        |       WHERE e.vec_id <> q.query_id),
        |a AS (SELECT query_id, vec_id FROM ar WHERE rn <= 5),
        |er AS (SELECT q.query_id, e.vec_id,
        |              row_number() OVER (PARTITION BY q.query_id
        |                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
        |                         e.vec_id) AS rn
        |       FROM embeddings e, qs q WHERE e.vec_id <> q.query_id),
        |x AS (SELECT query_id, vec_id FROM er WHERE rn <= 5)
        |SELECT x.query_id,
        |       CAST(count(*) AS BIGINT) AS n_truth,
        |       CAST(count(a.vec_id) AS BIGINT) AS n_hit,
        |       CAST(count(a.vec_id) AS DOUBLE) / count(*) AS recall
        |FROM x LEFT JOIN a ON a.query_id = x.query_id AND a.vec_id = x.vec_id
        |GROUP BY x.query_id ORDER BY x.query_id""".stripMargin,
    // IVF: centroids = 16 lowest-md5(vec_id) vectors; cells = argmax
    // cosine (ties to lower cell id); probe the query's best 4 cells.
    "q43_ann_ivf" ->
      """WITH h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
        |                embedding AS cvec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, c.cid,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                          c.cid) AS rn
        |        FROM embeddings e, cent c),
        |cells AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |probes AS (SELECT c.cid FROM cent c, qv
        |           ORDER BY list_cosine_similarity(qv.qe::DOUBLE[], c.cvec::DOUBLE[]) DESC, c.cid
        |           LIMIT 4)
        |SELECT e.vec_id,
        |       list_cosine_similarity(e.embedding::DOUBLE[], qv.qe::DOUBLE[]) AS cosine
        |FROM embeddings e
        |JOIN cells ON cells.vec_id = e.vec_id, qv
        |WHERE cells.cid IN (SELECT cid FROM probes) AND e.vec_id <> 0
        |ORDER BY cosine DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    // Rebuilds the md5-derived hyperplane matrix (component (g,i) =
    // hex60(md5('plane:g:i'))/2^59 - 1), assigns every vector its 4 band
    // keys, pairs within (band, key), verifies exact cosine — the same
    // computation the Spark kernel runs, value-identical. The Spark
    // plan's maxBucket cap (10000) is not modeled: at sf0.01 every
    // bucket ≤ total vectors (1000), so it provably cannot trigger
    // (same argument as q51; q52/q53 likewise).
    "q50_cosine_neardup_bucketed" ->
      """WITH pl AS (
        |  SELECT b.b AS band, pp.p AS p, d.i AS i,
        |         (('0x' || substr(md5('plane:' || (b.b*8 + pp.p) || ':' || d.i), 1, 15))::BIGINT
        |           / 576460752303423488.0) - 1.0 AS c
        |  FROM (SELECT unnest(range(0, 4)) AS b) b,
        |       (SELECT unnest(range(0, 8)) AS p) pp,
        |       (SELECT unnest(range(0, 64)) AS i) d),
        |pv AS (SELECT band, p, list(c ORDER BY i) AS pvec FROM pl GROUP BY band, p),
        |proj AS (SELECT e.vec_id, pv.band, pv.p,
        |                list_dot_product(e.embedding::DOUBLE[], pv.pvec) AS pr
        |         FROM embeddings e, pv),
        |k AS (SELECT vec_id, band,
        |             sum(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END) AS key
        |      FROM proj GROUP BY vec_id, band),
        |cand AS (SELECT DISTINCT a.vec_id AS idA, b.vec_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
        |SELECT c.idA, c.idB,
        |       list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS cosine
        |FROM cand c
        |JOIN embeddings ea ON ea.vec_id = c.idA
        |JOIN embeddings eb ON eb.vec_id = c.idB
        |WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) > 0.3
        |ORDER BY idA, idB""".stripMargin,
    // q50's plane/key machinery with the batch/corpus split: candidates
    // are (band, key) collisions BETWEEN the sides. The Spark maxBucket
    // cap (10000) cannot trigger at sf0.01 (≤1000 vectors per bucket).
    "q74_incremental_cosine_neardup" ->
      """WITH pl AS (
        |  SELECT b.b AS band, pp.p AS p, d.i AS i,
        |         (('0x' || substr(md5('plane:' || (b.b*8 + pp.p) || ':' || d.i), 1, 15))::BIGINT
        |           / 576460752303423488.0) - 1.0 AS c
        |  FROM (SELECT unnest(range(0, 4)) AS b) b,
        |       (SELECT unnest(range(0, 8)) AS p) pp,
        |       (SELECT unnest(range(0, 64)) AS i) d),
        |pv AS (SELECT band, p, list(c ORDER BY i) AS pvec FROM pl GROUP BY band, p),
        |proj AS (SELECT e.vec_id, pv.band, pv.p,
        |                list_dot_product(e.embedding::DOUBLE[], pv.pvec) AS pr
        |         FROM embeddings e, pv),
        |k AS (SELECT vec_id, band,
        |             sum(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END) AS key
        |      FROM proj GROUP BY vec_id, band),
        |cand AS (SELECT DISTINCT a.vec_id AS idA, b.vec_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key
        |         WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 <> 0)
        |SELECT c.idA, c.idB,
        |       list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS cosine
        |FROM cand c
        |JOIN embeddings ea ON ea.vec_id = c.idA
        |JOIN embeddings eb ON eb.vec_id = c.idB
        |WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) > 0.3
        |ORDER BY idA, idB""".stripMargin,
    // q77's cell-pair set + recursive-CTE transitive closure → survivors
    // (the q53 technique on the IVF candidate front end).
    "q78_embedding_dedup_ivf" ->
      """WITH RECURSIVE h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
        |                embedding AS cvec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, c.cid,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                          c.cid) AS rn
        |        FROM embeddings e, cent c),
        |cells AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
        |p AS (SELECT a.vec_id AS idA, b.vec_id AS idB
        |      FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |      JOIN embeddings ea ON ea.vec_id = a.vec_id
        |      JOIN embeddings eb ON eb.vec_id = b.vec_id
        |      WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) > 0.3),
        |e AS (SELECT idA AS src, idB AS dst FROM p UNION ALL SELECT idB, idA FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
        |losers AS (SELECT id FROM (SELECT id, min(r) AS label FROM reach GROUP BY id)
        |           WHERE id <> label)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM losers)
        |ORDER BY vec_id""".stripMargin,
    // q43's deterministic centroid model, assignments per release slice,
    // exact integer L1 numerator summed in DECIMAL (the q105 technique)
    "q108_embedding_drift" ->
      """WITH h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
        |                embedding AS cvec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, c.cid,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                          c.cid) AS rn
        |        FROM embeddings e, cent c),
        |cells AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
        |ha AS (SELECT cid, CAST(count(*) AS BIGINT) AS ca FROM cells
        |       WHERE vec_id % 3 <> 0 GROUP BY cid),
        |hb AS (SELECT cid, CAST(count(*) AS BIGINT) AS cb FROM cells
        |       WHERE vec_id % 5 <> 0 GROUP BY cid),
        |j AS (SELECT COALESCE(ha.ca, 0) AS ca, COALESCE(hb.cb, 0) AS cb
        |      FROM ha FULL OUTER JOIN hb ON hb.cid = ha.cid),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |             CAST(sum(cb) AS BIGINT) AS nb FROM j)
        |SELECT t.na AS n_a, t.nb AS n_b,
        |       CAST(sum(abs(CAST(ca AS DECIMAL(19,0)) * nb
        |                    - CAST(cb AS DECIMAL(19,0)) * na)) AS BIGINT) AS l1_num,
        |       CAST(CAST(sum(abs(CAST(ca AS DECIMAL(19,0)) * nb
        |                         - CAST(cb AS DECIMAL(19,0)) * na)) AS DECIMAL(38,0)) AS DOUBLE)
        |         / (2.0 * na * nb) AS tv
        |FROM j, t GROUP BY t.na, t.nb""".stripMargin,
    // q78's cells + closure with the SemDeDup survivor rule: per
    // component the member with the LOWEST centroid similarity wins
    // (ties to lowest id), and every survivor emits its cell and
    // centroid-cosine (the same double fold as q43's emission).
    "q99_semdedup" ->
      """WITH RECURSIVE h AS (SELECT vec_id, embedding,
        |             ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS hh
        |           FROM embeddings),
        |cent AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS cid,
        |                embedding AS cvec
        |         FROM h ORDER BY hh, vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, c.cid,
        |               list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) AS sim,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cvec::DOUBLE[]) DESC,
        |                          c.cid) AS rn
        |        FROM embeddings e, cent c),
        |cells AS (SELECT vec_id, cid, sim FROM asg WHERE rn = 1),
        |p AS (SELECT a.vec_id AS idA, b.vec_id AS idB
        |      FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |      JOIN embeddings ea ON ea.vec_id = a.vec_id
        |      JOIN embeddings eb ON eb.vec_id = b.vec_id
        |      WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) > 0.3),
        |e AS (SELECT idA AS src, idB AS dst FROM p UNION ALL SELECT idB, idA FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
        |lab AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
        |win AS (SELECT id FROM (
        |          SELECT lab.id, row_number() OVER (PARTITION BY lab.label
        |                   ORDER BY cells.sim ASC, lab.id) AS rn
        |          FROM lab JOIN cells ON cells.vec_id = lab.id)
        |        WHERE rn = 1)
        |SELECT c.vec_id, c.cid AS centroid_id, c.sim AS centroid_sim
        |FROM cells c
        |WHERE c.vec_id NOT IN (SELECT id FROM lab)
        |   OR c.vec_id IN (SELECT id FROM win)
        |ORDER BY c.vec_id""".stripMargin,
    // q50's verified pair set + recursive-CTE transitive closure →
    // survivors = vectors that are not a non-minimum cluster member.
    "q53_embedding_dedup" ->
      """WITH RECURSIVE pl AS (
        |  SELECT b.b AS band, pp.p AS p, d.i AS i,
        |         (('0x' || substr(md5('plane:' || (b.b*8 + pp.p) || ':' || d.i), 1, 15))::BIGINT
        |           / 576460752303423488.0) - 1.0 AS c
        |  FROM (SELECT unnest(range(0, 4)) AS b) b,
        |       (SELECT unnest(range(0, 8)) AS p) pp,
        |       (SELECT unnest(range(0, 64)) AS i) d),
        |pv AS (SELECT band, p, list(c ORDER BY i) AS pvec FROM pl GROUP BY band, p),
        |proj AS (SELECT e.vec_id, pv.band, pv.p,
        |                list_dot_product(e.embedding::DOUBLE[], pv.pvec) AS pr
        |         FROM embeddings e, pv),
        |k AS (SELECT vec_id, band,
        |             sum(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END) AS key
        |      FROM proj GROUP BY vec_id, band),
        |cand AS (SELECT DISTINCT a.vec_id AS idA, b.vec_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
        |p AS (SELECT c.idA, c.idB
        |      FROM cand c
        |      JOIN embeddings ea ON ea.vec_id = c.idA
        |      JOIN embeddings eb ON eb.vec_id = c.idB
        |      WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) > 0.3),
        |e AS (SELECT idA AS src, idB AS dst FROM p UNION ALL SELECT idB, idA FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
        |losers AS (SELECT id FROM (SELECT id, min(r) AS label FROM reach GROUP BY id)
        |           WHERE id <> label)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM losers)
        |ORDER BY vec_id""".stripMargin)
}
