package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Decontamination, Dedup, Similarity}

/** Second-decade scale probe (round 10): the shipped-path headliners in
  * their PRODUCTION shape — a FIXED batch/eval set, the stored index
  * built OUTSIDE the timed region (the ingest a deployment amortizes),
  * and only the corpus scaled between the two directories.
  *
  * Why this exists next to the per-query bench: the oracle-gated bench
  * twins of these operators scale their eval sets WITH the corpus
  * (q106's needles are `doc_id % 11`, q67's batch is `doc_id % 3`,
  * q149's queries are `vec_id % 100` — the oracle SQL must be
  * scale-closed, so the eval set must derive from the table), which
  * makes their raw sf1→sf10 ratios measure the TEST shape:
  * batch × corpus ≈ quadratic in sf by construction. The 100 TB serving
  * question is the opposite shape — the corpus grows, the day's probe
  * batch / eval suite / query stream does not — and THIS main measures
  * that: growth ≈ data factor for the scan-bound cases and ≪ data
  * factor for the keyed/stored-index cases is the pass condition.
  *
  * Cases (fixed side always read from `fixedDir`):
  *   ac_verbatim_fixed     fixed needle suite vs corpus scan
  *                         (Aho-Corasick, q106's operator)
  *   exact_substr          corpus-wide rewrite (q138) — inherently
  *                         corpus-proportional, the linear yardstick
  *   keyed_neardup_fixed   fixed doc batch vs stored MinHash band-key
  *                         table (q67's operator, ingest untimed)
  *   keyed_cosine_fixed    fixed vector batch vs stored sign-LSH key
  *                         table (q74's operator, ingest untimed)
  *   pq_serve_fixed        fixed 200-query eval set vs stored bucketed
  *                         PQ codes table (q149's operator, encode +
  *                         write untimed)
  *   streaming_ingest_keyed (round 11) fixed doc batch drained as an
  *                         AvailableNow stream vs pre-seeded corpus +
  *                         key table — the per-batch-work-independent-
  *                         of-corpus-size claim in streaming form
  *
  * Round 11: every fixed batch is pinned to REPLICA 0 of `fixedDir`
  * (ids < 10⁸ — base sf0.1 rows, present verbatim in every ScaleData
  * decade regardless of replica transform), so the same batch probes
  * sf1, sf10 and sf100 fixtures without construction bias; see the
  * scaladoc at the batch definitions. Only documents + embeddings are
  * read — derive probe fixtures with
  * `ScaleData <out> <R> <src> documents,embeddings ...`.
  *
  * Usage: runMain graft.ScaleProbe [fixedDir] [dir1] [dir2] [iters]
  *   defaults: testdata/sf1, testdata/sf1, testdata/sf10, 2
  * Prints one JSON line; archive it under bench_history/.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    def argOr(i: Int, d: String) = if (args.length > i) args(i) else d
    val fixedDir = argOr(0, "testdata/sf1")
    val dir1 = argOr(1, "testdata/sf1")
    val dir2 = argOr(2, "testdata/sf10")
    val iters = argOr(3, "2").toInt
    val spark = GraftSession.local("graft-scale-probe")
    import Bench.fmt

    def release(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def timeMin(df: => DataFrame): Double = {
      val ts = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          df.write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[scale-probe] failed: $e"); None
        } finally release()
      }
      if (ts.isEmpty) -1.0 else ts.min
    }

    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // scratch area for the streaming case's per-run corpus/keys/input
    // copies and checkpoints; removed at exit
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-scale-probe").toString
    // Fixed probe sides — the "today's batch" that does NOT grow.
    // Round 11: pinned to REPLICA 0 of the fixed dir (ids < 10⁸ — the
    // base sf0.1 rows verbatim), because every ScaleData decade keeps
    // replica 0 unchanged, so the same batch rows exist IDENTICALLY in
    // sf1, sf10 and sf100 fixtures whatever the replica transform
    // (rotation vs sign-flip) — without the pin, a batch drawn from
    // replicas 1..9 self-matches in its own decade but not in a
    // differently-transformed larger one, biasing the verify stage of
    // the growth ratio downward.
    val fixedNeedles = Tables.documents(spark, fixedDir)
      .where(col("doc_id") < 100000000L && col("doc_id") % 11 === 0)
      .select(substring(col("text"), 10, 40).as("needle"))
    val fixedDocBatch = Tables.documents(spark, fixedDir)
      .where(col("doc_id") < 100000000L && col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val fixedVecBatch = Tables.embeddings(spark, fixedDir)
      .where(col("vec_id") < 100000000L)
    val fixedQueries = Tables.embeddings(spark, fixedDir)
      .where(col("vec_id") < 100000000L && col("vec_id") % 10 === 0)

    // dev loop: SPARK_GRAFT_PROBE_FILTER=pq times only matching cases
    // (substring on the case name); filtered cases report -1
    val caseFilters = sys.env.get("SPARK_GRAFT_PROBE_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    def wanted(name: String): Boolean =
      caseFilters.isEmpty || caseFilters.exists(name.contains)
    def ifWanted(name: String)(body: => Double): Double =
      if (wanted(name)) body else -1.0

    def measure(dir: String, tag: String): Map[String, Double] = {
      val docs = Tables.documents(spark, dir)
      val emb = Tables.embeddings(spark, dir)

      val ac = ifWanted("ac_verbatim_fixed")(timeMin(
        Decontamination.verbatimMatchesMulti(
          docs, fixedNeedles, "doc_id", "text", "needle", minChars = 20)))
      val es = ifWanted("exact_substr")(timeMin(
        Dedup.exactSubstrDedup(docs, "doc_id", "text", k = 20)))

      // stored MinHash band keys: ingest (key build + bucketed write)
      // runs untimed, the probe pays only batch hashing + the
      // co-bucketed join + candidate verification
      val kn = ifWanted("keyed_neardup_fixed") {
        val tKeys = s"graft_probe_keys_$tag"
        graft.io.Layouts.replaceBucketed(
          Dedup.corpusBandKeys(docs, "doc_id", "text", numHashes = 16,
            bands = 4), tKeys, "band", parts, "key")
        val t = timeMin(Dedup.incrementalNearDupsWithKeys(
          fixedDocBatch, spark.table(tKeys), docs, "doc_id", "text",
          threshold = 0.95, numHashes = 16, bands = 4))
        spark.sql(s"DROP TABLE IF EXISTS $tKeys")
        t
      }

      val kc = ifWanted("keyed_cosine_fixed") {
        val tLsh = s"graft_probe_lsh_$tag"
        graft.io.Layouts.replaceBucketed(
          Similarity.corpusLshKeys(emb, "vec_id", "embedding",
            planesPerBand = 16, bands = 8), tLsh, "band", parts, "key")
        val t = timeMin(Similarity.incrementalCosineNearDupsWithKeys(
          fixedVecBatch, spark.table(tLsh), emb, "vec_id", "embedding",
          threshold = 0.95, planesPerBand = 16, bands = 8))
        spark.sql(s"DROP TABLE IF EXISTS $tLsh")
        t
      }

      // streaming keyed ingest (round 11, the third-decade claim): the
      // FIXED replica-0 doc batch drains as one AvailableNow micro-
      // batched stream against this dir's corpus, whose band-key table
      // is pre-seeded (untimed) — per-batch work independent of corpus
      // size is the pass condition. Each iteration re-seeds its own
      // scratch corpus/keys/checkpoint (fresh tag) so a reused
      // checkpoint can't turn a repeat into a no-op; streamed ids
      // shift by 10¹² — disjoint from every fixture's id space
      // (sf100's ids top out near 10¹¹).
      val st = ifWanted("streaming_ingest_keyed") {
        def streamRun(runTag: String): Double = {
          val base = s"$scratch/stream_${tag}_$runTag"
          try {
            docs.select(col("doc_id"), col("text"))
              .write.mode("overwrite").parquet(s"$base/corpus")
            Dedup.corpusBandKeys(
                spark.read.parquet(s"$base/corpus"), "doc_id", "text",
                numHashes = 16, bands = 4)
              .write.mode("overwrite").parquet(s"$base/keys")
            fixedDocBatch
              .select((col("doc_id") + lit(1000000000000L)).as("doc_id"),
                col("text"))
              .repartition(32).write.mode("overwrite").parquet(s"$base/in")
            val schema = spark.read.parquet(s"$base/in").schema
            val t0 = System.nanoTime()
            graft.streaming.EventStreams.ingestNearDupKeyed(spark, schema,
                s"$base/in", s"$base/corpus", s"$base/keys", s"$base/chk",
                "doc_id", "text", threshold = 0.95, numHashes = 16,
                bands = 4)
              .awaitTermination()
            (System.nanoTime() - t0) / 1e9
          } catch { case scala.util.control.NonFatal(ex) =>
            System.err.println(s"[scale-probe] streaming failed: $ex")
            -1.0
          } finally release()
        }
        val ts = (1 to iters).map(i => streamRun(s"i$i")).filter(_ > 0)
        if (ts.isEmpty) -1.0 else ts.min
      }

      Map("ac_verbatim_fixed" -> ac, "exact_substr" -> es,
        "keyed_neardup_fixed" -> kn, "keyed_cosine_fixed" -> kc,
        "streaming_ingest_keyed" -> st,
        "pq_serve_fixed" -> ifWanted("pq_serve_fixed")(
          pqCase(dir, tag, cells = 16)))
    }

    // stored PQ serving: model training + encode + bucketed write are
    // ingest (untimed); the timed region is the fixed 200-query batch
    // against the codes table + shortlist re-rank. `cells` is the IVF
    // size knob: pinned (the fixed-config yardstick) the per-query
    // candidate list grows linearly with the corpus and the serve
    // inherits it; production scales cells ∝ √N (per-cell size √N, so
    // nprobe fixed ⇒ candidates/query √N) — the *_sqrtcells case below.
    def pqCase(dir: String, tag: String, cells: Int,
        queries: DataFrame = fixedQueries,
        prunedStore: Boolean = false): Double = {
      val emb = Tables.embeddings(spark, dir)
      val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding",
        cells)
      val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", 8, 16)
      val codesDf = Similarity.pqEncode(
          Similarity.ivfAssign(emb, "embedding", centroids),
          "embedding", cbs)
        .select(col("vec_id"), col("pq_code"), col("vnorm"),
          col("centroid_id"))
      if (prunedStore) {
        // round-12 serving layout: codes prefix-partitioned by
        // centroid_id, the probe states its cells' prefix set as a
        // partition filter — directories outside it are never listed
        val codesDir = s"$scratch/pq_codes_$tag"
        graft.io.Layouts.writePrefixPartitioned(codesDf, codesDir,
          "centroid_id", prefixes = 64)
        timeMin(Similarity.pqAdcTopKBatchPruned(
          emb, codesDir, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 5, cbs, centroids,
          nprobe = 4, prefixes = 64))
      } else {
        val tPq = s"graft_probe_pq_$tag"
        graft.io.Layouts.replaceBucketed(codesDf, tPq, "centroid_id", parts)
        val pq = timeMin(Similarity.pqAdcTopKBatchWithCodes(
          emb, spark.table(tPq), "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 5, cbs, centroids,
          nprobe = 4))
        spark.sql(s"DROP TABLE IF EXISTS $tPq")
        pq
      }
    }

    // discarded warmup over the fixed-side fixtures: the first measured
    // pass otherwise pays the whole JVM/codegen cold start and the
    // smaller directory reads SLOWER than the 10×-larger one
    measure(fixedDir, "w")
    val m1 = measure(dir1, "a")
    val m2 = measure(dir2, "b")
    // cells ∝ √(data factor): the IVF sizing a production deployment
    // applies as the corpus grows — measured against dir1's 16-cell
    // serve, this is the realistic second-decade PQ growth number.
    // The two full count() scans run only when a case needs them.
    val needSqrt = wanted("pq_serve_sqrtcells") ||
      wanted("pq_serve_small_batch") || wanted("pq_serve_pruned")
    val sqrtCells =
      if (!needSqrt) 16
      else {
        val factor = Tables.embeddings(spark, dir2).count().toDouble /
          math.max(1L, Tables.embeddings(spark, dir1).count())
        math.max(16, math.round(16 * math.sqrt(factor)).toInt)
      }
    val pqSqrt = ifWanted("pq_serve_sqrtcells")(pqCase(dir2, "c", sqrtCells))
    // small-batch serve: 5 fixed queries probe ≤ 20 of the scaled cell
    // count, so the probed-cell isin BUCKET-PRUNES the stored codes
    // table — the measurement separating "codes scan grows with the
    // corpus" from "a small query batch reads only its own cells"
    val small = Tables.embeddings(spark, fixedDir)
      .where(col("vec_id") < 100000000L && col("vec_id") % 400 === 0)
    val pqSmall1 = ifWanted("pq_serve_small_batch")(
      pqCase(dir1, "d", cells = 16, queries = small))
    val pqSmall2 = ifWanted("pq_serve_small_batch")(
      pqCase(dir2, "e", cells = sqrtCells, queries = small))
    // the round-12 pruned-store twin of pq_serve_sqrtcells: same fixed
    // 200-query batch, same √N cell sizing, codes prefix-partitioned —
    // growth ≤ the candidates-only model (√factor) is the pass
    // condition, the unpruned codes-scan term having been the round-11
    // residual (4.04× measured vs 3.16× modeled per decade)
    val pqPruned1 = ifWanted("pq_serve_pruned")(
      pqCase(dir1, "f", cells = 16, prunedStore = true))
    val pqPruned2 = ifWanted("pq_serve_pruned")(
      pqCase(dir2, "g", cells = sqrtCells, prunedStore = true))
    val mm2 = m2 +
      ("pq_serve_sqrtcells" -> pqSqrt) +
      ("pq_serve_small_batch" -> pqSmall2) +
      ("pq_serve_pruned" -> pqPruned2)
    val base = m1 +
      ("pq_serve_sqrtcells" -> m1("pq_serve_fixed")) +
      ("pq_serve_small_batch" -> pqSmall1) +
      ("pq_serve_pruned" -> pqPruned1)
    val cases = mm2.keys.toSeq.sorted.map { k =>
      val (a, b) = (base(k), mm2(k))
      val g = if (a > 0 && b > 0) b / a else -1.0
      s""""$k":{"x1":${fmt(a)},"x2":${fmt(b)},"growth":${fmt(g)}}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"probe":"production-shape second decade","sqrt_cells":$sqrtCells,"fixed":"$fixedDir","dir1":"$dir1","dir2":"$dir2","iters":$iters,"cases":$cases}"""
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(scratch)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case scala.util.control.NonFatal(_) => }
    spark.stop()
    println(line)
  }
}
