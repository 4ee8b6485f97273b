package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sampling

/** Deterministic sampling/mixing operators as oracle-checked queries:
  * the md5 bucket basis makes per-row selection reproducible in DuckDB,
  * so class-balanced capping and weighted corpus mixing are verified
  * row-for-row (the xxh64 `hashSample`/`hashSplit` production twins are
  * spec-verified in `SamplingSpec`; same plan shape, faster hash).
  */
object SamplingQueries {

  /** Class-balanced cap: at most 30 documents per language, chosen by
    * md5(doc_id) order — the deterministic stratified downsample used to
    * balance a training corpus.
    */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sampling.stratifiedTake(Tables.documents(s, dir), "lang", "doc_id", 30)
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** Weighted mixture of two corpora (English at 80%, the rest at 30%)
    * with per-source-salted selection and a provenance tag.
    */
  private def q55(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Sampling.mixCorpora(Seq(
        ("en", docs.where($"lang" === "en"), 0.8),
        ("rest", docs.where($"lang" =!= "en"), 0.3)), "doc_id")
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id", $"source")
  }

  /** Quality-weighted resampling: keep each document with probability
    * equal to its quality score, decided by the deterministic md5
    * bucket — up-weighting good documents reproducibly.
    */
  private def q73(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        graft.ops.TextAnalysis.qualityScore($"text").as("quality"))
    Sampling.weightedSample(scored, "doc_id", $"quality")
      .orderBy($"doc_id")
  }

  /** Deterministic epoch shuffle: the corpus in its reproducible
    * epoch-0 training order. The permutation is the total order of
    * md5("epoch0:" || doc_id) — identical on both engines, so the exact
    * shuffled sequence (not just the membership) is hash-checked.
    */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sampling.shuffleDeterministic(
      Tables.documents(s, dir).select($"doc_id", $"lang"), "doc_id", "epoch0")
  }

  /** Temperature-flattened language mix at alpha = 0.5 (the XLM-R-style
    * multilingual rebalance): tail languages keep everything, the head
    * language downsamples toward the flattened share — rates computed
    * in-plan from group counts, selection by md5(doc_id) bucket, so
    * membership is hash-checked exactly.
    */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sampling.temperatureMix(
        Tables.documents(s, dir).select($"doc_id", $"lang"),
        "lang", "doc_id", alpha = 0.5)
      .orderBy($"doc_id")
  }

  /** DSIR importance weights (Xie et al. 2023): every document scored
    * for how English-corpus-like its hashed n-gram features are (target
    * model = the `lang='en'` slice, raw model = the whole corpus).
    * Emits the exact integer basis — feature counts and the
    * target/raw-model dot products, which fully pin both joined
    * models — and is hash-checked; the selection it drives is q100b,
    * itself hash-gated since round 11 through the quantized-decimal
    * order key (see [[Sampling.importanceTakeRanked]]).
    */
  private def q100(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Sampling.importanceWeights(docs, docs.where($"lang" === "en"),
        "doc_id", "text", buckets = 10000)
      .select($"doc_id", $"n_features",
        // DECIMAL internally; BIGINT at the gated boundary (the driver's
        // hasher cannot digest DECIMAL output — round-6 finding)
        $"target_hits".cast("long").as("target_hits"),
        $"raw_hits".cast("long").as("raw_hits"))
      .orderBy($"doc_id")
  }

  /** The DSIR selection q100's weights drive: top-50 documents by
    * importance weight (greedy deterministic cut, ties to low id) —
    * hash-gated since round 11 via [[Sampling.importanceTakeRanked]]:
    * (rank, doc_id, integer model bases), no ln-derived column at the
    * boundary. The order key is the 1e-6-quantized DECIMAL `logw_sum`,
    * which the oracle recomputes bit-exactly (the q109c/q121c
    * discipline); margin audit in `tools/audit_margins.py` — adjacent
    * distinct sums in the top ~60 clear the 1e-6 quantum by orders of
    * magnitude at sf0.01/sf0.1. Corpus-conditional: re-audit after any
    * fixture regeneration.
    */
  private def q100b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Sampling.importanceTakeRanked(docs, docs.where($"lang" === "en"),
        "doc_id", "text", k = 50, buckets = 10000)
      .select($"rank", $"doc_id", $"n_features",
        // DECIMAL internally; BIGINT at the gated boundary (q100's note)
        $"target_hits".cast("long").as("target_hits"),
        $"raw_hits".cast("long").as("raw_hits"))
      .orderBy($"rank")
  }

  /** Curriculum epoch order: quality bands (cutoffs 0.62 / 0.5 — best
    * material first) with the deterministic within-band shuffle. The
    * full epoch sequence — banding AND the in-band permutation — is
    * hash-checked via the sortable (band, shuffle_key) columns.
    */
  private def q103(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .select($"doc_id",
        graft.ops.TextAnalysis.qualityScore($"text").as("quality"))
    Sampling.curriculumOrder(scored, "doc_id", $"quality",
        cutoffs = Seq(0.62, 0.5), salt = "ep0")
      .select($"doc_id", $"band", $"shuffle_key")
  }

  /** Data-constrained epoch allocation per source: unique tokens, √-
    * temperature target weight, granted epochs under a 4-epoch cap, and
    * the effective token contribution at a 200k-token budget — the
    * repetition schedule table (Muennighoff et al. 2023 shape).
    */
  private def q125(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sampling.epochAllocation(Tables.documents(s, dir), "source", "text",
        budgetTokens = 200000L, alpha = 0.5, maxEpochs = 4.0)
      // quantized DECIMAL(14,6) internally (engine-exact banding);
      // DOUBLE at the gated boundary — the cast of the same exact
      // decimal rounds identically on both engines, and DECIMAL output
      // doesn't hash-digest (round-6 finding)
      .withColumn("weight", col("weight").cast("double"))
      .withColumn("epochs", col("epochs").cast("double"))
      .orderBy($"source")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q125_epoch_allocation" -> (q125 _),
    "q54_stratified_take" -> (q54 _),
    "q55_corpus_mix" -> (q55 _),
    "q73_weighted_sample" -> (q73 _),
    "q82_shuffle_order" -> (q82 _),
    "q92_temperature_mix" -> (q92 _),
    "q100_dsir_weights" -> (q100 _),
    "q100b_dsir_select" -> (q100b _),
    "q103_curriculum_order" -> (q103 _))

  val oracles: Map[String, String] = Map(
    // q92's pow/window chain quantized once to DECIMAL(14,6); the grant
    // is computed in DOUBLE off the quantized weight and quantized once
    // more — no chained decimal arithmetic (engine scale rules differ)
    "q125_epoch_allocation" ->
      """WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY source),
        |q AS (SELECT *, pow(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 0.5) AS q0
        |      FROM n),
        |w AS (SELECT source, n_docs, n_tokens,
        |             CAST(q0 / sum(q0) OVER () AS DECIMAL(14,6)) AS weight
        |      FROM q),
        |e AS (SELECT *, CAST(least(4.0, CAST(weight AS DOUBLE) * 200000 / n_tokens) AS DECIMAL(14,6)) AS epochs
        |      FROM w)
        |SELECT source, n_docs, n_tokens,
        |       CAST(weight AS DOUBLE) AS weight,
        |       CAST(epochs AS DOUBLE) AS epochs,
        |       CAST(floor(epochs * n_tokens) AS BIGINT) AS effective_tokens
        |FROM e ORDER BY source""".stripMargin,
    // the q90 quality formula, banded by the same cutoffs, with the
    // q82-style salted md5 shuffle key — band membership and the exact
    // in-band order both ride the hash check
    "q103_curriculum_order" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |q AS (SELECT doc_id,
        |        CASE WHEN toks[1] = '' THEN 0.0 ELSE (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
        |          + (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3
        |          + (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.2 END AS quality
        |      FROM t)
        |SELECT doc_id,
        |       CASE WHEN quality >= 0.62 THEN 0
        |            WHEN quality >= 0.5 THEN 1
        |            ELSE 2 END AS band,
        |       md5('ep0:' || doc_id) AS shuffle_key
        |FROM q
        |ORDER BY band, shuffle_key, doc_id""".stripMargin,
    // the SELECTION gate (q100b): q100's CTE chain extended with the
    // quantized-decimal importance weight — each smoothed ln cast to
    // DECIMAL(25,6) (the q109c idiom, operand order mirroring
    // Sampling.importanceWeightsWithModels), target minus raw exact in
    // decimal, times the exact feature count, decimal-summed — so the
    // top-50 order is exact decimal arithmetic on both engines; ties
    // break to the lowest doc_id identically
    "q100b_dsir_select" ->
      """WITH ft AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        |            FROM documents),
        |u AS (SELECT doc_id, lang, 'u:' || w AS feat
        |      FROM (SELECT doc_id, lang, unnest(toks) AS w FROM ft)),
        |b AS (SELECT doc_id, lang, 'b:' || toks[i] || ' ' || toks[i + 1] AS feat
        |      FROM ft, UNNEST(range(1, len(toks))) AS t(i)),
        |f AS (SELECT doc_id, lang,
        |             ('0x' || substr(md5(feat), 1, 15))::BIGINT % 10000 AS k
        |      FROM (SELECT * FROM u UNION ALL SELECT * FROM b)),
        |doc AS (SELECT doc_id, k, CAST(count(*) AS BIGINT) AS c
        |        FROM f GROUP BY doc_id, k),
        |tm AS (SELECT k, CAST(count(*) AS BIGINT) AS t FROM f
        |       WHERE lang = 'en' GROUP BY k),
        |rm AS (SELECT k, CAST(count(*) AS BIGINT) AS r FROM f GROUP BY k),
        |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM f WHERE lang = 'en') AS nt,
        |               (SELECT CAST(count(*) AS BIGINT) FROM f) AS nr),
        |j AS (SELECT doc.doc_id, doc.c,
        |        (CAST(ln((COALESCE(tm.t, 0) + 1.0) / (tot.nt + 1.0 * 10000)) AS DECIMAL(25,6))
        |         - CAST(ln((COALESCE(rm.r, 0) + 1.0) / (tot.nr + 1.0 * 10000)) AS DECIMAL(25,6)))
        |          * CAST(doc.c AS DECIMAL(10,0)) AS wl,
        |        CAST(doc.c AS DECIMAL(19,0)) * CAST(COALESCE(tm.t, 0) AS DECIMAL(19,0)) AS th,
        |        CAST(doc.c AS DECIMAL(19,0)) * CAST(COALESCE(rm.r, 0) AS DECIMAL(19,0)) AS rh
        |      FROM doc LEFT JOIN tm ON tm.k = doc.k
        |               LEFT JOIN rm ON rm.k = doc.k
        |               CROSS JOIN tot),
        |s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_features,
        |             sum(wl) AS sc,
        |             CAST(sum(th) AS BIGINT) AS target_hits,
        |             CAST(sum(rh) AS BIGINT) AS raw_hits
        |      FROM j GROUP BY doc_id)
        |SELECT CAST(row_number() OVER (ORDER BY sc DESC, doc_id) AS INTEGER) AS rank,
        |       doc_id, n_features, target_hits, raw_hits
        |FROM s QUALIFY rank <= 50 ORDER BY rank""".stripMargin,
    // DSIR integer basis: hashed unigram+bigram bucket counts per doc,
    // target (lang='en') and raw bucket models, and the exact decimal
    // dot products that pin both joined models — the same md5 % 10000
    // bucket hash the Spark kernel computes
    "q100_dsir_weights" ->
      """WITH ft AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        |            FROM documents),
        |u AS (SELECT doc_id, lang, 'u:' || w AS feat
        |      FROM (SELECT doc_id, lang, unnest(toks) AS w FROM ft)),
        |b AS (SELECT doc_id, lang, 'b:' || toks[i] || ' ' || toks[i + 1] AS feat
        |      FROM ft, UNNEST(range(1, len(toks))) AS t(i)),
        |f AS (SELECT doc_id, lang,
        |             ('0x' || substr(md5(feat), 1, 15))::BIGINT % 10000 AS k
        |      FROM (SELECT * FROM u UNION ALL SELECT * FROM b)),
        |doc AS (SELECT doc_id, k, CAST(count(*) AS BIGINT) AS c
        |        FROM f GROUP BY doc_id, k),
        |tm AS (SELECT k, CAST(count(*) AS BIGINT) AS t FROM f
        |       WHERE lang = 'en' GROUP BY k),
        |rm AS (SELECT k, CAST(count(*) AS BIGINT) AS r FROM f GROUP BY k),
        |j AS (SELECT doc.doc_id, doc.c,
        |        CAST(doc.c AS DECIMAL(19,0)) * CAST(COALESCE(tm.t, 0) AS DECIMAL(19,0)) AS th,
        |        CAST(doc.c AS DECIMAL(19,0)) * CAST(COALESCE(rm.r, 0) AS DECIMAL(19,0)) AS rh
        |      FROM doc LEFT JOIN tm ON tm.k = doc.k
        |               LEFT JOIN rm ON rm.k = doc.k)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_features,
        |       CAST(sum(th) AS BIGINT) AS target_hits,
        |       CAST(sum(rh) AS BIGINT) AS raw_hits
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // group counts → p^alpha shares → downsample-only rates (S = min
    // n_g/q_g; the binding group's rate pinned to 1.0 by the exact
    // argmin comparison), quantized to DECIMAL(10,6) so the bucket gate
    // is exact integer arithmetic, then the md5('tmix:'||id) filter
    "q92_temperature_mix" ->
      """WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
        |q AS (SELECT lang, n,
        |             pow(CAST(n AS DOUBLE) / sum(n) OVER (), 0.5) AS q0
        |      FROM n),
        |r AS (SELECT lang, n, q0 / sum(q0) OVER () AS q FROM q),
        |rate AS (SELECT lang,
        |               CAST(CASE WHEN n / q = min(n / q) OVER () THEN 1.0
        |                         ELSE least(1.0, q * min(n / q) OVER () / n)
        |                    END AS DECIMAL(10,6)) AS rate
        |         FROM r)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN rate ON rate.lang = d.lang
        |WHERE ('0x' || substr(md5('tmix:' || d.doc_id), 1, 15))::BIGINT % 1000000
        |        < CAST(rate.rate * 1000000 AS BIGINT)
        |ORDER BY d.doc_id""".stripMargin,
    "q82_shuffle_order" ->
      """SELECT doc_id, lang, md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents
        |ORDER BY shuffle_key, doc_id""".stripMargin,
    "q54_stratified_take" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 30
        |ORDER BY doc_id""".stripMargin,
    "q55_corpus_mix" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |         ('0x' || substr(md5('en:' || doc_id), 1, 15))::BIGINT % 1000000 AS b_en,
        |         ('0x' || substr(md5('rest:' || doc_id), 1, 15))::BIGINT % 1000000 AS b_rest
        |  FROM documents)
        |SELECT doc_id, lang, 'en' AS source FROM b
        |WHERE lang = 'en' AND b_en < 800000
        |UNION ALL
        |SELECT doc_id, lang, 'rest' AS source FROM b
        |WHERE lang <> 'en' AND b_rest < 300000
        |ORDER BY doc_id, source""".stripMargin,
    "q73_weighted_sample" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |q AS (SELECT doc_id, lang,
        |        CASE WHEN toks[1] = '' THEN 0.0 ELSE (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
        |          + (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3
        |          + (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.2 END AS quality
        |      FROM t)
        |SELECT doc_id, lang, quality FROM q
        |WHERE CAST(('0x' || substr(md5('w:' || doc_id), 1, 15))::BIGINT % 1000000 AS DOUBLE)
        |        < quality * 1000000
        |ORDER BY doc_id""".stripMargin)
}
