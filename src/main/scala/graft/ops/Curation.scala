package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the filter→decontaminate→dedup pipeline a
  * training-data run executes as one job, composed from the individually
  * verified operators ([[TextAnalysis]], [[Decontamination]], [[Dedup]]).
  *
  * Scale shape: quality scoring is a narrow codegen'd scan (no shuffle);
  * decontamination broadcasts the eval shingle set and anti-joins the
  * (small) flagged-id set; exact dedup is the single md5 hash-shuffle.
  * The whole pipeline shuffles the corpus once.
  */
object Curation {

  /** Curate `corpus` against an eval set: keep documents that
    *  1. have at least `minTokens` whitespace tokens,
    *  2. have a duplicated-2-gram fraction ≤ `maxDupGramFraction`
    *     (the Gopher repetition rule via [[TextAnalysis.dupGramFraction]]),
    *  3. share no `contaminationN`-gram shingle with `bench`
    *     ([[Decontamination.contaminationScores]]), and
    *  4. survive exact dedup (lowest id per identical text).
    *
    * @return `idCol`, n_tokens, dup_2gram_frac for surviving documents
    */
  def curate(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minTokens: Int = 20,
      maxDupGramFraction: Double = 0.2, contaminationN: Int = 8): DataFrame = {
    val flagged = Decontamination.contaminationScores(
        corpus, bench, idCol, textCol, n = contaminationN)
      .select(col(idCol))
    val scored = corpus.select(col(idCol), col(textCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextAnalysis.dupGramFraction(col(textCol), 2).as("dup_2gram_frac"))
      .where(col("n_tokens") >= minTokens &&
        col("dup_2gram_frac") <= maxDupGramFraction)
    val clean = scored.join(broadcast(flagged), Seq(idCol), "left_anti")
    Dedup.exactDedup(clean, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("dup_2gram_frac"))
  }

  /** The CCNet-shaped gate chain as ONE plan: heuristic quality
    * (token count + Gopher repetition rule) → bigram-LM perplexity gate
    * against a clean `reference` slice ([[Vocab.bigramLogProb]]) → OOV
    * gate against the reference's top-`vocabSize` vocabulary
    * ([[Vocab.oovRate]]) → benchmark decontamination → exact dedup. The
    * standard "CCNet then dedup" production ordering; every gate is
    * individually hash-gated (q22/q87/q88/q56/q29) and this composes
    * them.
    *
    * Cross-engine-stable gate predicates by construction: the LM gate
    * compares the exact 1e-6-quantized DECIMAL ln-sum against
    * `lmThreshold × n_bigrams` in decimal arithmetic (no double
    * threshold on a double sum), and the OOV gate is pure integer
    * arithmetic (`n_oov · oovDen ≤ n_tokens · oovNum`).
    *
    * Scale shape: the quality stage is a narrow codegen'd scan; each
    * LM/OOV gate adds one per-doc aggregate joined back by id (the
    * model/vocab sides are reference-slice-sized; the vocab broadcasts,
    * the bigram model joins by key because the MODEL IS DATA); the
    * flagged-id set broadcasts; dedup is the one corpus-wide shuffle.
    * The corpus parquet is re-scanned once per gate (narrow
    * two-column projections, each restricted to quality survivors by an
    * id join against the PINNED skinny quality frame — id + the two
    * numeric quality columns, [[graft.ops.Dedup.pinSmall]]), so the
    * quality kernel runs once instead of once per gate. The text itself
    * is deliberately NOT cached: an in-op eager MEMORY_AND_DISK cache
    * of the text slice was measured SLOWER at test scale (r14, 2.3 s
    * vs 2.0 s at sf0.1 — writing text blocks costs more than the
    * kernel recompute it saves), while the skinny pin follows
    * [[curateAndDedup]]'s id-only cache, which wins at every scale.
    *
    * @return survivors: `idCol, n_tokens, dup_2gram_frac, n_bigrams,
    *         n_oov` — all exact integer/ratio-of-integer columns. The
    *         ln-derived `logprob_sum` is gate-internal only: hashing it
    *         cross-engine is environment-dependent (measured rounds
    *         3–4), so it never appears in the output. CurationSpec
    *         asserts every sf-test document clears the LM threshold by
    *         a margin ≫ quantum × n_bigrams, so gate MEMBERSHIP cannot
    *         flip between engines either.
    */
  def curateCcnet(corpus: DataFrame, reference: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, minTokens: Int = 20,
      maxDupGramFraction: Double = 0.2,
      lmThreshold: BigDecimal = BigDecimal("-3.55"), vocabSize: Int = 20,
      oovNum: Int = 3, oovDen: Int = 8, contaminationN: Int = 8): DataFrame = {
    // the LM gate joins bigramLogProb's output, which has no row for a
    // zero-bigram (< 2 token) document — such a doc would be dropped by
    // the join, not gated; ≥ 2 tokens makes every quality survivor
    // LM-scorable, so the gates compose as documented
    require(minTokens >= 2,
      s"minTokens must be >= 2 (a < 2-token document has no bigrams and " +
        s"cannot be LM-gated), got $minTokens")
    // The quality stage is pinned SKINNY — id + the two numeric quality
    // columns, never the text (r14 measured an eager TEXT cache slower,
    // 2.3 s vs 2.0 s at sf0.1: writing text blocks costs more than the
    // kernel recompute it saves; the id-only cache in curateAndDedup is
    // the winning precedent). Unpinned, the quality kernel (tokenCount +
    // the gram-stats dupGramFraction) re-ran inside every derived scan —
    // 4 evaluations in q89's r14 plan. Each gate re-reads the text from
    // the (columnar, cheap) source scan and drops non-survivors with an
    // id join against the pinned frame instead of re-running the kernel.
    val qual = Dedup.pinSmall(corpus.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextAnalysis.dupGramFraction(col(textCol), 2).as("dup_2gram_frac"))
      .where(col("n_tokens") >= minTokens &&
        col("dup_2gram_frac") <= maxDupGramFraction))
    // the later gates score only quality survivors — the id join rides
    // each derived scan, so gate work shrinks with the quality cut
    val slim = corpus.select(col(idCol), col(textCol))
      .join(qual.select(col(idCol)), Seq(idCol))
    val lm = Vocab.bigramLogProb(slim, reference, idCol, textCol)
      .where(col("logprob_sum") >=
        lit(lmThreshold.setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .underlying) * col("n_bigrams"))
      .select(col(idCol), col("n_bigrams"), col("logprob_sum"))
    val oov = Vocab.oovRate(slim, reference, idCol, textCol, vocabSize)
      .where(col("n_oov") * oovDen <= col("n_tokens") * oovNum)
      .select(col(idCol), col("n_oov"))
    val flagged = Decontamination.contaminationScores(
        slim, bench, idCol, textCol, n = contaminationN)
      .select(col(idCol))
    val gated = slim
      .join(qual, Seq(idCol))
      .join(lm, Seq(idCol))
      .join(oov, Seq(idCol))
      .join(broadcast(flagged), Seq(idCol), "left_anti")
    Dedup.exactDedup(gated, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("dup_2gram_frac"),
        col("n_bigrams"), col("n_oov"))
  }

  /** The Gopher-rule curation pipeline in ONE composed plan: the full
    * rule battery ([[TextAnalysis.gopherReport]]) gates admission, the
    * survivors are decontaminated against `bench`
    * ([[Decontamination.contaminationScores]]), each document's
    * repeated spans are removed IN PLACE
    * ([[Dedup.intraDocChunkDedup]] — text is rewritten, not dropped),
    * and the cleaned texts are exact-deduped (lowest id survives).
    * The DeepMind-shape alternative to the CCNet-shape [[curateCcnet]]:
    * rule-based admission instead of LM scoring.
    *
    * Scale shape: the rule battery and span cleanup are narrow codegen
    * scans; decontamination broadcasts the eval shingle set and
    * anti-joins the flagged-id sliver; the single corpus shuffle is the
    * final dedup's fingerprint window.
    *
    * @return `idCol, n_chunks, n_kept, dedup_text` for surviving
    *         documents (q110's columns, post-dedup)
    */
  def curateGopher(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minWords: Int = 50,
      minDistinctStopwords: Int = 2, contaminationN: Int = 8,
      chunkTokens: Int = 20): DataFrame = {
    val kept = corpus
      .select(col(idCol), col(textCol),
        TextAnalysis.gopherReport(col(textCol), minWords = minWords,
          minDistinctStopwords = minDistinctStopwords).as("__g"))
      .where(col("__g.keep"))
      .select(col(idCol), col(textCol))
    val flagged = Decontamination.contaminationScores(kept, bench, idCol,
        textCol, contaminationN)
      .select(col(idCol))
    val clean = kept.join(broadcast(flagged), Seq(idCol), "left_anti")
    val rewritten = Dedup.intraDocChunkDedup(clean, idCol, textCol,
      chunkTokens)
    Dedup.exactDedup(rewritten, idCol, "dedup_text")
  }

  /** The complete corpus-production run: [[curate]] (quality →
    * decontamination → exact dedup) followed by MinHash-LSH near-dup
    * collapse over the survivors ([[Dedup.nearDupPipeline]]) — every
    * stage of what actually ships to training, in one composed plan.
    *
    * Scale shape: curate's single corpus shuffle, then the near-dup
    * pipeline's (band, key) shuffle + O(log n) connected-component
    * rounds over the (much smaller) pair graph. Nothing quadratic;
    * the eval side broadcasts.
    *
    * @return surviving document ids
    */
  def curateAndDedup(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minTokens: Int = 20,
      maxDupGramFraction: Double = 0.2, contaminationN: Int = 8,
      threshold: Double = 0.9, numHashes: Int = 16, bands: Int = 8,
      md5Basis: Boolean = false): DataFrame = {
    // The survivor ID SET is persisted eagerly (ids only — node-sized,
    // spillable) so the expensive curation chain (gram-stats quality
    // kernel, decontamination, exact dedup) runs ONCE: the near-dup
    // stages below reference the curated frame several times, and
    // without the cache each reference replayed the whole chain
    // (measured: 4 gram-stats evaluations / 4 corpus scans in q71's
    // plan, zero exchange reuse). Spark's ContextCleaner unpersists it
    // once the returned frame is unreachable (the clusterLabels
    // discipline).
    val kept = curate(corpus, bench, idCol, textCol, minTokens,
      maxDupGramFraction, contaminationN).select(col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    kept.count() // materialize before the multi-consumer fan-out
    val withText = corpus.select(col(idCol), col(textCol))
      .join(kept, Seq(idCol))
    // curate() already exact-deduped, so go straight to the near-dup
    // stages instead of nearDupPipeline (whose leading exactDedup would
    // re-shuffle the surviving corpus for a guaranteed no-op)
    val pairs = Dedup.minhashNearDups(withText, idCol, textCol, threshold,
      numHashes, bands, md5Basis)
    Dedup.collapseNearDups(withText, idCol, pairs)
      .select(col(idCol))
  }

  /** C4-style blocklist gate: drop documents whose blocklisted-token
    * count exceeds `maxHits` (C4 drops on ANY hit → `maxHits = 0`).
    * Token-exact matching (the C4 rule), not substring — "assess" never
    * trips an "ass" entry. The word set is a plan literal evaluated
    * inside the scan's codegen stage: zero shuffles, zero joins.
    */
  def blocklistFilter(corpus: DataFrame, textCol: String,
      words: Seq[String], maxHits: Int = 0): DataFrame =
    corpus.where(
      TextAnalysis.wordSetCount(lower(col(textCol)), words) <= maxHits)

  /** Per-source audit of a blocklist gate BEFORE committing it: document
    * counts, flagged counts, total blocklisted-token hits, and the
    * keep-rate per source — the table that shows a gate nuking one
    * source while leaving others untouched. One aggregation pass over
    * the narrow per-document hit counts.
    */
  def blocklistReport(corpus: DataFrame, sourceCol: String,
      textCol: String, words: Seq[String], maxHits: Int = 0): DataFrame = {
    val hits = TextAnalysis.wordSetCount(lower(col(textCol)), words)
    corpus
      .select(col(sourceCol), hits.cast("long").as("__hits"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__hits") > maxHits, 1L).otherwise(0L))
          .as("n_flagged"),
        sum(col("__hits")).as("total_hits"))
      .withColumn("keep_rate",
        (col("n_docs") - col("n_flagged")).cast("double") / col("n_docs"))
  }
}
