package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.agg.Statistics
import graft.ops.{Decontamination, Dedup, TextAnalysis}

/** Text-analysis + deduplication operators over the `documents` table —
  * the training-data-pipeline surface (builder brief + SURVEY.md §7.5).
  *
  * Oracle-checked queries mirror the exact expression semantics in DuckDB
  * (tokenize = regex-split on spaces, integer-division ratios); the
  * LSH-based ones are Spark-only (rows-only check) because banding isn't
  * reasonably expressible in SQL.
  */
object TextQueries {

  /** Token/char statistics per language (tokenize + grouped agg). */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"lang", TextAnalysis.tokenCount($"text").as("n_tokens"), $"n_chars")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum($"n_tokens").cast("double") / count(lit(1))).as("avg_tokens"),
        sum($"n_chars").as("sum_chars"),
        max($"n_tokens").as("max_tokens"))
      .orderBy($"lang")
  }

  /** Per-document quality metrics: diversity, stopword ratio, token length. */
  private def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        TextAnalysis.tokenCount($"text").as("n_tokens"),
        TextAnalysis.distinctTokenRatio($"text").as("distinct_ratio"),
        TextAnalysis.wordSetRatio($"text", TextAnalysis.englishStopwords).as("stop_ratio"),
        TextAnalysis.avgTokenLength($"text").as("avg_token_len"))
      .orderBy($"doc_id")
  }

  /** Language-ID heuristic: marker-word argmax with deterministic ties. */
  private def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id", $"lang",
        TextAnalysis.langScore($"text", "en").as("s_en"),
        TextAnalysis.langScore($"text", "de").as("s_de"),
        TextAnalysis.langId($"text").as("pred_lang"))
      .orderBy($"doc_id")
  }

  /** Content fingerprints: portable md5 + order-sensitive rolling hash
    * (rolling hash is Spark-only, not in the oracle column set — see
    * oracle: it selects the same doc_id/md5 columns).
    */
  private def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", TextAnalysis.contentFingerprint($"text").as("fingerprint"))
      .orderBy($"doc_id")
  }

  /** Exact 3-gram Jaccard between consecutive doc pairs (shingle algebra
    * checkable in SQL; the building block of MinHash verification).
    */
  private def q25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val a = d.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = d.select(($"doc_id" - 1).as("id_a"), $"doc_id".as("id_b"), $"sh".as("sh_b"))
    a.join(b, Seq("id_a"))
      .select($"id_a", $"id_b", Dedup.jaccard($"sh_a", $"sh_b").as("jaccard_3gram"))
      .orderBy($"id_a")
  }

  /** Exact blocked near-dup ground truth: same-lang pairs with token-set
    * Jaccard ≥ 0.95 (oracle-checked; the MinHash query approximates this).
    */
  private def q26(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.blockedJaccardPairs(Tables.documents(s, dir),
        "doc_id", "text", "lang", 0.95)
      .orderBy($"idA", $"idB")
  }

  /** MinHash-LSH near-dup candidates, Jaccard-verified. md5 basis: the
    * oracle rebuilds the identical 64-hash signatures and band slices,
    * so the exact LSH candidate set — recall < 1 and all — is
    * hash-checked (the q52 technique at q27's own 64/4 geometry). The
    * xxh64 production basis stays covered by q52b/q67b and the bench
    * scale profile.
    */
  private def q27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.minhashNearDups(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.95, numHashes = 64, bands = 4, md5Basis = true)
      .orderBy($"idA", $"idB")
  }

  /** SimHash near-dups within language blocks. md5 basis makes the
    * fingerprints DuckDB-reproducible, and the blocked variant is exact
    * within blocks (no banding recall gap), so the oracle is simply all
    * same-lang pairs at Hamming ≤ 12.
    */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.simhashNearDups(Tables.documents(s, dir), "doc_id", "text",
        "lang", maxBits = 12, md5Basis = true)
      .orderBy($"idA", $"idB")
  }

  /** Exact dedup survivor set (deterministic lowest-id survivor). */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** q29 on the canonical text form: case/punctuation/spacing variants
    * collapse to one survivor. Both normalization regexes are
    * RE2-compatible, so DuckDB rebuilds the identical canonical forms.
    */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.normalizedDedup(Tables.documents(s, dir), "doc_id", "text")
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Whitespace token counts, punctuation ratio and the composite quality
    * score — RE2-expressible, hash-checked against DuckDB.
    */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        TextAnalysis.tokenCount($"text").as("n_ws_tokens"),
        TextAnalysis.punctRatio($"text").as("punct_ratio"),
        TextAnalysis.qualityScore($"text").as("quality"))
      .orderBy($"doc_id")
  }

  /** BPE-ish tokenization + order-sensitive rolling fingerprint
    * (Spark-only: the tokenizer regex uses lookarounds, which DuckDB's
    * RE2 lacks, and the rolling hash chains xxhash64 — rows-only check;
    * determinism is pinned by OpsSpec/KernelProps instead).
    */
  private def q44b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        size(TextAnalysis.bpeTokens($"text")).as("n_bpe_tokens"),
        TextAnalysis.rollingFingerprint($"text").as("rolling_fp"))
      .orderBy($"doc_id")
  }

  /** Near-dup cluster labels: connected components over the exact
    * blocked pairs (q26's output) via min-label propagation, checked
    * against DuckDB's recursive-CTE transitive closure.
    */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Dedup.blockedJaccardPairs(Tables.documents(s, dir),
      "doc_id", "text", "lang", 0.95)
    Dedup.clusterLabels(pairs)
      .orderBy($"id")
  }

  /** PII redaction over the corpus, fingerprinted (md5 keeps the result
    * compact; equality proves both engines agree on every byte of the
    * redacted text).
    */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        md5(TextAnalysis.redact($"text")).as("redacted_md5"),
        (TextAnalysis.redact($"text") =!= $"text").as("was_redacted"))
      .orderBy($"doc_id")
  }

  /** The banded-SimHash scale plan, hash-checked: with md5 token hashes
    * the fingerprints are DuckDB-reproducible, and with maxBits (3) <
    * bands (4) the banding is provably COMPLETE (pigeonhole: ≤3 flipped
    * bits can't touch all 4 bands), so the oracle is simply all pairs at
    * Hamming ≤ 3 — yet the Spark plan is the real one: banded
    * (band, key) shuffle, windowed bucket cap, Hamming verification.
    */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.simhashNearDupsBanded(Tables.documents(s, dir), "doc_id", "text",
        maxBits = 3, bands = 4, md5Basis = true)
      .orderBy($"idA", $"idB")
  }

  /** End-to-end dedup pipeline (the operation an LLM-data user actually
    * runs): MinHash-LSH pairs → Jaccard verify → connected-component
    * collapse → survivor ids. md5 basis makes every stage — signatures,
    * band keys, candidates, verification, closure — reproducible in the
    * oracle's SQL (recursive CTE for the closure, as q48 established).
    *
    * Banding: 4 bands × 4 rows, NOT 8 × 2 — at a tight threshold (0.9)
    * r=2 collides random J≈0.3 pairs with ~53% probability, so half of
    * all cross pairs reached Jaccard verification (measured: the
    * composed pipelines were verification-bound, and the xxh64 twin ran
    * no faster than md5 because signatures weren't the cost). r=4 cuts
    * the J=0.3 collision rate to ~3% with ≥98.6% per-pair recall at the
    * threshold.
    */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.nearDupPipeline(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.9, numHashes = 16, bands = 4, md5Basis = true)
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  /** q52's pipeline with the QUALITY-weighted survivor rule
    * ([[graft.ops.Dedup.collapseNearDupsBy]]): each near-dup cluster
    * keeps its highest-quality member (ties to the lowest id) instead of
    * the lowest id — the rule production dedup actually ships. The
    * whole chain (md5-MinHash bands → Jaccard verify → recursive
    * closure → per-cluster argmax by quality) is hash-checked, quality
    * doubles included (bit-exact cross-engine per q63/q85).
    */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", $"text", $"lang",
        graft.ops.TextAnalysis.qualityScore($"text").as("quality"))
    val repr = Dedup.exactDedup(docs, "doc_id", "text")
    val pairs = Dedup.minhashNearDups(repr, "doc_id", "text",
      threshold = 0.9, numHashes = 16, bands = 4, md5Basis = true)
    Dedup.collapseNearDupsBy(repr, "doc_id", pairs, "quality")
      .select($"doc_id", $"lang", $"quality")
      .orderBy($"doc_id")
  }

  /** Cross-source duplication audit: verified near-dup links between
    * every pair of `source` values — "how much of source B is already
    * in source A", the question answered before paying to ingest a new
    * source. q52's exact banding geometry on the md5 basis, so the
    * oracle rebuilds the identical candidate set and the full matrix is
    * hash-checked.
    */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.crossGroupNearDupMatrix(Tables.documents(s, dir), "doc_id",
        "text", "source", threshold = 0.9, numHashes = 16, bands = 4,
        md5Basis = true)
      .orderBy($"source_a", $"source_b")
  }

  /** Per-source novelty rates — q94's matrix reduced to the decision
    * scalar: what fraction of each source is new relative to every
    * other source. Integer counts + one exact int-division double, all
    * hash-checked.
    */
  private def q95(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.groupNoveltyRates(Tables.documents(s, dir), "doc_id", "text",
        "source", threshold = 0.9, numHashes = 16, bands = 4,
        md5Basis = true)
      .orderBy($"source")
  }

  /** Duplicate-cluster size profile: the near-dup cluster histogram
    * (cluster size → how many clusters) plus singleton count — the
    * operational dashboard a dedup run reads to size its bucket caps
    * (the knob CapMetrics guards) and detect mass-duplication events.
    */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val repr = Dedup.exactDedup(docs, "doc_id", "text")
    val pairs = Dedup.minhashNearDups(repr, "doc_id", "text",
      threshold = 0.9, numHashes = 16, bands = 4, md5Basis = true)
    val clustered = Dedup.clusterLabels(pairs)
      .groupBy($"label").agg(count(lit(1)).as("cluster_size"))
    val total = repr.agg(count(lit(1)).as("__n"))
    val histogram = clustered.groupBy($"cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
    // singletons = docs never seen in any pair (their own cluster of 1)
    val inClusters = clustered.agg(
      coalesce(sum($"cluster_size"), lit(0L)).as("__in"))
    histogram
      .unionByName(total.crossJoin(inClusters)
        .select(lit(1L).as("cluster_size"),
          ($"__n" - $"__in").as("n_clusters")))
      .groupBy($"cluster_size")
      .agg(sum($"n_clusters").as("n_clusters"))
      .orderBy($"cluster_size")
  }

  /** PRODUCTION-BASIS twin of q52: identical plan, xxh64 MinHash + bare
    * long band keys (the basis a 100 TB run uses — the md5 basis exists
    * only so DuckDB can rebuild the band keys). Rows-only check (q52
    * hash-checks the plan; this entry makes the headline bench measure
    * the path that actually ships).
    */
  private def q52b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.nearDupPipeline(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.9, numHashes = 16, bands = 4, md5Basis = false)
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  /** Benchmark decontamination: corpus docs sharing 3-gram shingles with
    * the held-out eval slice (doc_id ≡ 0 mod 97). 3-grams because the
    * synthetic corpus is too short for the production 8–13-gram windows;
    * the plan (broadcast bench shingle set, narrow corpus scan, one
    * doc-id aggregate) is the one that runs at 100 TB.
    */
  private def q56(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Decontamination.contaminationScores(
        docs.where($"doc_id" % 97 =!= 0),
        docs.where($"doc_id" % 97 === 0),
        "doc_id", "text", n = 3)
      .orderBy($"doc_id")
  }

  /** Verbatim leak check: documents containing a benchmark doc's exact
    * 40-char span — the strictest contamination form, catching pasted
    * eval strings that shingle overlap under-reports below the window
    * length. HEADLINE = the Aho-Corasick basis ([[Decontamination
    * .verbatimMatchesMulti]]): the needle set compiles once into a
    * broadcast automaton and each document is ONE linear pass —
    * O(text + matches) — because the needle set grows with the eval
    * suite and the per-needle `contains` form is O(needles × text)
    * per document (measured 34× slower at sf1, 14× growth vs 3.5×).
    * The contains form stays as the oracle-proving twin q106b — both
    * share this query's SQL, so the bases are proven bit-identical
    * every round.
    */
  private def q106(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val needles = docs.where($"doc_id" % 11 === 0)
      .select(substring($"text", 10, 40).as("needle"))
    Decontamination.verbatimMatchesMulti(docs, needles, "doc_id", "text",
        "needle", minChars = 20)
      .orderBy($"doc_id", $"needle")
  }

  /** Span-level decontamination surgery over q106's needle set: every
    * pasted eval span collapses to one space, documents survive. The
    * replace fold is pinned longest-first/lexicographic, so the rebuilt
    * text hash-checks cross-engine.
    */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val needles = docs.where($"doc_id" % 11 === 0)
      .select(substring($"text", 10, 40).as("needle"))
    Decontamination.redactVerbatim(docs, needles, "doc_id", "text",
        "needle", minChars = 20)
      .orderBy($"doc_id")
  }

  /** q106's oracle-proving twin on the per-needle `contains` basis
    * ([[Decontamination.verbatimMatches]] — the broadcast nested-loop
    * join whose semantics DuckDB can state directly as `position(needle
    * IN text) > 0`). The needle slice is FIXED at the first 500 doc ids
    * (r15, the r13-verdict cap): a proof twin needs a representative
    * needle set, not one growing with the corpus — uncapped, this
    * O(needles × text) form was the suite's top bench cost at sf0.1
    * (2.57 s, 454 needles) and the documented sf1 scale-killer (33.9 s
    * vs 1.0 s, 14× growth). Every oracle-gate scale factor has doc ids
    * < 500, so the cap is a no-op there (byte-identical results,
    * verified sf0.001/sf0.01) and the automaton/contains bit-identity
    * proof is unchanged at oracle scale; q106b's oracle SQL states the
    * same cap. The AC headline q106 deliberately keeps the UNCAPPED,
    * corpus-growing needle set — scaling that is the automaton's job.
    */
  private def q106b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val needles = docs.where($"doc_id" % 11 === 0 && $"doc_id" < 500)
      .select(substring($"text", 10, 40).as("needle"))
    Decontamination.verbatimMatches(docs, needles, "doc_id", "text",
        "needle", minChars = 20)
      .orderBy($"doc_id", $"needle")
  }

  /** Train/test split leakage audit: deterministic 90/10 md5 split,
    * then every test document's 3-gram shingle overlap with the TRAIN
    * split — the big-to-big decontamination shape (neither side
    * broadcasts; the match is a shuffle equi-join on the shingle).
    */
  private def q91(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Decontamination.splitLeakage(Tables.documents(s, dir), "doc_id", "text",
        testFraction = 0.1, salt = "split", n = 3)
      .orderBy($"doc_id")
  }

  /** Gopher-style n-gram repetition quality signals, computed by the
    * one-pass graft_gram_stats kernel (narrow — no per-gram shuffle).
    */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g2 = TextAnalysis.gramStats($"text", 2)
    Tables.documents(s, dir)
      // the oracle's inner join of 2-gram and 3-gram aggregates drops
      // docs with no 3-gram; match that here (Spark would otherwise emit
      // null fractions for <3-token docs and break the gate on corpora
      // that contain them)
      .where(TextAnalysis.tokenCount($"text") >= 3)
      .select($"doc_id",
        element_at(g2, 1).as("n_2grams"),
        element_at(g2, 2).as("top_2gram_count"),
        element_at(g2, 3).as("dup_2gram_count"),
        TextAnalysis.topGramFraction($"text", 2).as("top_2gram_frac"),
        TextAnalysis.dupGramFraction($"text", 3).as("dup_3gram_frac"))
      .orderBy($"doc_id")
  }

  /** Chunk-level exact substring dedup with document reassembly (the
    * chunked Lee-et-al.-style span dedup an LLM-data pipeline runs after
    * doc-level dedup). Hash-checked end to end including the rebuilt
    * text.
    */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.chunkDedup(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 20)
      .orderBy($"doc_id")
  }

  /** Per-source corpus datasheet (the release "data card" table):
    * volumes, exact in-source duplicate counts, dominant language and
    * the DECIMAL-summed quality score. Quality doubles are q22's
    * proven cross-engine-identical integer-ratio basis, quantized
    * before the exact sum — the whole row hash-checks.
    */
  private def q118(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Statistics.corpusDatasheet(Tables.documents(s, dir), "text", "source",
        "lang")
      // quantized DECIMAL(38,6) internally (layout-independent exact
      // sum); DOUBLE at the gated boundary — the cast of the same exact
      // decimal rounds identically on both engines, and DECIMAL output
      // doesn't hash-digest (round-6 finding)
      .withColumn("quality_sum", col("quality_sum").cast("double"))
      .orderBy($"source")
  }

  /** The Gopher-shape curation pipeline in one plan: rule-battery
    * admission (word count ≥ 50, stop-word ≥ 1 — both bite) →
    * 3-gram decontamination vs the doc_id ≡ 0 (mod 97) slice →
    * intra-doc 2-token span cleanup (text REWRITTEN) → exact dedup on
    * the cleaned text. Every stage individually verified by
    * q113/q56/q110/q29; the composition is hash-checked here including
    * the rebuilt text.
    */
  private def q117(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    graft.ops.Curation.curateGopher(
        docs.where($"doc_id" % 97 =!= 0),
        docs.where($"doc_id" % 97 === 0),
        "doc_id", "text", minWords = 50, minDistinctStopwords = 1,
        contaminationN = 3, chunkTokens = 2)
      .orderBy($"doc_id")
  }

  /** Shared-lede detection: groups of documents with identical first-5
    * tokens (syndication pattern) — 23 groups at sf0.01, one
    * bounded-key groupBy shuffle.
    */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.prefixDupGroups(Tables.documents(s, dir), "doc_id", "text", k = 5)
      .orderBy($"prefix")
  }

  /** Per-source boilerplate detection: 2-gram shingles present in ≥ 20%
    * of a source's documents (the scraper-template signal). One distinct
    * (source, shingle, doc) shuffle; totals broadcast; report-sized
    * output (220 rows at sf0.01). Exact counts + integer-ratio doubles.
    */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.boilerplateShingles(Tables.documents(s, dir), "doc_id", "text",
        "source", n = 2, minFraction = 0.2)
      .orderBy($"source", $"shingle")
  }

  /** The Gopher rule battery (Rae et al. 2021 A1.1) per document:
    * word-count / mean-word-length bounds, symbol ratio, alphabetic-word
    * fraction, stop-word presence, and the composite keep decision.
    * Paper thresholds except `minDistinctStopwords = 1` (the synthetic
    * vocabulary contains only "the" from Gopher's list); the word-count
    * and stop-word rules both bite at sf0.01. Entirely integer counts
    * and integer-ratio doubles — the whole report hash-checks.
    */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        TextAnalysis.gopherReport($"text", minDistinctStopwords = 1).as("g"))
      .select($"doc_id", $"g.n_words", $"g.mean_word_len", $"g.symbol_ratio",
        $"g.alpha_word_frac", $"g.n_stop_distinct", $"g.keep")
      .orderBy($"doc_id")
  }

  /** Corpus-level phrasing overlap between every source pair: exact
    * Jaccard of the sources' distinct 3-gram shingle sets — the
    * corpus-vs-corpus redundancy number behind mixture design (q94/q95
    * count per-document near-dup links; this measures wholesale content
    * sharing). One (shingle, source) shuffle; report-sized thereafter.
    */
  private def q112(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.groupContentOverlap(Tables.documents(s, dir), "text", "source",
        shingleN = Some(3))
      .orderBy($"source_a", $"source_b")
  }

  /** WITHIN-document repetition removal (Gopher/C4 intra-doc cleanup):
    * 2-token spans repeated inside one document are dropped, first
    * occurrence kept, text reassembled — a ZERO-shuffle narrow plan.
    * 2-token spans so the operator provably bites on this corpus
    * (~1.8% of spans removed at sf0.01); hash-checked end to end
    * including the rebuilt text.
    */
  private def q110(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.intraDocChunkDedup(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 2)
      .orderBy($"doc_id")
  }

  /** Context-window chunking: 6-token chunks with 2-token overlap
    * (stride 4) — every chunk boundary, slice, and per-chunk token
    * count hash-checked.
    */
  private def q84(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextAnalysis.chunkBySize(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 6, overlapTokens = 2)
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** The full curation pipeline as one job: quality thresholds →
    * decontamination (vs the doc_id ≡ 0 mod 97 eval slice) → exact
    * dedup. The composed operation an LLM-data user actually ships;
    * every stage is individually verified by q22/q56/q57/q29 and the
    * composition is hash-checked here.
    */
  private def q59(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    graft.ops.Curation.curate(
        docs.where($"doc_id" % 97 =!= 0),
        docs.where($"doc_id" % 97 === 0),
        "doc_id", "text", minTokens = 20, maxDupGramFraction = 0.2,
        contaminationN = 3)
      .orderBy($"doc_id")
  }

  /** The complete corpus-production run in ONE plan: quality thresholds
    * → decontamination → exact dedup → MinHash-LSH near-dup collapse.
    * q59 verifies the curation half and q52 the near-dup half; this
    * verifies their composition — the query a training-data team ships.
    */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    graft.ops.Curation.curateAndDedup(
        docs.where($"doc_id" % 97 =!= 0),
        docs.where($"doc_id" % 97 === 0),
        "doc_id", "text", minTokens = 20, maxDupGramFraction = 0.2,
        contaminationN = 3, threshold = 0.9, numHashes = 16, bands = 4,
        md5Basis = true)
      .orderBy($"doc_id")
  }

  /** PRODUCTION-BASIS twin of q71 (xxh64 MinHash, bare long band keys) —
    * rows-only, see q52b.
    */
  private def q71b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    graft.ops.Curation.curateAndDedup(
        docs.where($"doc_id" % 97 =!= 0),
        docs.where($"doc_id" % 97 === 0),
        "doc_id", "text", minTokens = 20, maxDupGramFraction = 0.2,
        contaminationN = 3, threshold = 0.9, numHashes = 16, bands = 4,
        md5Basis = false)
      .orderBy($"doc_id")
  }

  /** Per-language distribution drift vs the corpus: exact total
    * variation distance over hashed n-gram features — the ingest
    * monitor that flags a drifting source. The decimal `l1_num` makes
    * the distance layout-independent and hash-gateable (no float sums).
    */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextAnalysis.distributionDrift(Tables.documents(s, dir),
        "lang", "text", buckets = 10000)
      // DECIMAL internally (exact L1 numerator); BIGINT at the gated
      // boundary (round-6: DECIMAL output doesn't hash-digest). The
      // cast is gate-only and verify-scale-safe; the op's DECIMAL
      // output remains the production API — at corpus scale the value
      // can exceed Long range, where Spark's cast nulls and DuckDB's
      // raises.
      .withColumn("l1_num", col("l1_num").cast("long"))
      .orderBy($"lang")
  }

  /** Shingle-containment pairs: the quotation/subset pattern symmetric
    * Jaccard misses. Exact shared-shingle counts; the shingle-frequency
    * cap (max observed frequency at sf0.01 is single-digit) cannot
    * trigger, so the uncapped oracle is exact.
    */
  private def q127(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, minContainment = 0.5)
      .orderBy($"idA", $"idB")
  }

  /** LSH banding-geometry audit at q27's own 64/4 md5 basis: recall of
    * the banded detector against the exact all-pairs Jaccard truth,
    * plus candidate efficiency — the "measure, don't guess" scalar for
    * the banding config. Quadratic truth is the audit's documented
    * cost; at corpus scale it runs on a hash-sample.
    */
  private def q128(s: SparkSession, dir: String): DataFrame =
    Dedup.lshRecallAudit(Tables.documents(s, dir), "doc_id", "text",
      threshold = 0.95, numHashes = 64, bands = 4, md5Basis = true)

  /** Language-ID confusion matrix: declared `lang` vs the q23 heuristic
    * prediction with exact per-language shares — the metadata-trust
    * audit for language-filtered mixes.
    */
  private def q129(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextAnalysis.langConfusion(Tables.documents(s, dir), "lang", "text")
      .orderBy($"lang", $"pred_lang")
  }

  /** Per-document duplication density: fraction of each doc's 3-gram
    * shingles shared with any other document — the distribution a
    * curation team reads before choosing dedup strength.
    */
  private def q132(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.dupShingleFraction(Tables.documents(s, dir), "doc_id", "text",
        n = 3)
      .orderBy($"doc_id")
  }

  /** q56's Bloom screen twin at an fpp where no false positive occurs
    * for this corpus (spec-pinned ≡ exact at sf0.001; at any fpp the
    * screen only over-flags — `OpsSpec` stresses fpp = 0.5). Bloom
    * bits are not SQL-expressible, but the filter is DETERMINISTIC
    * (fixed hash seeds, order-independent OR), and at the default fpp
    * the screen's output is value-identical to the exact gate at every
    * verify scale (checked empirically at sf0.01, sf0.1, and the
    * round-8 ScaleData sf1 fixture — `check_oracle.py` hash-PASS on
    * 46,735 rows) — so the EXACT gate's SQL is a valid hash oracle for
    * this query. Re-verify after any testdata regeneration: a new
    * corpus could introduce an FP and flip the gate with no code
    * change (the failure mode is loud — a hash mismatch, not silence).
    */
  private def q135(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Decontamination.contaminationScoresBloom(
        docs.where($"doc_id" % 97 =!= 0),
        docs.where($"doc_id" % 97 === 0),
        "doc_id", "text", n = 3)
      .orderBy($"doc_id")
  }

  /** Any-alignment repeated-substring removal (ExactSubstr shape) at a
    * 5-token window: the 25 duplicate/contained docs guarantee global
    * repeats at sf0.01, so the op provably bites. Rebuilt text is
    * hash-checked byte-exact.
    */
  private def q138(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.exactSubstrDedup(Tables.documents(s, dir), "doc_id", "text",
        k = 5)
      .orderBy($"doc_id")
  }

  /** PRODUCTION-BASIS twin of q138 (xxhash64 window fingerprints — an
    * ~8× cheaper per-position kernel, 8-byte shuffle keys): xxhash64 is
    * not DuckDB-expressible → rows-only; OpsSpec pins result equality
    * with the md5 basis on the test corpus (the q52b discipline).
    */
  private def q138b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.exactSubstrDedup(Tables.documents(s, dir), "doc_id", "text",
        k = 5, md5Basis = false)
      .orderBy($"doc_id")
  }

  /** Referential-integrity audit: per-source fraction of documents with
    * an embedding row (doc_id ↔ vec_id) — the pre-join check that a
    * silent inner-join drop would otherwise hide.
    */
  private def q140(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Statistics.joinCoverage(Tables.documents(s, dir),
        Tables.embeddings(s, dir), "doc_id", "vec_id", "source")
      .orderBy($"source")
  }

  /** Multi-suite decontamination: one corpus pass screened against all
    * five language "suites" (the eval slice grouped by lang) at once,
    * reported per (doc, suite).
    */
  private def q141(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Decontamination.contaminationBySuite(
        docs.where($"doc_id" % 97 =!= 0),
        docs.where($"doc_id" % 97 === 0),
        "doc_id", "text", "lang", n = 3)
      .orderBy($"doc_id", $"suite")
  }

  /** Curation review packet: a deterministic md5 10% sample of the
    * corpus with quality signals, predicted language and corpus-wide
    * duplication density joined per document — the one table a human
    * reviewer opens (every signal is an already-oracled basis: q22's
    * metrics, q23's argmax, q132's density, q54's sample rule).
    */
  private def q143(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val sampled = docs.where(
      graft.ops.Sampling.md5Bucket($"doc_id", "review") < lit(100000L))
    val sigs = sampled.select($"doc_id", $"lang", $"source",
      TextAnalysis.tokenCount($"text").as("n_tokens"),
      TextAnalysis.distinctTokenRatio($"text").as("distinct_ratio"),
      TextAnalysis.wordSetRatio($"text", TextAnalysis.englishStopwords)
        .as("stop_ratio"),
      TextAnalysis.langId($"text").as("pred_lang"))
    sigs
      .join(Dedup.dupShingleFraction(docs, "doc_id", "text", n = 3)
        .select($"doc_id", $"dup_frac"), Seq("doc_id"), "left")
      .orderBy($"doc_id")
  }

  /** Candidate-similarity histogram: verified LSH candidates at a LOW
    * threshold (0.3) bucketed by floor(jaccard·20) — the chart that
    * shows where candidate mass sits and justifies the production
    * threshold (0.95 sits past the background-similarity bulge).
    * floor of identical doubles buckets identically cross-engine.
    */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.minhashNearDups(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.3, numHashes = 64, bands = 4, md5Basis = true)
      .select(floor($"jaccard" * 20).cast("int").as("bucket"),
        $"jaccard")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_pairs"), min($"jaccard").as("min_j"),
        max($"jaccard").as("max_j"))
      .orderBy($"bucket")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q145_jaccard_histogram" -> (q145 _),
    "q143_review_packet" -> (q143 _),
    "q140_embedding_coverage" -> (q140 _),
    "q141_multi_suite_decontam" -> (q141 _),
    "q138_exact_substr" -> (q138 _),
    "q138b_exact_substr_xxh64" -> (q138b _),
    "q135_contamination_bloom" -> (q135 _),
    "q132_dup_density" -> (q132 _),
    "q127_containment_pairs" -> (q127 _),
    "q128_lsh_recall_audit" -> (q128 _),
    "q129_lang_confusion" -> (q129 _),
    "q105_distribution_drift" -> (q105 _),
    "q106_verbatim_leak" -> (q106 _),
    "q106b_verbatim_leak_contains" -> (q106b _),
    "q71_production_pipeline" -> (q71 _),
    "q71b_production_pipeline_xxh64" -> (q71b _),
    "q52b_dedup_pipeline_xxh64" -> (q52b _),
    "q59_curation_pipeline" -> (q59 _),
    "q56_decontaminate" -> (q56 _),
    "q91_split_leakage" -> (q91 _),
    "q57_repetition_stats" -> (q57 _),
    "q58_chunk_dedup" -> (q58 _),
    "q110_intradoc_dedup" -> (q110 _),
    "q112_source_content_overlap" -> (q112 _),
    "q113_gopher_rules" -> (q113 _),
    "q114_boilerplate" -> (q114 _),
    "q116_prefix_dups" -> (q116 _),
    "q117_gopher_pipeline" -> (q117 _),
    "q118_corpus_datasheet" -> (q118 _),
    "q119_verbatim_redact" -> (q119 _),
    "q84_chunking" -> (q84 _),
    "q51_simhash_banded" -> (q51 _),
    "q52_dedup_pipeline" -> (q52 _),
    "q90_quality_dedup" -> (q90 _),
    "q93_cluster_profile" -> (q93 _),
    "q94_source_overlap" -> (q94 _),
    "q95_source_novelty" -> (q95 _),
    "q49_pii_redact" -> (q49 _),
    "q48_neardup_clusters" -> (q48 _),
    "q44_text_extras" -> (q44 _),
    "q44b_text_spark_only" -> (q44b _),
    "q21_token_stats" -> (q21 _),
    "q22_doc_quality" -> (q22 _),
    "q23_lang_id" -> (q23 _),
    "q24_fingerprint" -> (q24 _),
    "q25_ngram_jaccard" -> (q25 _),
    "q26_neardup_exact" -> (q26 _),
    "q27_neardup_minhash" -> (q27 _),
    "q28_neardup_simhash" -> (q28 _),
    "q29_dedup_exact" -> (q29 _),
    "q86_normalized_dedup" -> (q86 _))

  /** The exact decontamination gate's SQL, bound ONCE: it oracles both
    * q56 (the exact gate) and q135 (the Bloom screen, whose validity
    * argument is literally "identical output to the exact gate" — a
    * copy would let a q56 edit silently desynchronize q135's oracle).
    */
  private val ExactDecontamSql =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
      |s AS (SELECT doc_id,
      |        CASE WHEN len(toks) >= 3
      |             THEN list_distinct(list_transform(range(1, len(toks) - 1),
      |                    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
      |             ELSE [] END AS sh
      |      FROM t),
      |bench AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 97 = 0),
      |corp AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g
      |         FROM s WHERE doc_id % 97 <> 0)
      |SELECT c.doc_id,
      |       CAST(max(c.n_sh) AS BIGINT) AS n_shingles,
      |       CAST(count(*) AS BIGINT) AS n_overlap,
      |       CAST(count(*) AS DOUBLE) / max(c.n_sh) AS overlap_frac
      |FROM corp c JOIN bench USING (g)
      |GROUP BY c.doc_id
      |ORDER BY c.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // q127: q25's 3-gram shingle basis; shared counts from the exploded
    // shingle self-join (exact — one row per shared shingle), sizes are
    // distinct-shingle counts, containment a single integer division.
    // The Spark maxDocsPerShingle cap (1000) cannot trigger at sf0.01
    // (max observed shingle doc-frequency is 7).
    "q127_containment_pairs" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |        CASE WHEN len(toks) >= 3
        |             THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |             ELSE [] END AS sgl
        |      FROM t),
        |ex AS (SELECT doc_id, len(sgl) AS n, unnest(sgl) AS sh FROM s),
        |p AS (SELECT a.doc_id AS idA, b.doc_id AS idB,
        |             a.n AS n_a, b.n AS n_b, count(*) AS shared
        |      FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2, 3, 4)
        |SELECT idA, idB, n_a, n_b, shared,
        |       CAST(shared AS DOUBLE) / least(n_a, n_b) AS containment
        |FROM p
        |WHERE CAST(shared AS DOUBLE) / least(n_a, n_b) >= 0.5
        |ORDER BY idA, idB""".stripMargin,
    // q145: q27's md5 MinHash/band CTEs at threshold 0.3, bucketed by
    // floor(j*20) — counts are integers, bucket edges floor identical
    // doubles. Like every minhash oracle, the bucket cap (1000) is not
    // modeled: it provably cannot trigger at the sf0.01 gate (max
    // band-bucket ≈ 500), and DOES trigger at sf0.1 (the bench's
    // lsh_candidates cap_drops), where this histogram intentionally
    // reports the capped production answer, not the uncapped one.
    "q145_jaccard_histogram" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mh AS (SELECT doc_id, j.j AS j,
        |              min(('0x' || substr(md5(j.j || ':' || tok), 1, 15))::BIGINT) AS h
        |       FROM tok, (SELECT unnest(range(0, 64)) AS j) j GROUP BY doc_id, j.j),
        |sig AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |k AS (SELECT doc_id, b.b AS band, list_slice(sig, b.b*16 + 1, b.b*16 + 16) AS key
        |      FROM sig, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |jac AS (SELECT c.idA, c.idB,
        |               CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |                 / len(list_distinct(list_concat(a.toks, b.toks))) AS j
        |        FROM cand c JOIN t a ON a.doc_id = c.idA JOIN t b ON b.doc_id = c.idB),
        |kept AS (SELECT CAST(floor(j * 20) AS INTEGER) AS bucket, j
        |         FROM jac WHERE j >= 0.3)
        |SELECT bucket, count(*) AS n_pairs, min(j) AS min_j, max(j) AS max_j
        |FROM kept
        |GROUP BY bucket
        |ORDER BY bucket""".stripMargin,
    // q143: q54's md5 sample gate + q22's quality columns + q23's
    // argmax + q132's dup-density CTEs, spliced — one review table.
    "q143_review_packet" ->
      """WITH t AS (SELECT doc_id, lang, source, text,
        |             string_split_regex(trim(text), ' +') AS toks
        |           FROM documents
        |           WHERE ('0x' || substr(md5('review:' || doc_id), 1, 15))::BIGINT % 1000000 < 100000),
        |full_t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |        CASE WHEN len(toks) >= 3
        |             THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |             ELSE [] END AS sgl
        |      FROM full_t),
        |ex AS (SELECT doc_id, unnest(sgl) AS sh FROM s),
        |freq AS (SELECT sh, count(*) AS df FROM ex GROUP BY sh),
        |dup AS (SELECT ex.doc_id,
        |               CAST(sum(CASE WHEN freq.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |                 / count(*) AS dup_frac
        |        FROM ex JOIN freq ON ex.sh = freq.sh
        |        GROUP BY ex.doc_id),
        |lid AS (SELECT doc_id,
        |          len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS s_en,
        |          len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS s_de,
        |          len(list_filter(toks, x -> x IN ('el','los','las','y','es'))) AS s_es,
        |          len(list_filter(toks, x -> x IN ('le','les','et','est','une'))) AS s_fr,
        |          len(list_filter(toks, x -> x IN ('的','是','在','了','我'))) AS s_zh
        |        FROM t)
        |SELECT t.doc_id, t.lang, t.source,
        |       len(toks) AS n_tokens,
        |       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio,
        |       CAST(len(list_filter(toks, x -> x IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |       CASE WHEN s_en IS NULL THEN NULL WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |            WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |            WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |            WHEN s_fr >= s_zh THEN 'fr'
        |            ELSE 'zh' END AS pred_lang,
        |       dup.dup_frac
        |FROM t
        |JOIN lid ON lid.doc_id = t.doc_id
        |LEFT JOIN dup ON dup.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // q140: distinct right keys left-joined per document, rolled up by
    // source — integers + one division.
    "q140_embedding_coverage" ->
      """WITH k AS (SELECT DISTINCT vec_id FROM embeddings)
        |SELECT d.source,
        |       count(*) AS n_rows,
        |       CAST(sum(CASE WHEN k.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |       CAST(sum(CASE WHEN k.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        |       CAST(sum(CASE WHEN k.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS coverage
        |FROM documents d LEFT JOIN k ON k.vec_id = d.doc_id
        |GROUP BY d.source
        |ORDER BY d.source""".stripMargin,
    // q141: q56's shingle CTEs with the bench side keyed by suite
    // (lang); one corpus pass, per-(doc, suite) overlap counts.
    "q141_multi_suite_decontam" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |        CASE WHEN len(toks) >= 3
        |             THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |             ELSE [] END AS sh
        |      FROM t),
        |bench AS (SELECT DISTINCT lang AS suite, unnest(sh) AS g
        |          FROM s WHERE doc_id % 97 = 0),
        |corp AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g
        |         FROM s WHERE doc_id % 97 <> 0)
        |SELECT c.doc_id, b.suite,
        |       CAST(max(c.n_sh) AS BIGINT) AS n_shingles,
        |       CAST(count(*) AS BIGINT) AS n_overlap,
        |       CAST(count(*) AS DOUBLE) / max(c.n_sh) AS overlap_frac
        |FROM corp c JOIN bench b USING (g)
        |GROUP BY c.doc_id, b.suite
        |ORDER BY c.doc_id, b.suite""".stripMargin,
    // q138: per-position 5-token window md5s, global first occurrence
    // by (doc_id, pos), covered token indices dropped, text rebuilt.
    // Both engines hash the identical space-joined window string, so
    // collisions (if any) merge the same groups. The default
    // fingerprint-group cap is STATED in the SQL (cnt <= cap — groups
    // past it drop whole), so the oracle proves the capped semantics
    // against an independent engine rather than relying on the cap
    // never binding at verify scale.
    "q138_exact_substr" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |g AS (SELECT doc_id, i AS pos,
        |             md5(array_to_string(list_slice(toks, i, i + 4), ' ')) AS h
        |      FROM (SELECT doc_id, toks,
        |                   unnest(range(1, greatest(len(toks) - 5 + 2, 1))) AS i
        |            FROM t)),
        |d AS (SELECT doc_id, pos FROM (
        |        SELECT doc_id, pos,
        |               row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
        |               count(*) OVER (PARTITION BY h) AS cnt
        |        FROM g)
        |      WHERE rn > 1 AND cnt <= ${Dedup.DefaultExactSubstrMaxGroup}),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS ti FROM d),
        |cs AS (SELECT doc_id, list(ti) AS cv FROM cov GROUP BY doc_id)
        |SELECT t.doc_id,
        |       CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(len(cv), 0) AS BIGINT) AS n_removed,
        |       coalesce(array_to_string(
        |         [toks[x] FOR x IN range(1, len(toks) + 1)
        |          IF cv IS NULL OR NOT list_contains(cv, x)], ' '), '') AS clean_text
        |FROM t LEFT JOIN cs ON cs.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // q132: q25's shingle basis → per-shingle doc frequency → per-doc
    // shared-shingle counts; dup_frac is one division of exact integers.
    "q132_dup_density" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |        CASE WHEN len(toks) >= 3
        |             THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |             ELSE [] END AS sgl
        |      FROM t),
        |ex AS (SELECT doc_id, unnest(sgl) AS sh FROM s),
        |freq AS (SELECT sh, count(*) AS df FROM ex GROUP BY sh)
        |SELECT ex.doc_id,
        |       count(*) AS n_shingles,
        |       CAST(sum(CASE WHEN freq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |       CAST(sum(CASE WHEN freq.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS dup_frac
        |FROM ex JOIN freq ON ex.sh = freq.sh
        |GROUP BY ex.doc_id
        |ORDER BY ex.doc_id""".stripMargin,
    // q128: q27's md5 MinHash/band CTEs give the candidate set; the
    // exact all-pairs Jaccard CTE gives the truth; detected =
    // candidates verified >= threshold. Counts are integers, the two
    // rates single divisions.
    "q128_lsh_recall_audit" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mh AS (SELECT doc_id, j.j AS j,
        |              min(('0x' || substr(md5(j.j || ':' || tok), 1, 15))::BIGINT) AS h
        |       FROM tok, (SELECT unnest(range(0, 64)) AS j) j GROUP BY doc_id, j.j),
        |sig AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |k AS (SELECT doc_id, b.b AS band, list_slice(sig, b.b*16 + 1, b.b*16 + 16) AS key
        |      FROM sig, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |jac AS (SELECT a.doc_id AS idA, b.doc_id AS idB,
        |               CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |                 / len(list_distinct(list_concat(a.toks, b.toks))) AS j
        |        FROM t a JOIN t b ON a.doc_id < b.doc_id),
        |agg AS (SELECT
        |  (SELECT count(*) FROM jac WHERE j >= 0.95) AS n_truth,
        |  (SELECT count(*) FROM cand) AS n_candidates,
        |  (SELECT count(*) FROM cand c JOIN jac
        |     ON jac.idA = c.idA AND jac.idB = c.idB WHERE jac.j >= 0.95) AS n_detected)
        |SELECT n_truth, n_candidates, n_detected,
        |       CASE WHEN n_truth = 0 THEN 1.0
        |            ELSE CAST(n_detected AS DOUBLE) / n_truth END AS recall,
        |       CASE WHEN n_candidates = 0 THEN 1.0
        |            ELSE CAST(n_detected AS DOUBLE) / n_candidates END AS candidate_precision
        |FROM agg""".stripMargin,
    // q129: q23's marker-count argmax per document, grouped into the
    // (declared, predicted) matrix; share = cell count / per-declared
    // total, one division of exact integers.
    "q129_lang_confusion" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |        len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS s_en,
        |        len(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |        len(list_filter(toks, t -> t IN ('el','los','las','y','es'))) AS s_es,
        |        len(list_filter(toks, t -> t IN ('le','les','et','est','une'))) AS s_fr,
        |        len(list_filter(toks, t -> t IN ('的','是','在','了','我'))) AS s_zh
        |      FROM t),
        |p AS (SELECT lang,
        |       CASE WHEN s_en IS NULL THEN NULL WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |            WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |            WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |            WHEN s_fr >= s_zh THEN 'fr'
        |            ELSE 'zh' END AS pred_lang
        |      FROM s),
        |cells AS (SELECT lang, pred_lang, count(*) AS n_docs FROM p GROUP BY 1, 2)
        |SELECT lang, pred_lang, n_docs,
        |       CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang) AS share
        |FROM cells
        |ORDER BY lang, pred_lang""".stripMargin,
    // bench spans rebuilt with the same 1-based 40-char substr; match by
    // substring position — both engines compare by character
    "q106_verbatim_leak" ->
      """WITH n AS (SELECT DISTINCT substr(text, 10, 40) AS needle
        |           FROM documents
        |           WHERE doc_id % 11 = 0 AND length(substr(text, 10, 40)) >= 20)
        |SELECT d.doc_id, n.needle
        |FROM documents d JOIN n ON position(n.needle IN d.text) > 0
        |ORDER BY d.doc_id, n.needle""".stripMargin,
    // the contains path must be BIT-IDENTICAL to the automaton path —
    // q106's oracle plus the fixed needle window (doc_id < 500, r15 cap;
    // a no-op at every oracle-gate scale factor, where all doc ids are
    // < 500 — so the two bases still prove bit-identity there); renamed
    // from q106b_verbatim_leak_ac in round 9 when the bases swapped roles
    "q106b_verbatim_leak_contains" ->
      """WITH n AS (SELECT DISTINCT substr(text, 10, 40) AS needle
        |           FROM documents
        |           WHERE doc_id % 11 = 0 AND doc_id < 500
        |             AND length(substr(text, 10, 40)) >= 20)
        |SELECT d.doc_id, n.needle
        |FROM documents d JOIN n ON position(n.needle IN d.text) > 0
        |ORDER BY d.doc_id, n.needle""".stripMargin,
    // q100's hashed-feature buckets per language + corpus-wide, expanded
    // over every (lang, bucket) pair so missing buckets contribute, with
    // the exact integer L1 numerator summed in DECIMAL
    "q105_distribution_drift" ->
      """WITH ft AS (SELECT lang, string_split_regex(trim(text), ' +') AS toks
        |            FROM documents),
        |u AS (SELECT lang, 'u:' || w AS feat
        |      FROM (SELECT lang, unnest(toks) AS w FROM ft)),
        |b AS (SELECT lang, 'b:' || toks[i] || ' ' || toks[i + 1] AS feat
        |      FROM ft, UNNEST(range(1, len(toks))) AS t(i)),
        |f AS (SELECT lang, ('0x' || substr(md5(feat), 1, 15))::BIGINT % 10000 AS k
        |      FROM (SELECT * FROM u UNION ALL SELECT * FROM b)),
        |pg AS (SELECT lang, k, CAST(count(*) AS BIGINT) AS cg FROM f GROUP BY lang, k),
        |cm AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY k),
        |gt AS (SELECT lang, CAST(sum(cg) AS BIGINT) AS ng FROM pg GROUP BY lang),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cm),
        |x AS (SELECT gt.lang, gt.ng, tot.n, cm.c, COALESCE(pg.cg, 0) AS cg
        |      FROM gt CROSS JOIN cm CROSS JOIN tot
        |      LEFT JOIN pg ON pg.lang = gt.lang AND pg.k = cm.k)
        |SELECT lang, CAST(sum(cg) AS BIGINT) AS n_features,
        |       CAST(sum(abs(CAST(cg AS DECIMAL(19,0)) * n
        |                    - CAST(c AS DECIMAL(19,0)) * ng)) AS BIGINT) AS l1_num,
        |       CAST(CAST(sum(abs(CAST(cg AS DECIMAL(19,0)) * n
        |                         - CAST(c AS DECIMAL(19,0)) * ng)) AS DECIMAL(38,0)) AS DOUBLE)
        |         / (2.0 * ng * n) AS tv
        |FROM x GROUP BY lang, ng, n ORDER BY lang""".stripMargin,
    // q59's curation CTE chain (quality → decontaminate → exact dedup)
    // feeding q52's near-dup pipeline CTE chain (md5-MinHash bands →
    // Jaccard verify → recursive-CTE closure → survivors)
    "q71_production_pipeline" ->
      """WITH RECURSIVE
        |tq AS (SELECT doc_id, text, string_split_regex(trim(text), ' +') AS toks
        |       FROM documents WHERE doc_id % 97 <> 0),
        |g2 AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS gram
        |       FROM tq, UNNEST(range(1, len(toks))) AS u(i)),
        |c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
        |rep AS (SELECT doc_id,
        |          CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) / sum(cnt) AS dup2
        |        FROM c2 GROUP BY doc_id),
        |shAll AS (SELECT doc_id,
        |            CASE WHEN len(toks) >= 3
        |                 THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                        i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |                 ELSE [] END AS sh
        |          FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |                FROM documents)),
        |bench AS (SELECT DISTINCT unnest(sh) AS g FROM shAll WHERE doc_id % 97 = 0),
        |flagged AS (SELECT DISTINCT c.doc_id
        |            FROM (SELECT doc_id, unnest(sh) AS g FROM shAll WHERE doc_id % 97 <> 0) c
        |            JOIN bench USING (g)),
        |filtered AS (SELECT tq.doc_id, tq.text
        |             FROM tq JOIN rep USING (doc_id)
        |             WHERE len(tq.toks) >= 20 AND rep.dup2 <= 0.2
        |               AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = tq.doc_id)),
        |surv0 AS (SELECT doc_id, text FROM (
        |            SELECT doc_id, text,
        |                   row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |            FROM filtered) WHERE rn = 1),
        |t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |      FROM surv0),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mh AS (SELECT doc_id, j.j AS j,
        |              min(('0x' || substr(md5(j.j || ':' || tok), 1, 15))::BIGINT) AS h
        |       FROM tok, (SELECT unnest(range(0, 16)) AS j) j GROUP BY doc_id, j.j),
        |sig AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |k AS (SELECT doc_id, b.b AS band, list_slice(sig, b.b*4 + 1, b.b*4 + 4) AS key
        |      FROM sig, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |p AS (SELECT c.idA, c.idB
        |      FROM cand c JOIN t a ON a.doc_id = c.idA JOIN t b ON b.doc_id = c.idB
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9),
        |e AS (SELECT idA AS src, idB AS dst FROM p UNION ALL SELECT idB, idA FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
        |losers AS (SELECT id FROM (SELECT id, min(r) AS label FROM reach GROUP BY id)
        |           WHERE id <> label)
        |SELECT doc_id FROM surv0
        |WHERE doc_id NOT IN (SELECT id FROM losers)
        |ORDER BY doc_id""".stripMargin,
    "q59_curation_pipeline" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents WHERE doc_id % 97 <> 0),
        |g2 AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS gram
        |       FROM t, UNNEST(range(1, len(toks))) AS u(i)),
        |c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
        |rep AS (SELECT doc_id,
        |          CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) / sum(cnt) AS dup2
        |        FROM c2 GROUP BY doc_id),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(toks) >= 3
        |              THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                     i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |              ELSE [] END AS sh
        |       FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |             FROM documents)),
        |bench AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 97 = 0),
        |flagged AS (SELECT DISTINCT c.doc_id
        |            FROM (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 97 <> 0) c
        |            JOIN bench USING (g)),
        |filtered AS (SELECT t.doc_id, t.text, len(t.toks) AS n_tokens, rep.dup2
        |             FROM t JOIN rep USING (doc_id)
        |             WHERE len(t.toks) >= 20 AND rep.dup2 <= 0.2
        |               AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = t.doc_id)),
        |surv AS (SELECT doc_id, n_tokens, dup2,
        |                row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |         FROM filtered)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, dup2 AS dup_2gram_frac
        |FROM surv WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    // md5 bucket split (Sampling.md5Bucket basis), shingles per split,
    // shuffle equi-join on the shingle, per-test-doc counts
    "q91_split_leakage" ->
      """WITH b AS (SELECT doc_id, text,
        |             ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
        |               % 1000000 AS bucket
        |           FROM documents),
        |s AS (SELECT doc_id, bucket,
        |        CASE WHEN len(toks) >= 3
        |             THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |             ELSE [] END AS sh
        |      FROM (SELECT doc_id, bucket, string_split_regex(trim(text), ' +') AS toks
        |            FROM b)),
        |tr AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE bucket >= 100000),
        |te AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS g FROM s WHERE bucket < 100000)
        |SELECT te.doc_id,
        |       CAST(max(te.n_sh) AS BIGINT) AS n_shingles,
        |       CAST(count(*) AS BIGINT) AS n_overlap,
        |       CAST(count(*) AS DOUBLE) / max(te.n_sh) AS overlap_frac
        |FROM te JOIN tr USING (g)
        |GROUP BY te.doc_id
        |ORDER BY te.doc_id""".stripMargin,
    // q135: the Bloom screen is deterministic and FP-free on this
    // corpus at the default fpp (see q135's scaladoc), so the exact
    // gate's SQL IS its oracle — the shared binding, not a copy.
    "q135_contamination_bloom" -> ExactDecontamSql,
    "q56_decontaminate" -> ExactDecontamSql,
    "q57_repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |g2 AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS gram
        |       FROM t, UNNEST(range(1, len(toks))) AS u(i)),
        |c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
        |a2 AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_2grams,
        |              CAST(max(cnt) AS BIGINT) AS top_2gram_count,
        |              CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_2gram_count
        |       FROM c2 GROUP BY doc_id),
        |g3 AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS gram
        |       FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
        |c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2),
        |a3 AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_3grams,
        |              CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_3gram_count
        |       FROM c3 GROUP BY doc_id)
        |SELECT a2.doc_id, n_2grams, top_2gram_count, dup_2gram_count,
        |       CAST(top_2gram_count AS DOUBLE) / n_2grams AS top_2gram_frac,
        |       CAST(dup_3gram_count AS DOUBLE) / n_3grams AS dup_3gram_frac
        |FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id
        |ORDER BY a2.doc_id""".stripMargin,
    "q86_normalized_dedup" ->
      """WITH n AS (SELECT doc_id, lang, n_chars,
        |             trim(regexp_replace(regexp_replace(lower(text),
        |               '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
        |           FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
        |      FROM n)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q84_chunking" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |        1 + GREATEST(0, (len(toks) - 6 + 3) // 4) AS n_chunks
        |      FROM t)
        |SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |       array_to_string(list_slice(toks, u.i * 4 + 1, u.i * 4 + 6), ' ') AS chunk_text,
        |       CAST(len(list_slice(toks, u.i * 4 + 1, u.i * 4 + 6)) AS BIGINT) AS n_tokens
        |FROM c, UNNEST(range(0, n_chunks)) AS u(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    // the fold runs over ONLY the needles present in the ORIGINAL text
    // (list_filter before list_reduce) — the redactVerbatim semantics
    // pin: a needle materialized by an earlier replacement is not
    // re-matched. list_filter preserves the pinned longest-first order.
    "q119_verbatim_redact" ->
      """WITH n AS (SELECT DISTINCT substr(text, 10, 40) AS needle
        |           FROM documents WHERE doc_id % 11 = 0
        |             AND len(substr(text, 10, 40)) >= 20),
        |a AS (SELECT COALESCE(list(needle ORDER BY len(needle) DESC, needle),
        |               []) AS needles FROM n),
        |m AS (SELECT doc_id, text,
        |        list_filter(needles, x -> contains(text, x)) AS hit
        |      FROM documents CROSS JOIN a)
        |SELECT doc_id,
        |       CAST(len(hit) AS BIGINT) AS n_hits,
        |       list_reduce(list_prepend(text, hit),
        |         (acc, x) -> replace(acc, x, ' ')) AS clean_text,
        |       CAST(len(text) - len(list_reduce(list_prepend(text, hit),
        |         (acc, x) -> replace(acc, x, ' '))) AS BIGINT) AS n_chars_removed
        |FROM m
        |ORDER BY doc_id""".stripMargin,
    "q118_corpus_datasheet" ->
      """WITH t AS (SELECT source, lang, text,
        |             string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |b AS (SELECT source, lang, md5(text) AS fp,
        |        CAST(len(toks) AS BIGINT) AS nt,
        |        CAST(len(text) AS BIGINT) AS nc,
        |        CAST(CASE WHEN toks[1] = '' THEN 0.0 ELSE (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
        |          + (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3
        |          + (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.2 END
        |          AS DECIMAL(25,6)) AS q
        |      FROM t),
        |pf AS (SELECT source, fp, CAST(count(*) AS BIGINT) AS cnt,
        |         sum(nt) AS tk, sum(nc) AS ch, sum(q) AS qs
        |       FROM b GROUP BY 1, 2),
        |ps AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
        |         CAST(sum(tk) AS BIGINT) AS n_tokens,
        |         CAST(sum(ch) AS BIGINT) AS n_chars,
        |         CAST(sum(cnt) - count(*) AS BIGINT) AS n_dup_docs,
        |         CAST(sum(qs) AS DECIMAL(38,6)) AS quality_sum
        |       FROM pf GROUP BY 1),
        |tl AS (SELECT source, lang AS top_lang,
        |         CAST(count(*) AS BIGINT) AS top_lang_docs,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY count(*) DESC, lang) AS rn
        |       FROM t GROUP BY source, lang)
        |SELECT ps.source, n_docs, n_tokens, n_chars, n_dup_docs, top_lang,
        |       top_lang_docs, CAST(quality_sum AS DOUBLE) AS quality_sum,
        |       CAST(quality_sum AS DOUBLE) / n_docs AS mean_quality
        |FROM ps JOIN tl ON tl.source = ps.source AND rn = 1
        |ORDER BY ps.source""".stripMargin,
    // q113's rule CTEs + q56's shingle CTEs + q110's span-cleanup CTEs
    // + q29's window dedup, chained
    "q117_gopher_pipeline" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents WHERE doc_id % 97 <> 0),
        |g AS (SELECT doc_id, toks FROM t
        |      WHERE len(toks) BETWEEN 50 AND 100000
        |        AND CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(toks)
        |              BETWEEN 3.0 AND 10.0
        |        AND CAST((len(text) - len(replace(text, '#', '')))
        |              + (len(text) - len(replace(text, '...', ''))) / 3
        |              + (len(text) - len(replace(text, '…', ''))) AS DOUBLE)
        |              / len(toks) <= 0.1
        |        AND CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
        |              / len(toks) >= 0.8
        |        AND len(list_filter(list_distinct(toks),
        |              w -> w IN ('the','be','to','of','and','that','have','with'))) >= 1),
        |bsh AS (SELECT DISTINCT unnest(CASE WHEN len(toks) >= 3
        |          THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                 i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |          ELSE [] END) AS sh
        |        FROM (SELECT string_split_regex(trim(text), ' +') AS toks
        |              FROM documents WHERE doc_id % 97 = 0)),
        |flag AS (SELECT DISTINCT doc_id
        |         FROM (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
        |                 THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                        i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |                 ELSE [] END) AS sh FROM g) s
        |         JOIN bsh USING (sh)),
        |c AS (SELECT doc_id, toks FROM g
        |      WHERE doc_id NOT IN (SELECT doc_id FROM flag)),
        |ch AS (SELECT doc_id, CAST((len(toks) + 1) // 2 AS BIGINT) AS n_chunks,
        |         [array_to_string(list_slice(toks, i * 2 + 1, i * 2 + 2), ' ')
        |          FOR i IN range(0, CAST((len(toks) + 1) // 2 AS INT))] AS chunks
        |       FROM c),
        |r AS (SELECT doc_id, n_chunks,
        |        list_filter(chunks, (x, i) -> list_position(chunks, x) = i) AS kept
        |      FROM ch),
        |o AS (SELECT doc_id, n_chunks, CAST(len(kept) AS BIGINT) AS n_kept,
        |        array_to_string(kept, ' ') AS dedup_text
        |      FROM r),
        |d AS (SELECT *, row_number() OVER (PARTITION BY dedup_text ORDER BY doc_id) AS rn
        |      FROM o)
        |SELECT doc_id, n_chunks, n_kept, dedup_text FROM d WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q116_prefix_dups" ->
      """WITH p AS (SELECT doc_id,
        |             array_to_string(list_slice(string_split_regex(trim(text), ' +'),
        |               1, 5), ' ') AS prefix
        |           FROM documents)
        |SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS rep_id
        |FROM p GROUP BY prefix HAVING count(*) >= 2
        |ORDER BY prefix""".stripMargin,
    "q114_boilerplate" ->
      """WITH t AS (SELECT source, doc_id, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |sh AS (SELECT DISTINCT source, doc_id, g
        |       FROM (SELECT source, doc_id, unnest(CASE WHEN len(toks) >= 2
        |               THEN list_distinct(list_transform(range(1, len(toks)),
        |                      i -> array_to_string(list_slice(toks, i, i + 1), ' ')))
        |               ELSE [] END) AS g FROM t)),
        |tot AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS tt
        |        FROM t GROUP BY source),
        |c AS (SELECT source, g AS shingle, CAST(count(*) AS BIGINT) AS n_docs
        |      FROM sh GROUP BY 1, 2)
        |SELECT c.source, shingle, n_docs,
        |       CAST(n_docs AS DOUBLE) / tt AS doc_frac
        |FROM c JOIN tot ON c.source = tot.source
        |WHERE CAST(n_docs AS DOUBLE) / tt >= 0.2
        |ORDER BY c.source, shingle""".stripMargin,
    "q113_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id,
        |        CAST(len(toks) AS BIGINT) AS n_words,
        |        CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS mean_word_len,
        |        CAST((len(text) - len(replace(text, '#', '')))
        |          + (len(text) - len(replace(text, '...', ''))) / 3
        |          + (len(text) - len(replace(text, '…', ''))) AS DOUBLE)
        |          / len(toks) AS symbol_ratio,
        |        CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
        |          / len(toks) AS alpha_word_frac,
        |        CAST(len(list_filter(list_distinct(toks),
        |          w -> w IN ('the','be','to','of','and','that','have','with'))) AS BIGINT)
        |          AS n_stop_distinct
        |      FROM t)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
        |       n_stop_distinct,
        |       (n_words BETWEEN 50 AND 100000
        |        AND mean_word_len BETWEEN 3.0 AND 10.0
        |        AND symbol_ratio <= 0.1
        |        AND alpha_word_frac >= 0.8
        |        AND n_stop_distinct >= 1) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "q112_source_content_overlap" ->
      """WITH t AS (SELECT source, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |sh AS (SELECT DISTINCT source, g
        |       FROM (SELECT source, unnest(CASE WHEN len(toks) >= 3
        |               THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                      i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |               ELSE [] END) AS g FROM t)),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY source),
        |inter AS (SELECT a.source AS source_a, b.source AS source_b,
        |            CAST(count(*) AS BIGINT) AS n_common
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
        |          GROUP BY 1, 2)
        |SELECT source_a, source_b, n_common, sa.n AS n_a, sb.n AS n_b,
        |       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
        |FROM inter
        |JOIN sz sa ON sa.source = source_a
        |JOIN sz sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "q110_intradoc_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |        CAST((len(toks) + 1) // 2 AS BIGINT) AS n_chunks,
        |        [array_to_string(list_slice(toks, i * 2 + 1, i * 2 + 2), ' ')
        |         FOR i IN range(0, CAST((len(toks) + 1) // 2 AS INT))] AS chunks
        |      FROM t),
        |k AS (SELECT doc_id, n_chunks,
        |        list_filter(chunks, (x, i) -> list_position(chunks, x) = i) AS kept
        |      FROM c)
        |SELECT doc_id, n_chunks, CAST(len(kept) AS BIGINT) AS n_kept,
        |       array_to_string(kept, ' ') AS dedup_text
        |FROM k ORDER BY doc_id""".stripMargin,
    "q58_chunk_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |        CAST((len(toks) + 19) // 20 AS BIGINT) AS n_chunks,
        |        CAST(u.i AS INT) AS chunk_idx,
        |        array_to_string(list_slice(toks, u.i * 20 + 1, u.i * 20 + 20), ' ') AS chunk
        |      FROM t, UNNEST(range(0, (len(toks) + 19) // 20)) AS u(i)),
        |s AS (SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
        |      FROM c)
        |SELECT doc_id, n_chunks, CAST(count(*) AS BIGINT) AS n_kept,
        |       string_agg(chunk, ' ' ORDER BY chunk_idx) AS dedup_text
        |FROM s WHERE rn = 1
        |GROUP BY doc_id, n_chunks
        |ORDER BY doc_id""".stripMargin,
    "q21_token_stats" ->
      """WITH t AS (SELECT lang, len(string_split_regex(trim(text), ' +')) AS n_tokens, n_chars
        |           FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       max(n_tokens) AS max_tokens
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "q22_doc_quality" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks, text FROM documents)
        |SELECT doc_id,
        |       len(toks) AS n_tokens,
        |       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio,
        |       CAST(len(list_filter(toks, t -> t IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |       CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS avg_token_len
        |FROM t ORDER BY doc_id""".stripMargin,
    "q23_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |        len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS s_en,
        |        len(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |        len(list_filter(toks, t -> t IN ('el','los','las','y','es'))) AS s_es,
        |        len(list_filter(toks, t -> t IN ('le','les','et','est','une'))) AS s_fr,
        |        len(list_filter(toks, t -> t IN ('的','是','在','了','我'))) AS s_zh
        |      FROM t)
        |SELECT doc_id, lang, s_en, s_de,
        |       CASE WHEN s_en IS NULL THEN NULL WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |            WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |            WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |            WHEN s_fr >= s_zh THEN 'fr'
        |            ELSE 'zh' END AS pred_lang
        |FROM s ORDER BY doc_id""".stripMargin,
    "q24_fingerprint" ->
      """SELECT doc_id, md5(text) AS fingerprint FROM documents ORDER BY doc_id""",
    "q25_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |        CASE WHEN len(toks) >= 3
        |             THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
        |             ELSE [] END AS sh
        |      FROM t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard_3gram
        |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin,
    "q26_neardup_exact" ->
      """WITH t AS (SELECT doc_id, lang, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents)
        |SELECT a.doc_id AS idA, b.doc_id AS idB,
        |       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
        |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95
        |ORDER BY idA, idB""".stripMargin,
    "q49_pii_redact" ->
      """WITH r AS (
        |  SELECT doc_id,
        |         regexp_replace(
        |           regexp_replace(
        |             regexp_replace(text,
        |               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |           '\+?\d{10,15}', '<NUM>', 'g') AS red,
        |         text
        |  FROM documents)
        |SELECT doc_id, md5(red) AS redacted_md5, red <> text AS was_redacted
        |FROM r ORDER BY doc_id""".stripMargin,
    "q48_neardup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id, lang, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |p AS (SELECT a.doc_id AS idA, b.doc_id AS idB
        |      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95),
        |e AS (SELECT idA AS src, idB AS dst FROM p UNION ALL SELECT idB, idA FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id)
        |SELECT id, min(r) AS label
        |FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "q29_dedup_exact" ->
      """SELECT doc_id, lang, n_chars
        |FROM (SELECT doc_id, lang, n_chars,
        |             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |      FROM documents)
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q44_text_extras" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents)
        |SELECT doc_id,
        |       len(toks) AS n_ws_tokens,
        |       (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
        |         / length(text) AS punct_ratio,
        |       CASE WHEN toks[1] = '' THEN 0.0 ELSE (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
        |         + (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3
        |         + (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.2 END AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    // q27: rebuild the exact md5 MinHash signatures (64 hashes), band
    // them 4 × 16 on raw signature slices, and verify candidates with
    // token-set Jaccard — byte-for-byte the Spark plan's candidate set,
    // so LSH recall < 1 is replicated, not approximated. (The bucket
    // cap cannot trigger at sf0.01.)
    "q27_neardup_minhash" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mh AS (SELECT doc_id, j.j AS j,
        |              min(('0x' || substr(md5(j.j || ':' || tok), 1, 15))::BIGINT) AS h
        |       FROM tok, (SELECT unnest(range(0, 64)) AS j) j GROUP BY doc_id, j.j),
        |sig AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |k AS (SELECT doc_id, b.b AS band, list_slice(sig, b.b*16 + 1, b.b*16 + 16) AS key
        |      FROM sig, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        |SELECT c.idA, c.idB,
        |       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
        |FROM cand c JOIN t a ON a.doc_id = c.idA JOIN t b ON b.doc_id = c.idB
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95
        |ORDER BY idA, idB""".stripMargin,
    // q28: md5-SimHash fingerprints (q51's CTE chain) compared within
    // language blocks — the blocked variant is exact within blocks, so
    // the oracle is all same-lang pairs at Hamming ≤ 12.
    "q28_neardup_simhash" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM tok),
        |v AS (SELECT doc_id, b.b AS b,
        |             sum(CASE WHEN ((h >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS vote
        |      FROM th, (SELECT unnest(range(0, 64)) AS b) b GROUP BY doc_id, b.b),
        |fp AS (SELECT doc_id,
        |              string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY b DESC) AS bits
        |       FROM v GROUP BY doc_id),
        |fpl AS (SELECT fp.doc_id, fp.bits, d.lang
        |        FROM fp JOIN documents d USING (doc_id)),
        |p AS (SELECT a.doc_id AS idA, b.doc_id AS idB,
        |             CAST(list_sum(list_transform(range(1, 65),
        |               k -> CASE WHEN substr(a.bits, k, 1) = substr(b.bits, k, 1)
        |                         THEN 0 ELSE 1 END)) AS INTEGER) AS hamming
        |      FROM fpl a JOIN fpl b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |SELECT idA, idB, hamming FROM p
        |WHERE hamming <= 12
        |ORDER BY idA, idB""".stripMargin,
    // md5-SimHash fingerprint as a 64-char bitstring (bit 63 first);
    // banding with maxBits < bands is complete, so the oracle is the
    // exact all-pairs Hamming-≤-3 set (the bucket cap cannot trigger at
    // sf0.01: every bucket ≤ total docs < 10000).
    "q51_simhash_banded" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM tok),
        |v AS (SELECT doc_id, b.b AS b,
        |             sum(CASE WHEN ((h >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS vote
        |      FROM th, (SELECT unnest(range(0, 64)) AS b) b GROUP BY doc_id, b.b),
        |fp AS (SELECT doc_id,
        |              string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY b DESC) AS bits
        |       FROM v GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS idA, b.doc_id AS idB,
        |             CAST(list_sum(list_transform(range(1, 65),
        |               k -> CASE WHEN substr(a.bits, k, 1) = substr(b.bits, k, 1)
        |                         THEN 0 ELSE 1 END)) AS INTEGER) AS hamming
        |      FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
        |SELECT idA, idB, hamming FROM p
        |WHERE hamming <= 3
        |ORDER BY idA, idB""".stripMargin,
    // q94: q52's md5 MinHash/banding CTEs → verified pairs → source
    // labels joined on, cross-source filter, unordered-pair normalize,
    // count — the whole duplication matrix is exact integer arithmetic
    "q94_source_overlap" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mh AS (SELECT doc_id, j.j AS j,
        |              min(('0x' || substr(md5(j.j || ':' || tok), 1, 15))::BIGINT) AS h
        |       FROM tok, (SELECT unnest(range(0, 16)) AS j) j GROUP BY doc_id, j.j),
        |sig AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |k AS (SELECT doc_id, b.b AS band, list_slice(sig, b.b*4 + 1, b.b*4 + 4) AS key
        |      FROM sig, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |p AS (SELECT c.idA, c.idB
        |      FROM cand c JOIN t a ON a.doc_id = c.idA JOIN t b ON b.doc_id = c.idB
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9)
        |SELECT least(da.source, db.source) AS source_a,
        |       greatest(da.source, db.source) AS source_b,
        |       CAST(count(*) AS BIGINT) AS n_links
        |FROM p JOIN documents da ON da.doc_id = p.idA
        |       JOIN documents db ON db.doc_id = p.idB
        |WHERE da.source <> db.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q95: q94's pair CTEs → ids touched by a cross-source link →
    // per-source counts and the exact-int-division novelty rate
    "q95_source_novelty" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mh AS (SELECT doc_id, j.j AS j,
        |              min(('0x' || substr(md5(j.j || ':' || tok), 1, 15))::BIGINT) AS h
        |       FROM tok, (SELECT unnest(range(0, 16)) AS j) j GROUP BY doc_id, j.j),
        |sig AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |k AS (SELECT doc_id, b.b AS band, list_slice(sig, b.b*4 + 1, b.b*4 + 4) AS key
        |      FROM sig, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |p AS (SELECT c.idA, c.idB
        |      FROM cand c JOIN t a ON a.doc_id = c.idA JOIN t b ON b.doc_id = c.idB
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9),
        |cr AS (SELECT p.idA, p.idB
        |       FROM p JOIN documents da ON da.doc_id = p.idA
        |              JOIN documents db ON db.doc_id = p.idB
        |       WHERE da.source <> db.source),
        |touched AS (SELECT DISTINCT doc_id
        |            FROM (SELECT idA AS doc_id FROM cr
        |                  UNION ALL SELECT idB FROM cr))
        |SELECT d.source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(t2.doc_id) AS BIGINT) AS n_cross_linked,
        |       1.0 - CAST(count(t2.doc_id) AS DOUBLE) / count(*) AS novelty_rate
        |FROM documents d LEFT JOIN touched t2 ON t2.doc_id = d.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // q52's chain with the quality-weighted survivor rule: cluster
    // labels from the recursive closure, then per-label argmax by
    // (quality desc, id) — q63's quality CTE supplies the score.
    "q90_quality_dedup" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |ft AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
        |q AS (SELECT doc_id,
        |        CASE WHEN toks[1] = '' THEN 0.0 ELSE (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
        |          + (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3
        |          + (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.2 END AS quality
        |      FROM ft),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mh AS (SELECT doc_id, j.j AS j,
        |              min(('0x' || substr(md5(j.j || ':' || tok), 1, 15))::BIGINT) AS h
        |       FROM tok, (SELECT unnest(range(0, 16)) AS j) j GROUP BY doc_id, j.j),
        |sig AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |k AS (SELECT doc_id, b.b AS band, list_slice(sig, b.b*4 + 1, b.b*4 + 4) AS key
        |      FROM sig, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |p AS (SELECT c.idA, c.idB
        |      FROM cand c JOIN t a ON a.doc_id = c.idA JOIN t b ON b.doc_id = c.idB
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9),
        |e AS (SELECT idA AS src, idB AS dst FROM p UNION ALL SELECT idB, idA FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
        |lab AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
        |win AS (SELECT id FROM (
        |          SELECT lab.id, row_number() OVER (PARTITION BY lab.label
        |                   ORDER BY q.quality DESC, lab.id) AS rn
        |          FROM lab JOIN q ON q.doc_id = lab.id)
        |        WHERE rn = 1)
        |SELECT d.doc_id, d.lang, q.quality
        |FROM documents d JOIN q ON q.doc_id = d.doc_id
        |WHERE d.doc_id NOT IN (SELECT id FROM lab)
        |   OR d.doc_id IN (SELECT id FROM win)
        |ORDER BY d.doc_id""".stripMargin,
    // q52's closure chain → per-label cluster sizes → histogram, with
    // never-paired docs folded in as size-1 clusters. (Like q52, the
    // exact-dedup pre-collapse is not modeled: sf0.01 documents has no
    // exact duplicates, q29-verified.)
    "q93_cluster_profile" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mh AS (SELECT doc_id, j.j AS j,
        |              min(('0x' || substr(md5(j.j || ':' || tok), 1, 15))::BIGINT) AS h
        |       FROM tok, (SELECT unnest(range(0, 16)) AS j) j GROUP BY doc_id, j.j),
        |sig AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |k AS (SELECT doc_id, b.b AS band, list_slice(sig, b.b*4 + 1, b.b*4 + 4) AS key
        |      FROM sig, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |p AS (SELECT c.idA, c.idB
        |      FROM cand c JOIN t a ON a.doc_id = c.idA JOIN t b ON b.doc_id = c.idB
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9),
        |e AS (SELECT idA AS src, idB AS dst FROM p UNION ALL SELECT idB, idA FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
        |lab AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
        |cs AS (SELECT label, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM lab GROUP BY label),
        |h AS (SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
        |      FROM cs GROUP BY cluster_size
        |      UNION ALL
        |      SELECT CAST(1 AS BIGINT),
        |             (SELECT count(*) FROM documents)
        |               - (SELECT COALESCE(sum(cluster_size), 0) FROM cs))
        |SELECT cluster_size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters
        |FROM h GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    // Full pipeline: md5-MinHash signatures (16 hashes), 4 bands of 4
    // rows keyed by the raw signature slice (NOT 8×2 — see q52's
    // scaladoc: r=2 pulls ~53% of J≈0.3 pairs into verification),
    // candidate pairs, exact token-set Jaccard ≥ 0.9, recursive-CTE
    // transitive closure, then survivors = docs that are not a
    // non-minimum member of a cluster.
    "q52_dedup_pipeline" ->
      """WITH RECURSIVE t AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), ' +')) AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mh AS (SELECT doc_id, j.j AS j,
        |              min(('0x' || substr(md5(j.j || ':' || tok), 1, 15))::BIGINT) AS h
        |       FROM tok, (SELECT unnest(range(0, 16)) AS j) j GROUP BY doc_id, j.j),
        |sig AS (SELECT doc_id, list(h ORDER BY j) AS sig FROM mh GROUP BY doc_id),
        |k AS (SELECT doc_id, b.b AS band, list_slice(sig, b.b*4 + 1, b.b*4 + 4) AS key
        |      FROM sig, (SELECT unnest(range(0, 4)) AS b) b),
        |cand AS (SELECT DISTINCT a.doc_id AS idA, b.doc_id AS idB
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        |p AS (SELECT c.idA, c.idB
        |      FROM cand c JOIN t a ON a.doc_id = c.idA JOIN t b ON b.doc_id = c.idB
        |      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9),
        |e AS (SELECT idA AS src, idB AS dst FROM p UNION ALL SELECT idB, idA FROM p),
        |reach AS (
        |  SELECT src AS id, src AS r FROM e
        |  UNION
        |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id),
        |losers AS (SELECT id FROM (SELECT id, min(r) AS label FROM reach GROUP BY id)
        |           WHERE id <> label)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM losers)
        |ORDER BY doc_id""".stripMargin)
}
