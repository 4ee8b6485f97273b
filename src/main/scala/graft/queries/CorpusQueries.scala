package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.agg.Statistics
import graft.ops.{Classify, Curation, Dedup, Packing, Quantiles, Retrieval, Similarity, TextAnalysis, Vocab}

/** Corpus-construction operators as oracle-checked queries: vocabulary
  * statistics, sequence packing, incremental ingest dedup, quantile
  * quality gating, and column profiling — the remaining steps between a
  * filtered corpus and a training run.
  */
object CorpusQueries {

  /** Top-100 vocabulary by token frequency (tf desc, token asc — total
    * order, so the cut is deterministic), with document frequency.
    */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Vocab.topK(Tables.documents(s, dir), "doc_id", "text", 100)
  }

  /** q60's scale path: token top-20 from ONE Misra-Gries pass with a
    * 1024-counter summary per partition — the shuffle carries
    * partitions × 1024 counters instead of the distinct vocabulary. At
    * test vocabulary (≪ 1024 distinct) the sketch is provably exact and
    * layout-independent, so the DuckDB exact-count oracle hash-checks
    * it; at web-scale vocabularies the same plan degrades gracefully to
    * the ≤ N/(m+1)-error estimate (`SketchesSpec` pins that regime).
    */
  private def q101(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(graft.ops.TextAnalysis.tokens($"text")).as("token"))
    graft.ops.Sketches.heavyHitters(toks, "token", m = 1024, k = 20)
  }

  /** Corpus snapshot diff between two synthetic releases of the
    * documents table (before = ids ∉ 3ℤ; after = ids ∉ 5ℤ with every
    * 7th document's text revised): added / removed / changed /
    * unchanged per id — the dataset-versioning audit. md5 fingerprint
    * basis for the oracle; production runs use the xxh64 default.
    */
  private def q102(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val before = docs.where($"doc_id" % 3 =!= 0)
    val after = docs.where($"doc_id" % 5 =!= 0)
      .withColumn("text",
        when($"doc_id" % 7 === 0, concat($"text", lit(" v2")))
          .otherwise($"text"))
    graft.ops.Dedup.snapshotDiff(before, after, "doc_id", "text",
        md5Basis = true)
      .orderBy($"doc_id")
  }

  /** Incremental release pipeline — the 100 TB release cadence: diff the
    * new corpus release against the previous one (q102's synthetic
    * releases), reprocess ONLY the added/changed delta through the
    * quality gate, and drop delta docs whose content already exists in
    * the carried-over (unchanged) corpus. The carried majority is never
    * re-scored or re-deduped — per-release work scales with the delta,
    * not the corpus.
    */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val before = docs.where($"doc_id" % 3 =!= 0)
    val after = docs.where($"doc_id" % 5 =!= 0)
      .withColumn("text",
        when($"doc_id" % 7 === 0, concat($"text", lit(" v2")))
          .otherwise($"text"))
    val diff = graft.ops.Dedup.snapshotDiff(before, after, "doc_id",
      "text", md5Basis = true)
    val delta = after
      .join(diff.where($"status".isin("added", "changed")), Seq("doc_id"))
    val carried = after
      .join(diff.where($"status" === "unchanged").select($"doc_id"),
        Seq("doc_id"))
    val gated = delta
      .where(graft.ops.TextAnalysis.qualityScore($"text") >= 0.5)
      .select($"doc_id", $"text", $"status")
    graft.ops.Dedup.incrementalDedup(gated, carried, "doc_id", "text")
      .select($"doc_id", $"status")
      .orderBy($"doc_id")
  }

  /** Quality-gate calibration: confusion counts + precision/recall/F1/
    * keep-rate of `qualityScore >= t` against the length reference
    * (n_chars ≥ 300) across a 4-cutoff grid — one aggregation pass, one
    * output row per cutoff, the table read before committing a gate
    * threshold.
    */
  private def q104(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Statistics.thresholdSweep(docs,
        graft.ops.TextAnalysis.qualityScore($"text"),
        $"n_chars" >= 300, cutoffs = Seq(0.45, 0.5, 0.55, 0.62))
      .orderBy($"cutoff")
  }

  /** GPT-style sequence packing at a 512-token budget: each document's
    * offset interval in the virtual corpus token stream and the packed
    * sequences it spans. The global prefix sum runs as the two-phase
    * partition-parallel plan (never a single-partition window).
    */
  private def q61(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Packing.packSequences(Tables.documents(s, dir), "doc_id", "text", 512L)
      .orderBy($"doc_id")
  }

  /** The q61 packing carved into dataloader rows: one row per
    * (sequence, document) overlap with the document's in-sequence token
    * span — the fixed-length example table a trainer reads. Every
    * 512-token sequence's rows tile it exactly; boundary-spanning
    * documents appear in each sequence they touch.
    */
  private def q97(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Packing.carveExamples(Tables.documents(s, dir), "doc_id", "text", 512L)
      .orderBy($"seq_id", $"doc_id")
  }

  /** Incremental ingest dedup: docs with doc_id ≡ 0 (mod 3) arrive as
    * the new batch; the rest are the existing corpus. Batch survivors =
    * first-in-batch content not already in the corpus.
    */
  private def q62(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Dedup.incrementalDedup(
        docs.where($"doc_id" % 3 === 0),
        docs.where($"doc_id" % 3 =!= 0), "doc_id", "text")
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Per-language median quality gate: keep documents at or above their
    * language's exact rank-based median quality (the cume_dist
    * formulation — value selection, no interpolation, so both engines
    * derive the identical threshold).
    */
  private def q63(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .select($"doc_id", $"lang", TextAnalysis.qualityScore($"text").as("quality"))
    Quantiles.filterAboveQuantile(scored, "lang", "quality", 0.5)
      .select($"doc_id", $"lang", $"quality")
      .orderBy($"doc_id")
  }

  /** Column profile of lineitem in one aggregate pass: null/distinct
    * counts and min/max/mean per column (strings profiled on length).
    */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Statistics.columnProfile(Tables.lineitem(s, dir),
        numericCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
        stringCols = Seq("l_returnflag", "l_linestatus"))
      .orderBy($"col_name")
  }

  /** q64 at the 100 TB plan shape: `approx_count_distinct` keeps the
    * aggregate a single partial+final pass (no per-column Expand of the
    * scan). Sketch values aren't oracle-stable across engines →
    * rows-only; StatisticsSpec pins exact/approx agreement.
    */
  private def q64b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Statistics.columnProfileApprox(Tables.lineitem(s, dir),
        numericCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
        stringCols = Seq("l_returnflag", "l_linestatus"))
      .orderBy($"col_name")
  }

  /** Incremental near-dup: batch docs (doc_id ≡ 0 mod 3) that paraphrase
    * an existing corpus doc at token-set Jaccard ≥ 0.9, via MinHash band
    * collisions between the sides. md5 basis → DuckDB rebuilds the exact
    * candidate set, so the banded batch-vs-corpus plan is hash-checked
    * (the q52 technique; the bucket cap cannot trigger at sf0.01).
    */
  private def q67(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Dedup.incrementalNearDups(
        docs.where($"doc_id" % 3 === 0),
        docs.where($"doc_id" % 3 =!= 0), "doc_id", "text",
        threshold = 0.9, numHashes = 16, bands = 4, md5Basis = true)
      .orderBy($"idA", $"idB")
  }

  /** TF-IDF weights over the corpus. ln() must agree between engines for
    * the hash check; both use correctly-rounded libm-style log on the
    * same rational inputs (verified by this query's gate history — if an
    * engine's libm ever disagrees, the column is the first to flag it).
    */
  private def q68(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Vocab.tfidf(Tables.documents(s, dir), "doc_id", "text")
      .orderBy($"doc_id", $"token")
  }

  /** PRODUCTION-BASIS twin of q67 (xxh64 MinHash, bare long band keys —
    * the basis a real ingest runs; q67's md5 basis exists for the DuckDB
    * gate). Rows-only; makes the headline bench time the shipping path.
    */
  private def q67b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Dedup.incrementalNearDups(
        docs.where($"doc_id" % 3 === 0),
        docs.where($"doc_id" % 3 =!= 0), "doc_id", "text",
        threshold = 0.9, numHashes = 16, bands = 4, md5Basis = false)
      .orderBy($"idA", $"idB")
  }

  /** BPE merge training over the corpus: the first 10 learned merges
    * (rank, left, right). Deterministic (lexicographic tie-break) but a
    * driver-looped trainer, not a single SQL expression → rows-only;
    * CorpusOpsSpec proves planted frequent pairs are recovered.
    */
  private def q75(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Vocab.trainBpeMerges(Tables.documents(s, dir), "text", numMerges = 10)
      .zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("rank", "left", "right")
      .orderBy($"rank")
  }

  /** Corpus tokenized with the learned BPE table: per-document subword
    * counts from the codegen'd segmentation kernel (train → apply, the
    * full BPE round-trip). Trains on the doc_id ≡ 0 (mod 5) hash-slice
    * and applies to the whole corpus — the production shape (tokenizer
    * training never reads all 100 TB; application does). Deterministic
    * but driver-loop-trained → rows-only; FunctionsSpec pins
    * kernel/reference parity.
    */
  private def q76(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val merges = Vocab.trainBpeMerges(
      docs.where($"doc_id" % 5 === 0), "text", numMerges = 10)
    docs.select($"doc_id",
        size(TextAnalysis.tokens($"text")).as("n_words"),
        size(Vocab.segmentTokens(TextAnalysis.tokens($"text"), merges))
          .as("n_subwords"))
      .orderBy($"doc_id")
  }

  /** q62's split through the Bloom-pre-filtered path: identical result
    * (false positives are re-verified, false negatives impossible), so it
    * shares q62's oracle — the cross-engine proof that the pre-filter is
    * a pure optimization.
    */
  private def q80(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Dedup.incrementalDedupBloom(
        docs.where($"doc_id" % 3 === 0),
        docs.where($"doc_id" % 3 =!= 0), "doc_id", "text",
        expectedCorpusItems = 100000L)
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Greedy token-budget curation: the highest-quality documents up to
    * 5000 cumulative tokens (quality desc, doc_id tiebreak) — quality
    * doubles are bit-identical cross-engine (q63/q73), so the selection
    * boundary and the per-doc running offsets are hash-checked.
    */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .select($"doc_id", $"text",
        TextAnalysis.qualityScore($"text").as("quality"))
    Packing.takeTokenBudget(scored, "doc_id", "text", "quality", 5000L)
      .orderBy($"doc_id")
  }

  /** CCNet-shape LM quality gate: bigram LM trained on the doc_id ≢ 0
    * (mod 5) slice scores the held-out slice. Hash-gated columns are
    * INTEGER ONLY — `n_bigrams` plus the exact model-count dot products
    * `bigram_hits`/`unigram_hits`, which pin the per-doc joined
    * bigram/unigram counts (together with α and V those determine the
    * LM score exactly). The ln-derived `logprob_sum` is NEVER hashed
    * cross-engine: quantizing it failed the driver's gate two rounds
    * running (1e-12 in r3, 1e-6 in r4 — the spread between engines'
    * `log` is environment-dependent), so it lives on the rows-only twin
    * [[q87b]].
    */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Vocab.bigramLogProb(
        docs.where($"doc_id" % 5 === 0),
        docs.where($"doc_id" % 5 =!= 0), "doc_id", "text")
      .select($"doc_id", $"n_bigrams",
        // DECIMAL internally (exact dot products); BIGINT at the gated
        // boundary — the driver's hasher cannot digest DECIMAL output
        // (round-6 finding: all 8 DECIMAL-emitting queries hash-failed)
        $"bigram_hits".cast("long").as("bigram_hits"),
        $"unigram_hits".cast("long").as("unigram_hits"))
      .orderBy($"doc_id")
  }

  /** q87's transcendental columns (exact decimal ln-sum + double mean),
    * rows-only: the values are deterministic within an engine but
    * engine-dependent at the ulp level, so they are exercised and
    * row-counted — never hash-compared (the q75/q76/q52b pattern).
    * CorpusOpsSpec pins the arithmetic against a hand-computed LM.
    */
  private def q87b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Vocab.bigramLogProb(
        docs.where($"doc_id" % 5 === 0),
        docs.where($"doc_id" % 5 =!= 0), "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"logprob_sum", $"logprob")
      .orderBy($"doc_id")
  }

  /** The CCNet-then-dedup production shape in ONE plan: quality
    * thresholds → bigram-LM gate (trained on the doc_id ≡ 0 mod 7
    * reference slice, mean logprob ≥ −3.55 as an exact decimal
    * predicate) → OOV gate (top-20 reference vocabulary,
    * n_oov·8 ≤ n_tokens·3 — pure integers) → decontamination vs the
    * doc_id ≡ 0 mod 97 bench slice → exact dedup. Thresholds chosen to
    * BITE at test scale (each LM/OOV gate drops ~25% of the corpus), so
    * the composition — not just the plumbing — is hash-checked by
    * chaining the q59/q87/q88 oracle CTEs.
    */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    graft.ops.Curation.curateCcnet(
        docs.where($"doc_id" % 97 =!= 0),
        docs.where($"doc_id" % 7 === 0),
        docs.where($"doc_id" % 97 === 0),
        "doc_id", "text", contaminationN = 3)
      .orderBy($"doc_id")
  }

  /** Length-bucketed batching profile: documents grouped by the binary
    * magnitude of their token count (bucket = bit-length of n_tokens —
    * exact integer arithmetic via `bin()`, never a float log2 whose
    * exact-power-of-two boundaries could flip cross-engine), with the
    * padding waste a pad-to-bucket-max batching strategy would pay —
    * the report that sizes sequence-length buckets for dynamic
    * batching. Narrow scan + a bucket-count-sized aggregate.
    */
  private def q96(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        TextAnalysis.tokenCount($"text").cast("long").as("n"))
      .withColumn("bucket", length(bin($"n")).cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n").as("sum_tokens"),
        max($"n").as("max_tokens"))
      .select($"bucket", $"n_docs", $"sum_tokens", $"max_tokens",
        ($"n_docs" * $"max_tokens" - $"sum_tokens").as("padded_waste"),
        ($"sum_tokens".cast("double") / ($"n_docs" * $"max_tokens"))
          .as("fill_rate"))
      .orderBy($"bucket")
  }

  /** Vocab-coverage QA: every document's OOV rate against the corpus's
    * own top-100 vocabulary (deterministic (tf desc, token) cut).
    */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Vocab.oovRate(docs, docs, "doc_id", "text", vocabSize = 100)
      .orderBy($"doc_id")
  }

  /** Supervised curation classifier (the GPT-3/LLaMA "train a linear
    * classifier on a labeled slice, score the corpus" step): multinomial
    * Naive Bayes over tokens, trained to predict `lang` from the
    * doc_id ≢ 0 (mod 10) slice, scoring every document against every
    * class. Hash-gated columns are INTEGER ONLY — `n_tokens` plus the
    * exact model-count dot product `model_hits`, which pins the joined
    * per-class model counts (with α, V, and the class totals those
    * determine the NB score exactly). The ln-derived score lives on the
    * rows-only twin [[q109b]] — the q87/q87b discipline.
    */
  private def q109(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Classify.nbScore(docs, docs.where($"doc_id" % 10 =!= 0),
        "doc_id", "lang", "text")
      .select($"doc_id", $"label", $"n_tokens",
        // DECIMAL internally; BIGINT at the gated boundary (round-6:
        // DECIMAL output doesn't hash-digest)
        $"model_hits".cast("long").as("model_hits"))
      .orderBy($"doc_id", $"label")
  }

  /** q109's argmax predictions with the quantized-decimal scores —
    * rows-only (transcendental-derived; deterministic within an engine,
    * pinned by ClassifySpec's hand-computed model instead).
    */
  private def q109b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Classify.nbPredict(docs, docs.where($"doc_id" % 10 =!= 0),
        "doc_id", "lang", "text")
      .orderBy($"doc_id")
  }

  /** The NB ARGMAX, hash-gated (round-8 promotion of q109b's label
    * choice): (doc_id, predicted, n_tokens) — STRING + BIGINTs. Sound
    * because the score is exact decimal arithmetic over per-(token,
    * label) lns QUANTIZED to 1e-6 ([[Classify.nbScore]]): the oracle
    * recomputes the identical quantization, so scores agree exactly
    * unless an ln lands within a ulp of a 5e-7 rounding boundary
    * (probability ~1e-9 per model entry; none on these fixtures —
    * all 5,000 sf0.1 argmax-row score_sums compare exactly equal to
    * the DuckDB recomputation, 0 mismatches).
    * Exact score ties break to the lexicographically smallest label on
    * both engines. Corpus-conditional like q135 — re-verify after any
    * fixture regeneration.
    */
  private def q109c(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Classify.nbPredict(docs, docs.where($"doc_id" % 10 =!= 0),
        "doc_id", "lang", "text")
      .select($"doc_id", $"predicted", $"n_tokens")
      .orderBy($"doc_id")
  }

  private val Bm25Terms = Seq("spark", "hash", "window", "vector")

  /** BM25 integer basis for a fixed keyword query: per (doc, matched
    * term) tf/dl/df plus corpus scalars — every column integral, so the
    * full retrieval model state rides the hash gate; the ln-scored
    * ranking itself is q121b (rows-only, the q87 discipline).
    */
  private def q121(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Retrieval.queryTermStats(Tables.documents(s, dir), "doc_id", "text",
        Bm25Terms)
      .orderBy($"doc_id", $"term")
  }

  /** Ranked BM25 top-20 for the q121 query — ln-based score, rows-only. */
  private def q121b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Retrieval.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
      Bm25Terms, k = 20)
  }

  /** The BM25 RANKING, hash-gated (round-8 promotion of q121b's
    * order): [[Retrieval.bm25TopKRanked]]'s (rank, doc_id, n_terms_hit)
    * projection — all integral, and the quantized-decimal score makes
    * the order engine-stable (gap audit in the scaladoc there: adjacent
    * top-25 scores ≥ 3e-5 apart relative at sf0.01/sf0.1 vs ~1e-9
    * noise; the one exact tie has identical integer stats, so both
    * engines break it by doc_id). Corpus-conditional like q135 —
    * re-run the gap audit after any fixture regeneration.
    */
  private def q121c(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Retrieval.bm25TopKRanked(Tables.documents(s, dir), "doc_id", "text",
        Bm25Terms, k = 20)
      .select($"rank", $"doc_id", $"n_terms_hit")
  }

  /** Hybrid retrieval via reciprocal-rank fusion: an integer-basis
    * lexical ranking (total Bm25Terms occurrences, ties to the smaller
    * id) fused with the exact dense cosine ranking against vec 0's
    * embedding. Both rank inputs are cross-engine-stable (integers /
    * the q30-proven double fold), so the fused score hash-gates even
    * though the ln-based BM25 score itself cannot (q121b is rows-only).
    */
  private def q131(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
    val lex = Tables.documents(s, dir)
      .select(lit("q0").as("query_id"), $"doc_id",
        TextAnalysis.wordSetCount($"text", Bm25Terms).cast("long").as("__tf"))
      .where($"__tf" > 0)
      .withColumn("rank", row_number().over(
        w.partitionBy($"query_id").orderBy($"__tf".desc, $"doc_id")))
      .where($"rank" <= 50)
    val dense = Similarity.bruteForceTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", 0L, 50)
      .select(lit("q0").as("query_id"), $"vec_id".as("doc_id"), $"cosine")
      .withColumn("rank", row_number().over(
        w.partitionBy($"query_id").orderBy($"cosine".desc, $"doc_id")))
    Retrieval.rrfFuse(lex, dense, "query_id", "doc_id", topK = 20)
      .orderBy($"rank")
  }

  /** q133's bucket SIZES per language — rank terciles depend only on
    * per-language row counts (head = floor(n/3), middle = floor(2n/3) −
    * floor(n/3), tail = the rest), never on the ln values that order
    * them, so the counts gate unconditionally — the corpus-independent
    * complement to q133's corpus-conditional assignment gate.
    */
  private def q133b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Vocab.ccnetBuckets(
        docs.where($"doc_id" % 5 === 0),
        docs.where($"doc_id" % 5 =!= 0), "doc_id", "text", "lang")
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"bucket")
  }

  /** Per-source token-length percentile profile (p50/p90/p99, exact
    * rank basis) — the context-length design table per feed, from one
    * window pass.
    */
  private def q142(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = Tables.documents(s, dir)
      .select($"source",
        TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
    Quantiles.groupPercentiles(df, "source", "n_tokens",
        Seq(0.5, 0.9, 0.99))
      .orderBy($"source")
  }

  /** Per-source release churn: q102's snapshot diff rolled up by
    * source with exact per-status counts and a churn rate (non-
    * unchanged fraction) — the release-review table that shows WHICH
    * feed moved, before anyone reads per-id diffs. Report-sized: the
    * diff joins fingerprints, the rollup is one bounded-key aggregate.
    */
  private def q139(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val before = docs.where($"doc_id" % 3 =!= 0)
    val after = docs.where($"doc_id" % 5 =!= 0)
      .withColumn("text",
        when($"doc_id" % 7 === 0, concat($"text", lit(" v2")))
          .otherwise($"text"))
    val diff = Dedup.snapshotDiff(before, after, "doc_id", "text",
      md5Basis = true)
    diff.join(docs.select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"status" === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when($"status" === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when($"status" === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when($"status" === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"))
      .withColumn("churn_rate",
        (col("n_docs") - col("n_unchanged")).cast("double") / col("n_docs"))
      .orderBy($"source")
  }

  /** Vocabulary-size design sweep: coverage at 10/20/50-token vocabs in
    * one pass — the OOV-vs-size knee chart's data. The corpus vocabulary
    * at sf0.01 is ~40 types, so the small sizes provably bite.
    */
  private def q137(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Vocab.vocabSizeSweep(Tables.documents(s, dir), "text",
        sizes = Seq(10, 20, 50))
      .orderBy($"vocab_size")
  }

  /** CCNet-style per-language LM buckets: head/middle/tail terciles of
    * the bigram mean log-prob — SCORING the doc_id ≡ 0 (mod 5) slice
    * with a model trained on the other four fifths (corpus comes first
    * in [[Vocab.ccnetBuckets]]'s signature; the pre-round-11 scaladoc
    * here misstated the split). Rank-based per language. Hash-gated since round
    * 11 on the (doc_id, lang, n_bigrams, bucket) membership: the order
    * key `logprob_sum` is an exact DECIMAL sum of 1e-6-quantized lns
    * that the oracle recomputes bit-exactly (the q109c discipline),
    * the double mean divides two cross-engine-identical values, and
    * the tercile comparison mirrors Spark's cume_dist operand-for-
    * operand — so bucket assignment agrees unless an ln lands within a
    * ulp of a 5e-7 boundary. `tools/audit_margins.py` measures exactly
    * that: every distinct model ln sits ≥ 1.9e6 ulps from a rounding
    * boundary at sf0.01 AND sf0.1 (`bench_history/r11_margin_audit_*`),
    * so the sums are bit-identical cross-engine. NOTE the soundness
    * argument here is the ln scan, NOT gap margins: at sf0.1 the
    * tightest tercile-boundary logprob gap is 2.5e-7, below the 1e-6
    * worst-case wobble — with bit-identical sums any positive gap (or
    * an exact tie, broken by doc_id) suffices. Corpus-conditional —
    * re-audit after any fixture regeneration. The raw `logprob` double
    * stays off the gated boundary.
    */
  private def q133(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    Vocab.ccnetBuckets(
        docs.where($"doc_id" % 5 === 0),
        docs.where($"doc_id" % 5 =!= 0), "doc_id", "text", "lang")
      .select($"doc_id", $"lang", $"n_bigrams", $"bucket")
      .orderBy($"doc_id")
  }

  /** Per-source content manifest: the O(groups) release-equality check
    * (order-independent md5-prefix DECIMAL sums) run before paying for
    * a full snapshot diff. The manifest value exceeds BIGINT range at
    * scale (sum of 60-bit prefixes), so the gated boundary emits it as
    * its exact STRING digits — DECIMAL output doesn't hash-digest
    * (round-6 finding), and decimal→string is digit-exact on both
    * engines.
    */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.contentManifest(Tables.documents(s, dir), "source", "doc_id",
        "text")
      .withColumn("content_hash", col("content_hash").cast("string"))
      .orderBy($"source")
  }

  /** C4-style blocklist gate audit per source: flagged counts, total
    * blocklisted-token hits, keep-rate — the pre-commit table for a
    * content gate. Most blocklist entries are absent from the corpus by
    * construction (the realistic shape); "slow" is present so the gate
    * provably bites at sf0.01.
    */
  private def q122(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Curation.blocklistReport(Tables.documents(s, dir), "source", "text",
        words = Seq("slow", "spam", "junk"), maxHits = 2)
      .orderBy($"source")
  }

  /** Tokenizer-fertility audit per language on the RE2-portable
    * pre-tokenizer (word runs + single symbols): tokens per word and
    * chars per token — integer sums and single IEEE divisions only.
    */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Vocab.fertilityReport(Tables.documents(s, dir), "lang", "text")
      .orderBy($"lang")
  }

  /** q123 on a REAL trained-BPE segmentation (100 merges trained on the
    * corpus, applied by the codegen'd kernel) — BPE training is not
    * SQL-expressible (q75's note), so rows-only.
    */
  private def q123b(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Vocab.bpeFertilityReport(Tables.documents(s, dir), "lang", "text",
        numMerges = 100)
      .orderBy($"lang")
  }

  /** Padding-waste table across a context-length grid: document-intact
    * batching vs concat-packing cost at each candidate seq_len — the
    * report that picks a context length. Pure integer arithmetic.
    */
  private def q124(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Packing.paddingWasteReport(Tables.documents(s, dir), "text",
        Seq(64, 128, 256, 512))
      .orderBy($"seq_len")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_rrf_hybrid" -> (q131 _),
    "q133_ccnet_buckets" -> (q133 _),
    "q133b_ccnet_bucket_counts" -> (q133b _),
    "q134_content_manifest" -> (q134 _),
    "q137_vocab_sweep" -> (q137 _),
    "q139_release_churn" -> (q139 _),
    "q142_length_percentiles" -> (q142 _),
    "q121_bm25" -> (q121 _),
    "q121b_bm25_rank" -> (q121b _),
    "q121c_bm25_rank_order" -> (q121c _),
    "q122_blocklist_report" -> (q122 _),
    "q123_fertility" -> (q123 _),
    "q123b_bpe_fertility" -> (q123b _),
    "q124_padding_waste" -> (q124 _),
    "q109_nb_classifier" -> (q109 _),
    "q109b_nb_predict" -> (q109b _),
    "q109c_nb_argmax" -> (q109c _),
    "q68_tfidf" -> (q68 _),
    "q80_incremental_dedup_bloom" -> (q80 _),
    "q85_token_budget" -> (q85 _),
    "q87_lm_score" -> (q87 _),
    "q87b_lm_score_logprob" -> (q87b _),
    "q88_oov_rate" -> (q88 _),
    "q89_ccnet_pipeline" -> (q89 _),
    "q96_length_buckets" -> (q96 _),
    "q64b_column_profile_approx" -> (q64b _),
    "q67b_incremental_neardup_xxh64" -> (q67b _),
    "q75_bpe_merges" -> (q75 _),
    "q76_bpe_segment" -> (q76 _),
    "q60_vocab_topk" -> (q60 _),
    "q101_heavy_hitters" -> (q101 _),
    "q102_snapshot_diff" -> (q102 _),
    "q104_gate_calibration" -> (q104 _),
    "q107_release_delta" -> (q107 _),
    "q61_sequence_packing" -> (q61 _),
    "q97_example_carve" -> (q97 _),
    "q62_incremental_dedup" -> (q62 _),
    "q63_quality_quantile" -> (q63 _),
    "q64_column_profile" -> (q64 _),
    "q67_incremental_neardup" -> (q67 _))

  val oracles: Map[String, String] = Map(
    // q134: same 60-bit md5-prefix decimal-sum basis as Verify's own
    // digest — order-independent, so the manifest is layout-proof on
    // both engines.
    "q134_content_manifest" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(CAST(sum(('0x' || substr(md5(doc_id || ':' || text), 1, 15))::BIGINT)
        |            AS DECIMAL(38,0)) AS VARCHAR) AS content_hash
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    // q137: global token ranks by (tf desc, token), coverage sums per
    // candidate size — integers + one division per row.
    "q137_vocab_sweep" ->
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), ' +')) AS token FROM documents),
        |tf AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
        |rk AS (SELECT token, tf, row_number() OVER (ORDER BY tf DESC, token) AS rank FROM tf),
        |sz AS (SELECT unnest([10, 20, 50]) AS vocab_size)
        |SELECT sz.vocab_size,
        |       count(*) AS n_types,
        |       CAST(sum(CASE WHEN rank <= vocab_size THEN 1 ELSE 0 END) AS BIGINT) AS covered_types,
        |       CAST(sum(tf) AS BIGINT) AS total_occurrences,
        |       CAST(sum(CASE WHEN rank <= vocab_size THEN tf ELSE 0 END) AS BIGINT) AS covered_occurrences,
        |       CAST(sum(CASE WHEN rank <= vocab_size THEN 0 ELSE tf END) AS BIGINT) AS oov_occurrences,
        |       CAST(sum(CASE WHEN rank <= vocab_size THEN 0 ELSE tf END) AS DOUBLE)
        |         / sum(tf) AS oov_rate
        |FROM rk, sz
        |GROUP BY sz.vocab_size
        |ORDER BY sz.vocab_size""".stripMargin,
    // q131: lexical rank = query-term occurrence count (integer, ties
    // to smaller id), dense rank = exact cosine vs vec 0 (the q30
    // double fold); rrf terms are single double divisions summed in
    // fixed order — CAST(1 AS DOUBLE) matters: a bare 1.0 is DECIMAL
    // in DuckDB and decimal division diverges from IEEE.
    "q131_rrf_hybrid" ->
      """WITH lex AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split_regex(trim(text), ' +'),
        |             t -> t IN ('spark','hash','window','vector'))) AS tf
        |  FROM documents),
        |lr AS (SELECT doc_id,
        |              row_number() OVER (ORDER BY tf DESC, doc_id) AS rank_a
        |       FROM lex WHERE tf > 0
        |       QUALIFY rank_a <= 50),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |dr AS (SELECT vec_id AS doc_id,
        |              row_number() OVER (ORDER BY
        |                list_cosine_similarity(embedding::DOUBLE[], qv.qe::DOUBLE[]) DESC,
        |                vec_id) AS rank_b
        |       FROM embeddings, qv WHERE vec_id <> 0
        |       QUALIFY rank_b <= 50),
        |f AS (SELECT coalesce(lr.doc_id, dr.doc_id) AS doc_id,
        |             lr.rank_a, dr.rank_b,
        |             coalesce(CAST(1 AS DOUBLE) / (60 + lr.rank_a), 0)
        |               + coalesce(CAST(1 AS DOUBLE) / (60 + dr.rank_b), 0) AS rrf_score
        |      FROM lr FULL OUTER JOIN dr ON lr.doc_id = dr.doc_id)
        |SELECT 'q0' AS query_id, doc_id, rank_a, rank_b, rrf_score,
        |       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rank
        |FROM f
        |QUALIFY rank <= 20
        |ORDER BY rank""".stripMargin,
    // BM25 integer basis: tf from the term-filtered token explode, df
    // by counting (doc, term) rows, corpus scalars cross-joined
    "q121_bm25" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |e AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
        |      FROM t),
        |m AS (SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf
        |      FROM e WHERE term IN ('spark', 'hash', 'window', 'vector')
        |      GROUP BY 1, 2, 3),
        |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY 1),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(len(toks)) AS BIGINT) AS corpus_tokens
        |      FROM t)
        |SELECT m.doc_id, m.term, m.tf, m.dl, d.df, c.n_docs, c.corpus_tokens
        |FROM m JOIN d USING (term) CROSS JOIN c
        |ORDER BY m.doc_id, m.term""".stripMargin,
    // the RANKING gate (q121c): per-term score quantized to
    // DECIMAL(38,9) before the sum on BOTH engines, so the order is
    // exact decimal arithmetic; every IEEE op below mirrors the Spark
    // expression tree operand-for-operand (constants as the SAME source
    // expressions — (1.2 + 1.0), not 2.2, because the two parses can
    // round to different doubles)
    "q121c_bm25_rank_order" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |e AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
        |      FROM t),
        |m AS (SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf
        |      FROM e WHERE term IN ('spark', 'hash', 'window', 'vector')
        |      GROUP BY 1, 2, 3),
        |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY 1),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(len(toks)) AS BIGINT) AS corpus_tokens
        |      FROM t),
        |s AS (SELECT m.doc_id,
        |        sum(CAST(ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |                 * (CAST(m.tf AS DOUBLE) * (1.2 + 1.0)
        |                    / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * m.dl
        |                       / (CAST(c.corpus_tokens AS DOUBLE) / c.n_docs))))
        |                 AS DECIMAL(38,9))) AS sc,
        |        CAST(count(*) AS BIGINT) AS n_terms_hit
        |      FROM m JOIN d USING (term) CROSS JOIN c GROUP BY m.doc_id)
        |SELECT CAST(row_number() OVER (ORDER BY sc DESC, doc_id) AS INTEGER) AS rank,
        |       doc_id, n_terms_hit
        |FROM s QUALIFY rank <= 20 ORDER BY rank""".stripMargin,
    // token-exact blocklist hits per doc → per-source gate audit
    "q122_blocklist_report" ->
      """WITH h AS (SELECT source,
        |             CAST(len(list_filter(string_split_regex(trim(lower(text)), ' +'),
        |                                  s -> s IN ('slow', 'spam', 'junk'))) AS BIGINT) AS hits
        |           FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN hits > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |       CAST(sum(hits) AS BIGINT) AS total_hits,
        |       CAST(count(*) - sum(CASE WHEN hits > 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS keep_rate
        |FROM h GROUP BY source ORDER BY source""".stripMargin,
    // pre-tokenizer fertility: the RE2 pattern is byte-identical to the
    // Spark side's, so token counts agree exactly
    "q123_fertility" ->
      """WITH t AS (SELECT lang,
        |             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS w,
        |             CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS tk,
        |             CAST(length(text) AS BIGINT) AS c
        |           FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(w) AS BIGINT) AS n_words,
        |       CAST(sum(tk) AS BIGINT) AS n_tokens,
        |       CAST(sum(c) AS BIGINT) AS n_chars,
        |       CAST(sum(tk) AS DOUBLE) / sum(w) AS fertility,
        |       CAST(sum(c) AS DOUBLE) / sum(tk) AS chars_per_token
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    // per-length ceil-division sums over one token-count scan; the
    // waste fractions are single IEEE divisions of exact integers
    "q124_padding_waste" ->
      """WITH n AS (SELECT CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n
        |           FROM documents),
        |g AS (SELECT CAST(unnest([64, 128, 256, 512]) AS BIGINT) AS seq_len),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n) AS BIGINT) AS n_tokens FROM n),
        |p AS (SELECT g.seq_len,
        |             CAST(sum(CAST(ceil(n / CAST(g.seq_len AS DOUBLE)) AS BIGINT)) AS BIGINT) AS padded_seqs
        |      FROM n CROSS JOIN g GROUP BY g.seq_len)
        |SELECT p.seq_len, a.n_docs, a.n_tokens, p.padded_seqs,
        |       p.padded_seqs * p.seq_len AS padded_tokens,
        |       CAST(p.padded_seqs * p.seq_len - a.n_tokens AS DOUBLE)
        |         / (p.padded_seqs * p.seq_len) AS pad_waste_frac,
        |       CAST(ceil(a.n_tokens / CAST(p.seq_len AS DOUBLE)) AS BIGINT) AS packed_seqs
        |FROM p CROSS JOIN a ORDER BY p.seq_len""".stripMargin,
    // the BUCKET gate (q133): q87's bigram-LM CTEs on the mod-5 split,
    // each ln quantized to DECIMAL(25,6) (bit-exact vs Spark — the
    // q109c discipline), the per-doc mean as one double division of
    // identical operands, terciles via the same cume_dist window and
    // the same double constants (CAST(k AS DOUBLE) / 3 — a bare k/3.0
    // risks DuckDB decimal semantics), ln ties broken by doc_id
    "q133_ccnet_buckets" ->
      """WITH tr AS (SELECT string_split_regex(trim(text), ' +') AS toks
        |            FROM documents WHERE doc_id % 5 <> 0),
        |u AS (SELECT w1, CAST(count(*) AS BIGINT) AS u
        |      FROM (SELECT unnest(toks) AS w1 FROM tr) GROUP BY w1),
        |b AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS b
        |      FROM (SELECT toks[i] AS w1, toks[i + 1] AS w2
        |            FROM tr, UNNEST(range(1, len(toks))) AS t(i))
        |      GROUP BY w1, w2),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM u),
        |co AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        |       FROM documents WHERE doc_id % 5 = 0),
        |dbc AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
        |        FROM (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |              FROM co, UNNEST(range(1, len(toks))) AS t(i))
        |        GROUP BY doc_id, w1, w2),
        |j AS (SELECT dbc.doc_id, dbc.c,
        |        CAST(ln((COALESCE(b.b, 0) + 1.0) / (COALESCE(u.u, 0) + 1.0 * v.v))
        |          AS DECIMAL(25,6)) * CAST(dbc.c AS DECIMAL(10,0)) AS wlp
        |      FROM dbc LEFT JOIN b ON b.w1 = dbc.w1 AND b.w2 = dbc.w2
        |               LEFT JOIN u ON u.w1 = dbc.w1, v),
        |lm AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |              CAST(CAST(sum(wlp) AS DECIMAL(38,6)) AS DOUBLE)
        |                / CAST(sum(c) AS BIGINT) AS logprob
        |       FROM j GROUP BY doc_id),
        |s AS (SELECT lm.doc_id, d.lang, lm.n_bigrams,
        |             cume_dist() OVER (PARTITION BY d.lang
        |               ORDER BY lm.logprob DESC, lm.doc_id) AS cd
        |      FROM lm JOIN (SELECT doc_id, lang FROM documents
        |                    WHERE doc_id % 5 = 0) d USING (doc_id))
        |SELECT doc_id, lang, n_bigrams,
        |       CASE WHEN cd <= CAST(1 AS DOUBLE) / 3 THEN 'head'
        |            WHEN cd <= CAST(2 AS DOUBLE) / 3 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM s ORDER BY doc_id""".stripMargin,
    // q59's quality/decontamination/dedup CTEs chained with q87's LM
    // CTEs (gated in DECIMAL) and q88's vocab CTEs (gated in integers)
    "q89_ccnet_pipeline" ->
      """WITH tq AS (SELECT doc_id, text, string_split_regex(trim(text), ' +') AS toks
        |            FROM documents WHERE doc_id % 97 <> 0),
        |g2 AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS gram
        |       FROM tq, UNNEST(range(1, len(toks))) AS u(i)),
        |c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
        |rep AS (SELECT doc_id,
        |          CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) / sum(cnt) AS dup2
        |        FROM c2 GROUP BY doc_id),
        |qual AS (SELECT t.doc_id, t.text, t.toks, len(t.toks) AS n_tokens, rep.dup2
        |         FROM tq t JOIN rep USING (doc_id)
        |         WHERE len(t.toks) >= 20 AND rep.dup2 <= 0.2),
        |tr AS (SELECT string_split_regex(trim(text), ' +') AS toks
        |       FROM documents WHERE doc_id % 7 = 0),
        |u AS (SELECT w1, CAST(count(*) AS BIGINT) AS u
        |      FROM (SELECT unnest(toks) AS w1 FROM tr) GROUP BY w1),
        |b AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS b
        |      FROM (SELECT toks[i] AS w1, toks[i + 1] AS w2
        |            FROM tr, UNNEST(range(1, len(toks))) AS t(i))
        |      GROUP BY w1, w2),
        |v AS (SELECT count(*) AS v FROM u),
        |dbc AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
        |        FROM (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |              FROM qual, UNNEST(range(1, len(toks))) AS t(i))
        |        GROUP BY doc_id, w1, w2),
        |j AS (SELECT dbc.doc_id, dbc.c,
        |        CAST(ln((COALESCE(b.b, 0) + 1.0) / (COALESCE(u.u, 0) + 1.0 * v.v))
        |          AS DECIMAL(25,6)) * CAST(dbc.c AS DECIMAL(10,0)) AS wlp
        |      FROM dbc LEFT JOIN b ON b.w1 = dbc.w1 AND b.w2 = dbc.w2
        |               LEFT JOIN u ON u.w1 = dbc.w1, v),
        |lm AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |              CAST(sum(wlp) AS DECIMAL(38,6)) AS logprob_sum
        |       FROM j GROUP BY doc_id
        |       HAVING CAST(sum(wlp) AS DECIMAL(38,6))
        |                >= CAST(-3.55 AS DECIMAL(9,6)) * CAST(sum(c) AS BIGINT)),
        |vg AS (SELECT token, count(*) AS tf
        |       FROM (SELECT unnest(toks) AS token FROM tr) GROUP BY token),
        |vv AS (SELECT token FROM (
        |         SELECT token, row_number() OVER (ORDER BY tf DESC, token) AS rn
        |         FROM vg)
        |       WHERE rn <= 20),
        |d AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
        |      FROM (SELECT doc_id, unnest(toks) AS token FROM qual)
        |      GROUP BY doc_id, token),
        |oov AS (SELECT doc_id,
        |          CAST(sum(CASE WHEN vv.token IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov
        |        FROM d LEFT JOIN vv ON vv.token = d.token
        |        GROUP BY doc_id
        |        HAVING sum(CASE WHEN vv.token IS NULL THEN c ELSE 0 END) * 8 <= sum(c) * 3),
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
        |filtered AS (SELECT q.doc_id, q.text, q.n_tokens, q.dup2,
        |                    lm.n_bigrams, oov.n_oov
        |             FROM qual q JOIN lm USING (doc_id) JOIN oov USING (doc_id)
        |             WHERE NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = q.doc_id)),
        |surv AS (SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |         FROM filtered)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, dup2 AS dup_2gram_frac,
        |       n_bigrams, n_oov
        |FROM surv WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    // bit-length bucket via bin() string length — exact integers on
    // both engines; fill_rate is one exact int-division double
    "q96_length_buckets" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n
        |           FROM documents),
        |b AS (SELECT CAST(length(bin(n)) AS INTEGER) AS bucket, n FROM t)
        |SELECT bucket,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n) AS BIGINT) AS sum_tokens,
        |       CAST(max(n) AS BIGINT) AS max_tokens,
        |       CAST(count(*) * max(n) - sum(n) AS BIGINT) AS padded_waste,
        |       CAST(sum(n) AS DOUBLE) / (count(*) * max(n)) AS fill_rate
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q88_oov_rate" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
        |           FROM documents),
        |g AS (SELECT token, count(*) AS tf FROM t GROUP BY token),
        |v AS (SELECT token FROM (
        |        SELECT token, row_number() OVER (ORDER BY tf DESC, token) AS rn
        |        FROM g)
        |      WHERE rn <= 100),
        |d AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
        |      FROM t GROUP BY doc_id, token)
        |SELECT d.doc_id,
        |       CAST(sum(d.c) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN v.token IS NULL THEN d.c ELSE 0 END) AS BIGINT) AS n_oov,
        |       CAST(sum(CASE WHEN v.token IS NULL THEN d.c ELSE 0 END) AS DOUBLE)
        |         / sum(d.c) AS oov_rate
        |FROM d LEFT JOIN v ON v.token = d.token
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    // integer-only gate (the q87 discipline): n_tokens + the exact
    // per-class model-count dot product pin the NB join; the ln score
    // is rows-only on q109b
    "q109_nb_classifier" ->
      """WITH tr AS (SELECT lang, string_split_regex(trim(text), ' +') AS toks
        |            FROM documents WHERE doc_id % 10 <> 0),
        |m AS (SELECT lang AS label, t AS token, CAST(count(*) AS BIGINT) AS cnt
        |      FROM (SELECT lang, unnest(toks) AS t FROM tr) GROUP BY 1, 2),
        |d AS (SELECT doc_id, t AS token, CAST(count(*) AS BIGINT) AS c
        |      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS t
        |            FROM documents) GROUP BY 1, 2),
        |cls AS (SELECT DISTINCT lang AS label FROM tr),
        |j AS (SELECT d.doc_id, cls.label, d.c,
        |        CAST(d.c AS DECIMAL(19,0)) *
        |          CAST(COALESCE(m.cnt, 0) AS DECIMAL(19,0)) AS ch
        |      FROM d CROSS JOIN cls
        |      LEFT JOIN m ON m.label = cls.label AND m.token = d.token)
        |SELECT doc_id, label, CAST(sum(c) AS BIGINT) AS n_tokens,
        |       CAST(sum(ch) AS BIGINT) AS model_hits
        |FROM j GROUP BY doc_id, label
        |ORDER BY doc_id, label""".stripMargin,
    // the ARGMAX gate (q109c): reproduces nbScore's quantized-decimal
    // arithmetic — each ln cast to DECIMAL(25,6), multiplied by the
    // exact token count, decimal-summed, prior added — so scores agree
    // exactly cross-engine unless an ln lands within a ulp of a 5e-7
    // boundary (none on these fixtures; see q109c's scaladoc). IEEE op
    // order mirrors Classify.nbScore operand-for-operand.
    "q109c_nb_argmax" ->
      """WITH tr AS (SELECT lang, string_split_regex(trim(text), ' +') AS toks
        |            FROM documents WHERE doc_id % 10 <> 0),
        |m AS (SELECT lang AS label, t AS token, CAST(count(*) AS BIGINT) AS cnt
        |      FROM (SELECT lang, unnest(toks) AS t FROM tr) GROUP BY 1, 2),
        |ct AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tot FROM m GROUP BY 1),
        |cd AS (SELECT lang AS label, CAST(count(*) AS BIGINT) AS nd
        |       FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS vs FROM m),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nt
        |      FROM documents WHERE doc_id % 10 <> 0),
        |d AS (SELECT doc_id, t AS token, CAST(count(*) AS BIGINT) AS c
        |      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS t
        |            FROM documents) GROUP BY 1, 2),
        |j AS (SELECT d.doc_id, ct.label, d.c,
        |        CAST(ln((COALESCE(m.cnt, 0) + 1.0) / (ct.tot + 1.0 * v.vs))
        |             AS DECIMAL(25,6)) * CAST(d.c AS DECIMAL(10,0)) AS wl
        |      FROM d CROSS JOIN ct CROSS JOIN v
        |      LEFT JOIN m ON m.label = ct.label AND m.token = d.token),
        |p AS (SELECT cd.label,
        |        CAST(ln(CAST(cd.nd AS DOUBLE) / n.nt) AS DECIMAL(25,6)) AS lp
        |      FROM cd CROSS JOIN n),
        |s AS (SELECT j.doc_id, j.label, CAST(sum(j.c) AS BIGINT) AS n_tokens,
        |        sum(j.wl) + any_value(p.lp) AS sc
        |      FROM j JOIN p USING (label) GROUP BY j.doc_id, j.label)
        |SELECT doc_id, label AS predicted, n_tokens
        |FROM (SELECT doc_id, label, n_tokens,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, label) AS rn
        |      FROM s)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // integer-only gate: no transcendental in any hashed column — the
    // count dot products pin the joined model counts exactly
    "q87_lm_score" ->
      """WITH tr AS (SELECT string_split_regex(trim(text), ' +') AS toks
        |            FROM documents WHERE doc_id % 5 <> 0),
        |u AS (SELECT w1, CAST(count(*) AS BIGINT) AS u
        |      FROM (SELECT unnest(toks) AS w1 FROM tr) GROUP BY w1),
        |b AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS b
        |      FROM (SELECT toks[i] AS w1, toks[i + 1] AS w2
        |            FROM tr, UNNEST(range(1, len(toks))) AS t(i))
        |      GROUP BY w1, w2),
        |sc AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |       FROM documents WHERE doc_id % 5 = 0),
        |dbc AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
        |        FROM (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |              FROM sc, UNNEST(range(1, len(toks))) AS t(i))
        |        GROUP BY doc_id, w1, w2),
        |j AS (SELECT dbc.doc_id, dbc.c,
        |        CAST(dbc.c AS DECIMAL(19,0)) * CAST(COALESCE(b.b, 0) AS DECIMAL(19,0)) AS cb,
        |        CAST(dbc.c AS DECIMAL(19,0)) * CAST(COALESCE(u.u, 0) AS DECIMAL(19,0)) AS cu
        |      FROM dbc LEFT JOIN b ON b.w1 = dbc.w1 AND b.w2 = dbc.w2
        |               LEFT JOIN u ON u.w1 = dbc.w1)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |       CAST(sum(cb) AS BIGINT) AS bigram_hits,
        |       CAST(sum(cu) AS BIGINT) AS unigram_hits
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q85_token_budget" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |q AS (SELECT doc_id,
        |        CASE WHEN toks[1] = '' THEN 0.0 ELSE (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
        |          + (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3
        |          + (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.2 END AS quality,
        |        CAST(len(toks) AS BIGINT) AS n_tokens
        |      FROM t),
        |c AS (SELECT doc_id, quality, n_tokens,
        |        CAST(COALESCE(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |      FROM q)
        |SELECT doc_id, quality, n_tokens, tokens_before FROM c
        |WHERE tokens_before < 5000
        |ORDER BY doc_id""".stripMargin,
    // q102's release diff → delta selection → the q90 quality formula →
    // exact-dedup-then-anti-join vs the carried corpus fingerprints
    "q107_release_delta" ->
      """WITH b AS (SELECT doc_id, md5(text) AS f FROM documents
        |           WHERE doc_id % 3 <> 0),
        |a AS (SELECT doc_id,
        |        CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |      FROM documents WHERE doc_id % 5 <> 0),
        |af AS (SELECT doc_id, text, md5(text) AS f FROM a),
        |st AS (SELECT COALESCE(b.doc_id, af.doc_id) AS doc_id,
        |         CASE WHEN b.doc_id IS NULL THEN 'added'
        |              WHEN af.doc_id IS NULL THEN 'removed'
        |              WHEN af.f = b.f THEN 'unchanged'
        |              ELSE 'changed' END AS status
        |       FROM b FULL OUTER JOIN af ON af.doc_id = b.doc_id),
        |delta AS (SELECT af.doc_id, af.text, st.status
        |          FROM af JOIN st USING (doc_id)
        |          WHERE st.status IN ('added', 'changed')),
        |carried AS (SELECT af.text FROM af JOIN st USING (doc_id)
        |            WHERE st.status = 'unchanged'),
        |g AS (SELECT doc_id, text, status,
        |        string_split_regex(trim(text), ' +') AS toks
        |      FROM delta),
        |q AS (SELECT doc_id, text, status FROM g
        |      WHERE CASE WHEN toks[1] = '' THEN 0.0 ELSE (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
        |          + (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3
        |          + (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.2 END >= 0.5),
        |ex AS (SELECT doc_id, text, status,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |       FROM q)
        |SELECT doc_id, status FROM ex
        |WHERE rn = 1 AND md5(text) NOT IN (SELECT md5(text) FROM carried)
        |ORDER BY doc_id""".stripMargin,
    // the q90 quality formula against the length label over a cutoff
    // grid; all rates divide exact integer confusion counts
    "q104_gate_calibration" ->
      """WITH t AS (SELECT doc_id, n_chars >= 300 AS label,
        |             string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |q AS (SELECT doc_id, label,
        |        CASE WHEN toks[1] = '' THEN 0.0 ELSE (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
        |          + (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3
        |          + (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.2 END AS quality
        |      FROM t),
        |c AS (SELECT unnest([0.45, 0.5, 0.55, 0.62]) AS cutoff),
        |j AS (SELECT c.cutoff,
        |        CAST(sum(CASE WHEN label AND quality >= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |        CAST(sum(CASE WHEN NOT label AND quality >= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |        CAST(sum(CASE WHEN label AND quality < cutoff THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |        CAST(sum(CASE WHEN NOT label AND quality < cutoff THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |      FROM q, c GROUP BY c.cutoff)
        |SELECT cutoff, tp, fp, fn, tn,
        |       CASE WHEN tp + fp <> 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
        |       CASE WHEN tp + fn <> 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
        |       CASE WHEN 2*tp + fp + fn <> 0 THEN CAST(2*tp AS DOUBLE) / (2*tp + fp + fn) END AS f1,
        |       CASE WHEN tp + fp + fn + tn <> 0 THEN CAST(tp + fp AS DOUBLE) / (tp + fp + fn + tn) END AS keep_rate
        |FROM j ORDER BY cutoff""".stripMargin,
    // both releases rebuilt in SQL, full-outer joined on id, fingerprints
    // compared — the same md5 the Spark side computes
    // q133b: tercile sizes from per-language counts alone — rank ≤ n/3
    // ⟺ rank ≤ floor(n/3) and the cume_dist double comparison sits
    // ≫ ulp from the boundary for any n here, so the counts are exact
    // without touching the ln ordering. Docs without a bigram never
    // enter the scored frame (the len ≥ 2 filter — vacuous at sf0.01).
    "q133b_ccnet_bucket_counts" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents
        |           WHERE doc_id % 5 = 0
        |             AND len(string_split_regex(trim(text), ' +')) >= 2
        |           GROUP BY lang),
        |b AS (
        |  SELECT lang, 'head' AS bucket, n // 3 AS n_docs FROM c
        |  UNION ALL
        |  SELECT lang, 'middle' AS bucket, (2*n) // 3 - n // 3 AS n_docs FROM c
        |  UNION ALL
        |  SELECT lang, 'tail' AS bucket, n - (2*n) // 3 AS n_docs FROM c)
        |SELECT lang, bucket, n_docs FROM b WHERE n_docs > 0
        |ORDER BY lang, bucket""".stripMargin,
    // q142: rank-based discrete percentiles — smallest value whose
    // cume_dist reaches p; both engines derive cd as rank/n of the
    // same integers, and the p literals parse to identical doubles.
    "q142_length_percentiles" ->
      """WITH v AS (SELECT source,
        |             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT source, n,
        |             cume_dist() OVER (PARTITION BY source ORDER BY n) AS cd
        |      FROM v)
        |SELECT source,
        |       min(CASE WHEN cd >= 0.5 THEN n END) AS p50,
        |       min(CASE WHEN cd >= 0.9 THEN n END) AS p90,
        |       min(CASE WHEN cd >= 0.99 THEN n END) AS p99
        |FROM c
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    // q139: q102's diff CTEs rolled up by source; counts are integers,
    // churn_rate a single division.
    "q139_release_churn" ->
      """WITH b AS (SELECT doc_id, md5(text) AS f FROM documents
        |           WHERE doc_id % 3 <> 0),
        |a AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS f
        |      FROM documents WHERE doc_id % 5 <> 0),
        |d AS (SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
        |             CASE WHEN b.doc_id IS NULL THEN 'added'
        |                  WHEN a.doc_id IS NULL THEN 'removed'
        |                  WHEN a.f = b.f THEN 'unchanged'
        |                  ELSE 'changed' END AS status
        |      FROM b FULL OUTER JOIN a ON a.doc_id = b.doc_id)
        |SELECT s.source,
        |       count(*) AS n_docs,
        |       CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |       CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |       CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |       CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
        |       CAST(count(*) - sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS churn_rate
        |FROM d JOIN documents s ON s.doc_id = d.doc_id
        |GROUP BY s.source
        |ORDER BY s.source""".stripMargin,
    "q102_snapshot_diff" ->
      """WITH b AS (SELECT doc_id, md5(text) AS f FROM documents
        |           WHERE doc_id % 3 <> 0),
        |a AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS f
        |      FROM documents WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
        |       CASE WHEN b.doc_id IS NULL THEN 'added'
        |            WHEN a.doc_id IS NULL THEN 'removed'
        |            WHEN a.f = b.f THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM b FULL OUTER JOIN a ON a.doc_id = b.doc_id
        |ORDER BY doc_id""".stripMargin,
    // exact-regime check: distinct tokens ≪ the 1024-counter capacity,
    // so the Misra-Gries estimates equal the true counts
    "q101_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split_regex(trim(text), ' +')) AS token
        |           FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS est_count
        |FROM t GROUP BY token
        |ORDER BY est_count DESC, token LIMIT 20""".stripMargin,
    "q60_vocab_topk" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
        |           FROM documents),
        |g AS (SELECT token, CAST(count(*) AS BIGINT) AS tf,
        |             CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        |      FROM t GROUP BY token)
        |SELECT token, tf, doc_freq FROM g
        |ORDER BY tf DESC, token LIMIT 100""".stripMargin,
    "q61_sequence_packing" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT doc_id, n,
        |        CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
        |      FROM t)
        |SELECT doc_id, n AS n_tokens, s AS start_offset,
        |       s // 512 AS seq_first, (s + n - 1) // 512 AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin,
    // q61's prefix-sum CTEs exploded per touched sequence: each row is a
    // document's token span inside one fixed-512 sequence
    "q97_example_carve" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT doc_id, n,
        |        CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
        |      FROM t),
        |e AS (SELECT doc_id, n, s,
        |        unnest(generate_series(s // 512, (s + n - 1) // 512)) AS seq_id
        |      FROM c WHERE n > 0)
        |SELECT seq_id, doc_id,
        |       GREATEST(s, seq_id * 512) - s AS doc_from,
        |       LEAST(s + n, (seq_id + 1) * 512) - GREATEST(s, seq_id * 512) AS seg_len
        |FROM e ORDER BY seq_id, doc_id""".stripMargin,
    "q80_incremental_dedup_bloom" ->
      """WITH b AS (SELECT doc_id, lang, n_chars, md5(text) AS fp,
        |             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |           FROM documents WHERE doc_id % 3 = 0),
        |c AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0)
        |SELECT doc_id, lang, n_chars FROM b
        |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM c)
        |ORDER BY doc_id""".stripMargin,
    "q62_incremental_dedup" ->
      """WITH b AS (SELECT doc_id, lang, n_chars, md5(text) AS fp,
        |             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |           FROM documents WHERE doc_id % 3 = 0),
        |c AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0)
        |SELECT doc_id, lang, n_chars FROM b
        |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM c)
        |ORDER BY doc_id""".stripMargin,
    "q63_quality_quantile" ->
      """WITH t AS (SELECT doc_id, lang, text, string_split_regex(trim(text), ' +') AS toks
        |           FROM documents),
        |q AS (SELECT doc_id, lang,
        |        CASE WHEN toks[1] = '' THEN 0.0 ELSE (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
        |          + (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and','is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3
        |          + (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.2 END AS quality
        |      FROM t),
        |cd AS (SELECT lang, quality,
        |         cume_dist() OVER (PARTITION BY lang ORDER BY quality) AS cd
        |       FROM q),
        |th AS (SELECT lang, min(quality) AS th FROM cd WHERE cd >= 0.5 GROUP BY lang)
        |SELECT q.doc_id, q.lang, q.quality
        |FROM q JOIN th ON q.lang = th.lang
        |WHERE q.quality >= th.th
        |ORDER BY q.doc_id""".stripMargin,
    "q64_column_profile" ->
      """SELECT 'l_quantity' AS col_name, count(l_quantity) AS n_nonnull,
        |       count(*) - count(l_quantity) AS n_null,
        |       count(DISTINCT l_quantity) AS n_distinct,
        |       min(CAST(l_quantity AS DOUBLE)) AS min_d,
        |       max(CAST(l_quantity AS DOUBLE)) AS max_d,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) / count(l_quantity) AS avg_d
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(l_extendedprice),
        |       count(*) - count(l_extendedprice), count(DISTINCT l_extendedprice),
        |       min(CAST(l_extendedprice AS DOUBLE)), max(CAST(l_extendedprice AS DOUBLE)),
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) / count(l_extendedprice)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', count(l_discount),
        |       count(*) - count(l_discount), count(DISTINCT l_discount),
        |       min(CAST(l_discount AS DOUBLE)), max(CAST(l_discount AS DOUBLE)),
        |       CAST(sum(CAST(l_discount AS DECIMAL(38,12))) AS DOUBLE) / count(l_discount)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', count(l_returnflag),
        |       count(*) - count(l_returnflag), count(DISTINCT l_returnflag),
        |       min(CAST(length(l_returnflag) AS DOUBLE)), max(CAST(length(l_returnflag) AS DOUBLE)),
        |       CAST(sum(CAST(length(l_returnflag) AS BIGINT)) AS DOUBLE) / count(l_returnflag)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_linestatus', count(l_linestatus),
        |       count(*) - count(l_linestatus), count(DISTINCT l_linestatus),
        |       min(CAST(length(l_linestatus) AS DOUBLE)), max(CAST(length(l_linestatus) AS DOUBLE)),
        |       CAST(sum(CAST(length(l_linestatus) AS BIGINT)) AS DOUBLE) / count(l_linestatus)
        |FROM lineitem
        |ORDER BY col_name""".stripMargin,
    "q68_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
        |           FROM documents),
        |pd AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY token, doc_id),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS doc_freq FROM pd GROUP BY token),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT pd.doc_id, pd.token, pd.tf, df.doc_freq,
        |       pd.tf * (ln(CAST(n.n + 1 AS DOUBLE) / (df.doc_freq + 1)) + 1.0) AS tfidf
        |FROM pd JOIN df USING (token), n
        |ORDER BY pd.doc_id, pd.token""".stripMargin,
    "q67_incremental_neardup" ->
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
        |         FROM k a JOIN k b ON a.band = b.band AND a.key = b.key
        |         WHERE a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0)
        |SELECT c.idA, c.idB,
        |       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
        |FROM cand c JOIN t a ON a.doc_id = c.idA JOIN t b ON b.doc_id = c.idB
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
        |ORDER BY idA, idB""".stripMargin)
}
