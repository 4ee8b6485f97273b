package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics: token frequency and document frequency,
  * the inputs to vocabulary construction, IDF weighting, and stop-list
  * derivation over a training corpus.
  *
  * Scale design: the only safe way to count a 100 TB corpus's tokens is
  * two cascaded aggregations — first by (token, doc), then by token —
  * so every exchange carries partially-combined counts, never raw token
  * occurrences. A single `groupBy(token).agg(count, countDistinct(doc))`
  * would put an expand + per-occurrence shuffle on the hot path. Top-k
  * is `TakeOrderedAndProject` (per-partition heap), never a global sort.
  */
object Vocab {

  /** Per-(token, doc) occurrence counts — the shared first aggregation
    * of every vocabulary statistic (map-side combine collapses raw
    * occurrences before the exchange).
    */
  private def perDocCounts(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("__id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("__id"))
      .agg(count(lit(1)).as("__c"))

  /** Per-token corpus statistics: `token, tf` (total occurrences) and
    * `doc_freq` (documents containing the token). Deterministic top-`k`
    * by (tf desc, token asc).
    */
  def topK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    perDocCounts(df, idCol, textCol)
      .groupBy(col("token"))
      .agg(sum(col("__c")).as("tf"), count(lit(1)).as("doc_freq"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)

  /** TF-IDF weights per (document, token): `tf` (in-document count),
    * `doc_freq`, and `tfidf = tf * (ln((N+1)/(doc_freq+1)) + 1)` (the
    * smoothed idf — never zero, defined for unseen tokens).
    *
    * Plan: the (token, doc) pre-aggregation, a token-keyed doc-freq
    * aggregate joined back on token, and a broadcast of the single-row
    * corpus count — three data-proportional equi-shuffles, nothing
    * quadratic, no driver-side collect of anything data-sized.
    */
  // ----------------------------------------------------------------- BPE

  /** BPE merge-pair training: `numMerges` rounds of "find the most
    * frequent adjacent symbol pair, merge it everywhere" (Sennrich et
    * al.), starting from characters.
    *
    * Scale design: exactly ONE Spark job — the corpus-wide distinct-word
    * count (map-side combined, the [[perDocCounts]] discipline), capped
    * at the `maxVocab` most frequent words (deterministic
    * (count desc, word) cut — the guardrail that keeps the collect
    * model-sized against a 100 TB corpus's unbounded typo/URL tail; the
    * tail's pair mass is negligible by construction). The merge loop
    * then runs DRIVER-SIDE over that word table — the standard Sennrich
    * formulation: an incremental pair-count index touching only the
    * words that contain the merged pair, with a lazy-deletion priority
    * queue for max selection. A 32k-merge vocabulary is one job plus
    * seconds of driver CPU, not 32k sequential cluster jobs (the
    * round-3 design, measured as the scale-killer it sounds like).
    * Corpus-side tokenization stays fully distributed via
    * [[segmentTokens]].
    *
    * Deterministic: ties on pair frequency break lexicographically, so
    * any cluster layout learns the identical merge table.
    *
    * @return merges in learned order (highest-frequency first)
    */
  def trainBpeMerges(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1 << 20): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .as[(String, Long)]
      .collect()
    trainBpeMergesLocal(words, numMerges)
  }

  /** Driver-side Sennrich merge loop over a (distinct word, corpus count)
    * table. Pair counts live in an index updated incrementally: merging
    * (a, b) re-counts only the words containing it, and the max pair pops
    * from a priority queue with lazy deletion (an entry is valid iff its
    * count matches the index — every count change pushes a fresh entry).
    * Cost per merge is proportional to the symbols of affected words.
    */
  private[graft] def trainBpeMergesLocal(words: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val syms: Array[Seq[String]] = words.map(_._1.map(_.toString): Seq[String])
    val cnt: Array[Long] = words.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    // word indices that contain (or once contained — stale members are
    // harmless: their dec/inc cancels) each pair
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    val changed = mutable.HashSet.empty[(String, String)]
    def bump(p: (String, String), by: Long): Unit = {
      val n = pairCount.getOrElse(p, 0L) + by
      if (n <= 0L) pairCount.remove(p) else pairCount.update(p, n)
      changed += p
    }
    def indexWord(wi: Int, by: Long): Unit = {
      val s = syms(wi)
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        bump(p, by)
        if (by > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    syms.indices.foreach(wi => indexWord(wi, cnt(wi)))
    // max-count first; ties pop lexicographically smallest (a, b)
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val ca = y._2.compareTo(x._2)
          if (ca != 0) ca else y._3.compareTo(x._3)
        }
      }
    }
    val queue = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def flushChanged(): Unit = {
      changed.foreach { p =>
        pairCount.get(p).foreach(n => queue.enqueue((n, p._1, p._2)))
      }
      changed.clear()
    }
    flushChanged()
    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    while (learned < numMerges && queue.nonEmpty) {
      val (n, a, b) = queue.dequeue()
      if (pairCount.get((a, b)).contains(n)) { // fresh entry, not stale
        merges += ((a, b))
        learned += 1
        val members = pairWords.remove((a, b)).getOrElse(mutable.BitSet.empty)
        members.foreach { wi =>
          indexWord(wi, -cnt(wi))
          syms(wi) = mergeOnce(syms(wi), a, b)
          indexWord(wi, cnt(wi))
        }
        pairCount.remove((a, b))
        changed -= ((a, b))
        flushChanged()
      }
    }
    merges.result()
  }

  /** One left-to-right merge pass: every adjacent (a, b) becomes a+b
    * (non-overlapping, leftmost-first — the standard BPE application
    * order).
    */
  private[graft] def mergeOnce(sym: Seq[String], a: String,
      b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += sym(i)
        i += 1
      }
    }
    out.result()
  }

  /** Segment a word with a learned merge table (merges applied in
    * learned order — the BPE inference rule). Driver/test reference
    * implementation; [[segmentTokens]] is the corpus-side path.
    */
  def bpeSegment(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (sym, (a, b)) => mergeOnce(sym, a, b)
    }

  /** Corpus-side BPE tokenization: flattened segmentation of every word
    * in a string-array column, via the codegen'd `graft_bpe_apply`
    * kernel. The merge table rides as a plan literal compiled once into
    * a rank map (the IVF centroid-model pattern) — scan-local, no
    * shuffle, no per-row model cost beyond hash lookups. Bit-identical
    * to flat-mapping [[bpeSegment]] (spec-pinned).
    */
  def segmentTokens(tokens: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    graft.functions.GraftFunctions.ensureRegistered()
    call_function("graft_bpe_apply", tokens,
      typedLit(merges.map { case (a, b) => Seq(a, b) }))
  }

  /** Consecutive token bigrams as exploded 2-field structs (fields "0" =
    * w1, "1" = w2). Native zip of two slices — no higher-order lambda on
    * the hot path; documents with fewer than 2 tokens vanish in the
    * explode.
    */
  private def bigrams(textCol: String) = {
    val toks = TextAnalysis.tokens(col(textCol))
    explode(arrays_zip(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1)))
  }

  /** Add-α smoothed bigram language-model scoring — the CCNet-style
    * perplexity filter: train token bigram statistics on `train`, score
    * each `corpus` document by its mean bigram log-probability
    * `ln((B(w1,w2) + α) / (U(w1) + α·V))`. Low scores mark documents
    * whose word transitions look nothing like the (clean) training
    * side — the standard LM-based quality gate.
    *
    * Scale design: the MODEL IS DATA — a corpus-trained bigram table is
    * vocab²-shaped and cannot broadcast, so scoring is an equi-join of
    * per-(doc, bigram) pre-aggregated counts against the bigram and
    * unigram tables (the [[perDocCounts]] discipline: no raw occurrence
    * ever shuffles; join keys are the bigram pair). V rides along as a
    * broadcast one-row aggregate.
    *
    * Each ln is quantized to DECIMAL(25,`lnScale`) before accumulating,
    * which makes the sum exact and partition-order independent WITHIN an
    * engine. It is NOT engine-independent at any scale: engines' `log`
    * implementations differ by ulps, and a value within that spread of a
    * 10^-lnScale rounding boundary quantizes to different decimals.
    * Measured twice: a 1e-12 quantum flipped the cross-engine hash in
    * round 3, and the 1e-6 re-quantization flipped it AGAIN in round 4
    * under the driver's engine while matching a local DuckDB 1.0.0 —
    * the spread is environment-dependent and larger than any a-priori
    * ulp model. Consequence: NEVER hash-gate a transcendental-derived
    * column cross-engine. Exact-check the integer/count basis columns
    * instead (`bigram_hits`/`unigram_hits` below fully pin the joined
    * model counts); use `logprob_sum` only for within-engine filtering
    * and for gate predicates that clear their threshold by a margin ≫
    * quantum × n_bigrams. `logprob` is the double mean for convenience.
    *
    * @return `idCol, n_bigrams, logprob_sum, logprob, bigram_hits,
    *         unigram_hits` — the last two are exact integer dot products
    *         Σ c·B(w1,w2) and Σ c·U(w1) over the doc's joined model
    *         counts (DECIMAL(38,0): overflow-safe at corpus-scale
    *         counts), cross-engine hashable. Documents with fewer than
    *         2 tokens drop out.
    */
  def bigramLogProb(corpus: DataFrame, train: DataFrame, idCol: String,
      textCol: String, alpha: Double = 1.0, lnScale: Int = 6): DataFrame = {
    val uni = train
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("__u"))
    val bi = train
      .select(bigrams(textCol).as("__p"))
      .select(col("__p")("0").as("w1"), col("__p")("1").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__b"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val docBi = corpus
      .select(col(idCol).as("__id"), bigrams(textCol).as("__p"))
      .select(col("__id"), col("__p")("0").as("w1"), col("__p")("1").as("w2"))
      .groupBy(col("__id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c"))
    val lp = log(
      (coalesce(col("__b"), lit(0L)) + alpha) /
        (coalesce(col("__u"), lit(0L)) + lit(alpha) * col("__v")))
    docBi
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      // cnt × ln(p) in DECIMAL: (25,s) × (10,0) stays exact within
      // (38,s), so the per-doc sum is identical on any partitioning
      .select(col("__id"), col("__c"),
        (lp.cast(s"decimal(25,$lnScale)") * col("__c").cast("decimal(10,0)"))
          .as("__wlp"),
        (col("__c").cast("decimal(19,0)") *
          coalesce(col("__b"), lit(0L)).cast("decimal(19,0)")).as("__cb"),
        (col("__c").cast("decimal(19,0)") *
          coalesce(col("__u"), lit(0L)).cast("decimal(19,0)")).as("__cu"))
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("n_bigrams"), sum(col("__wlp")).as("__sum"),
        sum(col("__cb")).as("bigram_hits"),
        sum(col("__cu")).as("unigram_hits"))
      .select(col("__id").as(idCol), col("n_bigrams"),
        col("__sum").as("logprob_sum"),
        (col("__sum").cast("double") / col("n_bigrams")).as("logprob"),
        col("bigram_hits"), col("unigram_hits"))
  }

  /** Vocabulary-size design sweep: token-type and occurrence coverage
    * at every candidate vocabulary size in ONE pass — the table a
    * tokenizer design review reads to pick vocab size (the coverage
    * knee), instead of re-running [[oovRate]] per candidate.
    *
    * Scale: one token-count aggregate (map-side combined), a
    * TakeOrdered top-`max(sizes)` cut (model-sized — never a global
    * window over the full vocabulary), rank assignment on the
    * model-sized frame, a broadcast rank join back to the count table
    * and a |sizes|-keyed aggregate. Integers + single divisions →
    * hash-gateable.
    *
    * @return one row per size: `vocab_size, n_types, covered_types,
    *         total_occurrences, covered_occurrences, oov_occurrences,
    *         oov_rate`
    */
  def vocabSizeSweep(df: DataFrame, textCol: String,
      sizes: Seq[Int]): DataFrame = {
    val maxSize = sizes.max
    val counts = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("__tf"))
    // top-maxSize via TakeOrdered, then ranks over the MODEL-SIZED cut
    // (a single-partition window over maxSize rows, bounded by design)
    val ranked = counts
      .orderBy(col("__tf").desc, col("token"))
      .limit(maxSize)
      .withColumn("__rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__tf").desc, col("token"))))
      .select(col("token"), col("__rank"))
    counts
      .join(broadcast(ranked), Seq("token"), "left")
      .select(col("__tf"), col("__rank"),
        explode(lit(sizes.toArray)).as("vocab_size"))
      .groupBy(col("vocab_size"))
      .agg(
        count(lit(1)).as("n_types"),
        sum(when(col("__rank") <= col("vocab_size"), 1L).otherwise(0L))
          .as("covered_types"),
        sum(col("__tf")).as("total_occurrences"),
        sum(when(col("__rank") <= col("vocab_size"), col("__tf"))
          .otherwise(0L)).as("covered_occurrences"),
        sum(when(col("__rank") <= col("vocab_size"), 0L)
          .otherwise(col("__tf"))).as("oov_occurrences"))
      .withColumn("oov_rate",
        col("oov_occurrences").cast("double") / col("total_occurrences"))
  }

  /** CCNet-style language-model buckets (Wenzek et al. 2020): each
    * language's documents split into head/middle/tail terciles by the
    * [[bigramLogProb]] mean log-probability — CCNet trains on "head",
    * reviews "middle", drops "tail". Rank-based (cume_dist with a
    * total order), so the split adapts per language instead of using a
    * global threshold that a verbose language would fail wholesale.
    *
    * Scale: the LM gate's model-as-data joins (never broadcast the
    * vocab² bigram table) plus one per-language window over doc-sized
    * rows — keyed, no single-partition sort. Deterministic within an
    * engine; the boundaries derive from ln values, so the bucket
    * column follows the q87 discipline (never hash-gated
    * cross-engine).
    *
    * @return per-document `idCol, langCol, n_bigrams, logprob, bucket`
    */
  def ccnetBuckets(corpus: DataFrame, train: DataFrame, idCol: String,
      textCol: String, langCol: String,
      alpha: Double = 1.0): DataFrame = {
    val scored = bigramLogProb(corpus, train, idCol, textCol, alpha)
      .join(corpus.select(col(idCol), col(langCol)), Seq(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col("logprob").desc, col(idCol))
    // ids break ln ties → cume_dist is rank/n, a total order per lang
    scored
      .withColumn("__cd", cume_dist().over(w))
      .select(col(idCol), col(langCol), col("n_bigrams"), col("logprob"),
        when(col("__cd") <= 1.0 / 3, "head")
          .when(col("__cd") <= 2.0 / 3, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Per-document out-of-vocabulary rate against the train side's
    * top-`vocabSize` vocabulary — the tokenizer/vocab-coverage QA run
    * before committing to a vocabulary. The vocabulary is model-sized
    * (top-k with the deterministic (tf desc, token) cut) and broadcasts;
    * the corpus contributes per-(doc, token) pre-aggregated counts, so
    * the join compares distinct tokens, never occurrences.
    *
    * @return `idCol, n_tokens, n_oov, oov_rate`
    */
  def oovRate(corpus: DataFrame, train: DataFrame, idCol: String,
      textCol: String, vocabSize: Int): DataFrame = {
    val vocab = topK(train, idCol, textCol, vocabSize)
      .select(col("token"), lit(1).as("__in"))
    perDocCounts(corpus, idCol, textCol)
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(when(col("__in").isNull, col("__c")).otherwise(lit(0L)))
          .as("n_oov"))
      .select(col("__id").as(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** RE2-compatible pre-tokenizer: runs of word characters, or single
    * non-word non-space symbols — the word-splitting stage every BPE
    * tokenizer applies before merging. No lookarounds (unlike
    * [[TextAnalysis.bpeTokens]]), so DuckDB's regexp_extract_all
    * reproduces it exactly for cross-engine hash gates.
    */
  def pretokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0))

  /** Tokenizer-fertility audit per group (language, source, …): how many
    * tokenizer units each whitespace word costs, and how many characters
    * each unit carries — the table that predicts per-language training
    * cost and flags scripts a tokenizer serves badly (fertility ≫ 1).
    * Counts use [[pretokens]]; all columns are integer sums or single
    * IEEE divisions, so the whole report hash-gates cross-engine.
    *
    * One narrow scan → one group-sized aggregate; nothing but per-group
    * sums ever shuffles.
    */
  def fertilityReport(df: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    df.select(col(groupCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("__w"),
        size(pretokens(col(textCol))).cast("long").as("__t"),
        length(col(textCol)).cast("long").as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
        sum(col("__t")).as("n_tokens"), sum(col("__c")).as("n_chars"))
      .withColumn("fertility",
        col("n_tokens").cast("double") / col("n_words"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_tokens"))

  /** [[fertilityReport]] on a REAL trained BPE segmentation: merges are
    * trained on the corpus ([[trainBpeMerges]]) and applied by the
    * codegen'd `graft_bpe_apply` kernel, then per-group subword counts
    * aggregate the same way. BPE training is not SQL-expressible (see
    * q75's oracle note) → rows-only at the gate; parity of the apply
    * kernel itself is pinned in `FunctionsSpec`.
    */
  def bpeFertilityReport(df: DataFrame, groupCol: String, textCol: String,
      numMerges: Int, maxVocab: Int = 100000): DataFrame = {
    val merges = trainBpeMerges(df, textCol, numMerges, maxVocab)
    val sub = segmentTokens(TextAnalysis.tokens(col(textCol)), merges)
    df.select(col(groupCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("__w"),
        size(sub).cast("long").as("__t"),
        length(col(textCol)).cast("long").as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
        sum(col("__t")).as("n_subwords"), sum(col("__c")).as("n_chars"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_words"))
  }

  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perDoc = perDocCounts(df, idCol, textCol)
    val docFreq = perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"))
    val total = df.agg(count(lit(1)).as("__n"))
    perDoc
      .join(docFreq, Seq("token"))
      .crossJoin(broadcast(total))
      .select(col("__id").as(idCol), col("token"), col("__c").as("tf"),
        col("doc_freq"),
        (col("__c") * (log((col("__n") + 1).cast("double") /
          (col("doc_freq") + 1)) + 1.0)).as("tfidf"))
  }
}
