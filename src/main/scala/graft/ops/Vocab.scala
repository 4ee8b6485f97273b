package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
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
    * al.), starting from characters. The distributed object is always
    * the VOCABULARY — one corpus-wide (word, count) aggregate up front
    * (map-side combined, the [[perDocCounts]] discipline), then every
    * round is a pair-count aggregate over distinct words + a top-1
    * TakeOrdered + a narrow merge-application map. Driver state is the
    * learned merge list (`numMerges` string pairs — model-sized, the
    * [[Similarity.trainIvfCentroids]] pattern). Rounds persist the
    * current symbolization and release the previous one, like the
    * connected-components loop.
    *
    * Deterministic: ties on pair frequency break lexicographically, so
    * any cluster layout learns the identical merge table.
    *
    * @return merges in learned order (highest-frequency first)
    */
  def trainBpeMerges(df: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // (distinct word as char symbols, corpus count) — vocab-sized
    var words: Dataset[(Seq[String], Long)] = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (w.map(_.toString), n) }
    words.persist(level)
    // adjacent-pair counting stays untyped (slice+zip+explode, codegen'd,
    // map-side combined) — no per-row lambda interpretation or typed
    // round-trip; only the merge application needs a typed map
    def topPair(ws: Dataset[(Seq[String], Long)]): Array[(String, String)] =
      ws.toDF("sym", "n")
        .where(size(col("sym")) >= 2)
        .select(col("n"), explode(arrays_zip(
          slice(col("sym"), lit(1), size(col("sym")) - 1).as("l"),
          slice(col("sym"), lit(2), size(col("sym")) - 1).as("r"))).as("p"))
        .groupBy(col("p.l").as("a"), col("p.r").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
        .map(r => (r.getString(0), r.getString(1)))
    val merges = Seq.newBuilder[(String, String)]
    var prev: Dataset[(Seq[String], Long)] = null
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // the top-pair aggregate is the action that materializes this
      // round's cache; the previous round's pin is only released after it
      val top = topPair(words)
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = top.head
        merges += ((a, b))
        prev = words
        words = prev.map { case (sym, n) => (mergeOnce(sym, a, b), n) }
        words.persist(level)
      }
      round += 1
    }
    if (prev != null) prev.unpersist(blocking = false)
    words.unpersist(blocking = false)
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
    * which makes the sum exact and partition-order independent — but NOT
    * unconditionally engine-independent: JVM `Math.log` and libm `log`
    * can differ by 1 ulp (~1e-15 absolute for these magnitudes), and
    * when a value lands within an ulp of a 10^-lnScale rounding
    * boundary the two engines quantize to *different* decimals.
    * Boundary-straddle probability per distinct value is roughly
    * 1e-15 / 10^-lnScale: ~1e-3 at scale 12 (near-certain to flip a
    * hash over ~10⁴ distinct bigram probabilities — measured, round 3),
    * ~1e-9 at scale 6. The default gates at 1e-6; pass a finer scale
    * only for within-engine use where cross-engine hashing is not at
    * stake. `logprob` is the double mean for filtering convenience.
    *
    * @return `idCol, n_bigrams, logprob_sum, logprob` (documents with
    *         fewer than 2 tokens drop out)
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
          .as("__wlp"))
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("n_bigrams"), sum(col("__wlp")).as("__sum"))
      .select(col("__id").as(idCol), col("n_bigrams"),
        col("__sum").as("logprob_sum"),
        (col("__sum").cast("double") / col("n_bigrams")).as("logprob"))
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
