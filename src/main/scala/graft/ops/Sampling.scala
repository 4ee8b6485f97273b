package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training-data pipelines.
  *
  * `Dataset.sample` draws per-partition with a seeded RNG, so its
  * output changes whenever partitioning, file order, or cluster layout
  * changes — unacceptable for reproducible train/validation splits at
  * 100 TB. Hash sampling decides per ROW from a key column: the same
  * row lands in the same split on any cluster, any layout, any day,
  * and new data joins splits in the same proportions. Pure codegen'd
  * expressions — a narrow filter, no shuffle, no RNG state.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform pseudo-random bucket in [0, 1e6) from the key (+ salt to
    * decorrelate independent samples over the same key).
    */
  def hashBucket(key: Column, salt: Int = 0): Column =
    pmod(xxhash64(key, lit(salt)), lit(Buckets))

  /** Keep ≈`fraction` of rows, chosen deterministically by key hash.
    * Selections for nested fractions are monotone: the 1% sample is a
    * subset of the 10% sample (same salt).
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: Int = 0): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.where(hashBucket(col(keyCol), salt) < (fraction * Buckets).toLong)
  }

  /** md5-basis bucket in [0, 1e6): like [[hashBucket]] but reproducible
    * in the DuckDB oracle (`('0x' || substr(md5(salt || ':' || key),
    * 1, 15))::BIGINT % 1000000`). Pure built-in codegen expressions.
    */
  def md5Bucket(key: Column, salt: String): Column =
    pmod(
      conv(substring(md5(encode(
          concat(lit(salt + ":"), key.cast("string")), "UTF-8")), 1, 15),
        16, 10).cast("long"),
      lit(Buckets))

  /** Deterministic per-stratum cap: keep the `n` rows of each `keyCol`
    * group that sort first by md5(orderCol) — a reproducible "take at
    * most n per class" for balancing training corpora. One shuffle on
    * the stratum key; the per-group window sort is bounded by the
    * stratum size (for mega-strata at 100 TB, pre-thin with
    * [[hashSample]] first — the nested-monotone property keeps the
    * final selection stable).
    */
  def stratifiedTake(df: DataFrame, keyCol: String, orderCol: String,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(md5(encode(col(orderCol).cast("string"), "UTF-8")), col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Weighted corpus mixture: subsample each named source to its
    * fraction (decided per row by [[md5Bucket]] salted with the source
    * name, so sources sharing keys stay independent) and union by name
    * with a `source` tag — the deterministic mixing step in front of
    * training-data interleaving. Narrow per-source filters + union: no
    * shuffle, reproducible on any layout.
    */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)],
      keyCol: String): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    sources.map { case (name, df, frac) =>
      require(frac >= 0 && frac <= 1, s"fraction out of range: $frac")
      df.where(md5Bucket(col(keyCol), name) < (frac * Buckets).toLong)
        .withColumn("source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Quality-weighted resampling: keep each row with probability
    * `weight` (a per-row column in [0,1], e.g. a normalized quality
    * score or a temperature-scaled domain weight), decided
    * deterministically by the key's md5 bucket — the reproducible
    * analog of "sample proportionally to quality" used to up-weight
    * good documents in a training mix. Rows with weight ≥ 1 always
    * survive, ≤ 0 never. Narrow filter, no shuffle, layout-independent,
    * and oracle-expressible (md5 basis).
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
      salt: String = "w"): DataFrame =
    df.where(md5Bucket(col(keyCol), salt).cast("double") <
      weight.cast("double") * Buckets)

  /** Deterministic global shuffle — reproducible "random" training
    * order. Each row gets `shuffle_key` = md5(salt:key) and the output
    * is totally ordered by it (key as tiebreak), so the permutation is
    * produced by Spark's range-partitioned sort — the same scale-safe
    * machinery as any ORDER BY, no RNG state, no single-partition
    * window. Same salt → bit-identical epoch order on any cluster
    * layout; a fresh salt per epoch → independent permutations. Oracle-
    * expressible (md5 basis).
    */
  def shuffleDeterministic(df: DataFrame, keyCol: String,
      salt: String): DataFrame =
    df.withColumn("shuffle_key",
        md5(encode(concat(lit(salt + ":"), col(keyCol).cast("string")),
          "UTF-8")))
      .orderBy(col("shuffle_key"), col(keyCol))

  /** Curriculum training order: rows banded by descending `cutoffs`
    * over a score column (band 0 = score ≥ cutoffs(0) — the best
    * material first; the final band catches everything below the last
    * cutoff), then deterministically shuffled WITHIN each band with
    * [[shuffleDeterministic]]'s salted md5 key. Sorting by
    * `(band, shuffle_key)` IS the curriculum epoch order — produced by
    * Spark's range-partitioned sort, no single-partition window, and
    * bit-reproducible on any layout (fresh salt per epoch re-shuffles
    * within bands while the curriculum skeleton stays fixed). Explicit
    * cutoffs keep the banding engine-exact; derive them from
    * [[graft.ops.Quantiles]] when quantile bands are wanted.
    */
  def curriculumOrder(df: DataFrame, keyCol: String, score: Column,
      cutoffs: Seq[Double], salt: String): DataFrame = {
    require(cutoffs.nonEmpty, "at least one cutoff")
    require(cutoffs.sliding(2).forall(w => w.size < 2 || w(0) > w(1)),
      "cutoffs must be strictly descending")
    val band = cutoffs.zipWithIndex.foldRight(lit(cutoffs.length): Column) {
      case ((cut, i), els) => when(score >= cut, lit(i)).otherwise(els)
    }
    df.withColumn("band", band)
      .withColumn("shuffle_key",
        md5(encode(concat(lit(salt + ":"), col(keyCol).cast("string")),
          "UTF-8")))
      .orderBy(col("band"), col("shuffle_key"), col(keyCol))
  }

  /** Temperature-flattened group mixing (the multilingual-corpus
    * rebalancing rule): resample so group g's share moves from its
    * natural p_g = n_g/N toward q_g ∝ p_g^alpha — alpha 1 keeps natural
    * proportions, alpha 0 equalizes groups, the usual 0.2–0.7 range
    * upweights tails without flattening heads. Downsampling only: the
    * output is the LARGEST corpus with shares q_g reachable without
    * upsampling (the group forcing the bound keeps all rows, every
    * other group hash-samples down deterministically on `keyCol` — the
    * [[md5Bucket]] basis, so the selection is layout-independent and
    * oracle-reproducible).
    *
    * Scale: rates are computed IN the plan from the group-count
    * aggregate (group-count-sized — the global windows run over that
    * tiny table, never the corpus) and broadcast-joined back; the
    * corpus itself is one narrow filtered pass.
    */
  def temperatureMix(df: DataFrame, groupCol: String, keyCol: String,
      alpha: Double, salt: String = "tmix"): DataFrame = {
    require(alpha >= 0, s"alpha must be non-negative: $alpha")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val rates = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__q",
        pow(col("__n").cast("double") / sum(col("__n")).over(w), alpha))
      .withColumn("__q", col("__q") / sum(col("__q")).over(w))
      .withColumn("__s", min(col("__n") / col("__q")).over(w))
      // S = min_g n_g/q_g: the largest total size where no group needs
      // upsampling. The binding group's rate is PINNED to 1.0 by the
      // argmin comparison (exact — min returns one of the compared
      // doubles) rather than recomputed as q·S/n, whose round-trip
      // lands within an ulp of 1.0 and would flip floor(rate·1e6)
      // between engines (the q87 rounding-boundary fragility class)
      .withColumn("__rate",
        when(col("__n") / col("__q") === col("__s"), lit(1.0))
          .otherwise(least(lit(1.0),
            col("__q") * col("__s") / col("__n"))))
      // quantize to DECIMAL(10,6) — one md5 bucket — so the gate below
      // is exact integer arithmetic on both engines: a raw double rate
      // from the pow/window chain can differ cross-engine by an ulp and
      // flip floor(rate·1e6) at a bucket boundary, and a near-tied
      // argmin (rate 1-ε vs the pinned 1.0) rounds to the same
      // 1.000000 either way
      .select(col(groupCol), col("__rate").cast("decimal(10,6)").as("__rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .where(md5Bucket(col(keyCol), salt) <
        (col("__rate") * lit(Buckets)).cast("long"))
      .drop("__rate")
  }

  /** Data-constrained epoch allocation (the "how many times may each
    * source repeat" table, after Muennighoff et al. 2023: repeating
    * clean data up to ~4 epochs is near-free; beyond that returns decay):
    * given a total training token `budget`, α-temperature target shares
    * over groups, and a repetition cap, emit per group its unique token
    * count, target weight, granted epochs (`min(cap, budget·w/T)`), and
    * the effective token contribution `floor(epochs·T)`.
    *
    * Everything runs over the group-count-sized aggregate (the corpus
    * contributes one narrow counting scan); derived rates quantize to
    * DECIMAL(14,6) before any downstream arithmetic, the q92 discipline
    * that keeps the pow-chain's cross-engine ulp out of the hash gate.
    */
  def epochAllocation(df: DataFrame, groupCol: String, textCol: String,
      budgetTokens: Long, alpha: Double = 0.5,
      maxEpochs: Double = 4.0): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    require(alpha >= 0, s"alpha must be non-negative: $alpha")
    require(maxEpochs > 0, s"epoch cap must be positive: $maxEpochs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    df.select(col(groupCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__t"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
      .withColumn("__q",
        pow(col("n_tokens").cast("double") / sum(col("n_tokens")).over(w),
          alpha))
      .withColumn("weight",
        (col("__q") / sum(col("__q")).over(w)).cast("decimal(14,6)"))
      // the grant is computed in DOUBLE off the already-quantized weight
      // (decimal→double is exact; ·budget and /tokens are single IEEE
      // ops) and quantized ONCE — chained decimal ops would pick up each
      // engine's intermediate-scale rules and diverge at the 6th decimal
      .withColumn("epochs",
        least(lit(maxEpochs),
          col("weight").cast("double") * budgetTokens / col("n_tokens"))
          .cast("decimal(14,6)"))
      .withColumn("effective_tokens",
        floor(col("epochs") * col("n_tokens")).cast("long"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"), col("weight"),
        col("epochs"), col("effective_tokens"))
  }

  /** Unigram + consecutive-bigram features of `textCol`, hashed to
    * `buckets` md5 buckets — DSIR's engine-portable hashed bag of
    * n-grams. Unigrams are prefixed `u:`, bigrams `b:w1 w2`, so the two
    * feature spaces never collide on equal strings. One array expression
    * per row, fully codegen'd.
    */
  private[graft] def hashedNgramBuckets(textCol: String,
      buckets: Int): Column =
    // one-pass codegen'd kernel (r15): value-identical to the previous
    // built-in chain — transform(concat(u:/b: features),
    // pmod(conv(substring(md5(encode(f)), 1, 15), 16, 10), buckets)) —
    // whose 5 short-lived allocations per feature (feature concat, hex
    // string, substring, radix parse, cast) made the 32-thread sf1 DSIR
    // queries GC-bound (q100 21.1 s at 32 cores vs 7.2 s at 8; r15).
    // The kernel feeds the digest incrementally and emits longs
    // directly; SamplingSpec pins kernel-vs-chain equality.
    graft.functions.GraftFunctions.fn("graft_ngram_buckets",
      TextAnalysis.tokens(col(textCol)), lit(buckets))

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    * score every raw document by how much more likely its hashed n-gram
    * features are under a TARGET-domain bag-of-features model than under
    * the raw-corpus model — `log w(x) = Σ_f c_x(f)·(ln p_t(f) − ln
    * p_r(f))` with add-`alpha` smoothing over the `buckets` feature
    * buckets. Selecting by the weight ([[importanceTake]]) tilts the raw
    * corpus toward the target domain — the hashed-n-gram data-selection
    * step in front of pretraining-mix assembly.
    *
    * Scale: both models are bucket-count tables (≤ `buckets` rows each,
    * broadcastable) fit in one pre-aggregated pass per side; the corpus
    * contributes per-(doc, bucket) PRE-AGGREGATED counts, so the joins
    * move distinct features, never occurrences (the q87/q88 discipline).
    * Transcendental caveat (see [[Vocab.bigramLogProb]]): each ln is
    * quantized to DECIMAL(25,`lnScale`) before the exact decimal sum, so
    * `logw_sum` is layout-independent within an engine but is never
    * hash-gated cross-engine; the exact integer dot products
    * `target_hits`/`raw_hits` pin the joined model counts instead.
    *
    * @return `idCol, n_features, logw_sum (DECIMAL), logw (double mean),
    *         target_hits, raw_hits`; documents with zero tokens drop out.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 10000, alpha: Double = 1.0,
      lnScale: Int = 6): DataFrame =
    importanceWeightsWithModels(raw, idCol, textCol,
      importanceModel(target, textCol, buckets),
      importanceModel(raw, textCol, buckets), buckets, alpha, lnScale)

  /** One side's bag-of-hashed-n-grams model: per-bucket occurrence
    * counts (`__k`, `__cnt`), ≤ `buckets` rows. Fit once and persist (or
    * write out) when the same model scores many batches — the streaming
    * gate's steady-state shape.
    */
  def importanceModel(src: DataFrame, textCol: String,
      buckets: Int = 10000): DataFrame = src
    .select(explode(hashedNgramBuckets(textCol, buckets)).as("__k"))
    .groupBy(col("__k")).agg(count(lit(1)).as("__cnt"))

  /** [[importanceWeights]] against PRE-FIT target/raw models — the form
    * an incremental or streaming pipeline runs, where the reference
    * models are computed once (or maintained out-of-band) and every
    * scored batch only contributes its own per-(doc, bucket) counts.
    */
  def importanceWeightsWithModels(docs: DataFrame, idCol: String,
      textCol: String, tModel: DataFrame, rModel: DataFrame,
      buckets: Int = 10000, alpha: Double = 1.0,
      lnScale: Int = 6): DataFrame = {
    val totals = tModel.agg(sum(col("__cnt")).as("__nt"))
      .crossJoin(rModel.agg(sum(col("__cnt")).as("__nr")))
    val docFeats = docs
      .select(col(idCol).as("__id"),
        explode(hashedNgramBuckets(textCol, buckets)).as("__k"))
      .groupBy(col("__id"), col("__k")).agg(count(lit(1)).as("__c"))
    val lnT = log((coalesce(col("__t"), lit(0L)) + alpha) /
      (col("__nt") + lit(alpha) * buckets))
    val lnR = log((coalesce(col("__r"), lit(0L)) + alpha) /
      (col("__nr") + lit(alpha) * buckets))
    docFeats
      .join(tModel.select(col("__k"), col("__cnt").as("__t")), Seq("__k"), "left")
      .join(rModel.select(col("__k"), col("__cnt").as("__r")), Seq("__k"), "left")
      .crossJoin(broadcast(totals))
      // quantize EACH ln separately, then the exact decimal difference ×
      // count: identical on any partitioning within an engine
      .select(col("__id"), col("__c"),
        ((lnT.cast(s"decimal(25,$lnScale)") - lnR.cast(s"decimal(25,$lnScale)"))
          * col("__c").cast("decimal(10,0)")).as("__wl"),
        (col("__c").cast("decimal(19,0)") *
          coalesce(col("__t"), lit(0L)).cast("decimal(19,0)")).as("__th"),
        (col("__c").cast("decimal(19,0)") *
          coalesce(col("__r"), lit(0L)).cast("decimal(19,0)")).as("__rh"))
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("n_features"), sum(col("__wl")).as("__sum"),
        sum(col("__th")).as("target_hits"), sum(col("__rh")).as("raw_hits"))
      .select(col("__id").as(idCol), col("n_features"),
        col("__sum").as("logw_sum"),
        (col("__sum").cast("double") / col("n_features")).as("logw"),
        col("target_hits"), col("raw_hits"))
  }

  /** Greedy DSIR selection: the `k` raw documents with the highest
    * importance weight (ties to the lowest id). The paper's
    * Gumbel-resampled variant adds per-doc noise before the cut; the
    * greedy cut is the deterministic form a reproducible pipeline ships,
    * and a salted [[shuffleDeterministic]] pre-pass recovers sampling
    * diversity when wanted. TakeOrdered top-k — no global sort at scale.
    */
  def importanceTake(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 10000,
      alpha: Double = 1.0): DataFrame =
    importanceWeights(raw, target, idCol, textCol, buckets, alpha)
      .orderBy(col("logw_sum").desc, col(idCol))
      .limit(k)

  /** [[importanceTake]] with the selection ORDER made explicit — the
    * gateable form (round 11, the q121c/q109c promotion discipline):
    * `rank` plus the exact integer model dot products, no ln-derived
    * column at the boundary. Sound to hash-gate cross-engine because
    * the order key `logw_sum` is an exact DECIMAL sum of per-feature
    * lns QUANTIZED to 1e-6 before any arithmetic
    * ([[importanceWeightsWithModels]]): an oracle recomputing the same
    * quantization reproduces the sum bit-exactly unless an ln lands
    * within a ulp of a 5e-7 rounding boundary (the q109c caveat;
    * corpus-conditional — re-run the margin audit after any fixture
    * regeneration). Exact ties break to the lowest id on both engines.
    *
    * Plan shape: TakeOrdered top-k, then `row_number` over the
    * ALREADY-CUT k-row frame (a single-partition window over model-
    * sized data, bounded by construction — never over the corpus).
    */
  def importanceTakeRanked(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, k: Int, buckets: Int = 10000,
      alpha: Double = 1.0): DataFrame =
    importanceTake(raw, target, idCol, textCol, k, buckets, alpha)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("logw_sum").desc, col(idCol))))
      .select(col("rank"), col(idCol), col("n_features"),
        col("target_hits"), col("raw_hits"))

  /** Partition rows into disjoint, exhaustive splits with the given
    * weights (normalized), e.g. train/val/test = 0.9/0.05/0.05. Adds a
    * `split` column with the split index.
    */
  def hashSplit(df: DataFrame, keyCol: String, weights: Seq[Double],
      salt: Int = 0): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val cutoffs = weights.scanLeft(0.0)(_ + _).tail
      .map(w => (w / total * Buckets).toLong)
    val b = hashBucket(col(keyCol), salt)
    val splitCol = cutoffs.init.zipWithIndex.foldRight(
        lit(cutoffs.length - 1): Column) {
      case ((cut, i), els) => when(b < cut, lit(i)).otherwise(els)
    }
    df.withColumn("split", splitCol)
  }
}
