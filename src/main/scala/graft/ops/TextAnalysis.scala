package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, fingerprinting.
  *
  * Everything here is a pure Catalyst expression tree over built-in
  * functions — whole-stage-codegen'd, no UDFs, no driver-side work — so a
  * scan→score→filter pipeline stays a single narrow (shuffle-free) stage
  * regardless of corpus size.
  */
object TextAnalysis {

  /** call_function on a graft_* expression, auto-registering in the
    * active session first (idempotent).
    */
  private def graftFn(name: String, args: Column*): Column =
    graft.functions.GraftFunctions.fn(name, args: _*)

  /** Whitespace tokenizer. The corpora this engine targets are
    * pre-normalized; a BPE-ish regex split is [[bpeTokens]].
    */
  def tokens(text: Column): Column = split(trim(text), " +")

  /** Canonical text form for fuzzy-exact matching: lowercase, strip
    * everything but letters/digits/whitespace, collapse whitespace runs,
    * trim. Catches the case/punctuation/spacing variants that defeat
    * byte-exact dedup but aren't worth a MinHash pass. Pure built-in
    * codegen'd expressions; both regexes are RE2-compatible so the
    * DuckDB oracle applies the identical rules.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", ""),
      "\\s+", " "))

  /** Split documents into fixed token-budget chunks with overlap — the
    * context-window preprocessing step of embedding/retrieval pipelines.
    * Chunk `i` covers tokens `[i·stride, i·stride + chunkTokens)` with
    * `stride = chunkTokens − overlapTokens`; the last chunk starts at
    * the last stride boundary before the end (no degenerate tail that
    * adds no new tokens). Pure built-in expressions (sequence explode +
    * slice) on one narrow scan; output grows by ~n_tokens/stride rows
    * per document and never shuffles.
    *
    * @return `idCol, chunk_idx, chunk_text, n_tokens` (chunk-level)
    */
  def chunkBySize(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlapTokens")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      // 1 + ceil((n - size) / stride), clamped: both engines' integer
      // division agrees after the greatest(0, _) clamp
      .withColumn("__n_chunks",
        lit(1L) + greatest(lit(0L),
          expr(s"(__n - $chunkTokens + ${stride - 1}) DIV $stride")))
      .select(col(idCol),
        explode(sequence(lit(0), (col("__n_chunks") - 1).cast("int")))
          .as("chunk_idx"),
        col("__toks"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        size(slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
          .cast("long").as("n_tokens"))
  }

  /** A BPE-flavored tokenizer: splits on word/non-word boundaries so
    * punctuation becomes its own token (regex analog of a byte-pair
    * pre-tokenizer's word splitting).
    */
  def bpeTokens(text: Column): Column =
    filter(split(text, "(?<=\\W)|(?=\\W)"), t => trim(t) =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Ratio of distinct to total tokens — low values flag boilerplate/spam. */
  def distinctTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / size(tokens(text))

  /** Mean token length in characters (single-space normalized text). */
  def avgTokenLength(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / size(tokens(text))

  /** Fraction of tokens that appear in `words`. */
  def wordSetRatio(text: Column, words: Seq[String]): Column = {
    val hits = filter(tokens(text), t => t.isin(words.map(x => x: Any): _*))
    size(hits).cast("double") / size(tokens(text))
  }

  /** Count of tokens that appear in `words`. */
  def wordSetCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(x => x: Any): _*)))

  val englishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "is", "in", "to", "it", "that")

  /** Punctuation density (sentence-structure signal for quality scoring). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", "")))
      .cast("double") / length(text)

  /** Composite quality score in [0,1]: rewards lexical diversity, a sane
    * stopword rate and mid-length tokens. Deterministic double arithmetic.
    *
    * Blank (empty/whitespace-only) text scores 0.0 explicitly: `split`
    * gives a blank document the single token `""`, so the raw composite
    * would score it 0.5 (perfect "diversity") — ABOVE genuinely
    * repetitive spam — and a gate thresholded between them would keep
    * blank docs while dropping real text. NULL text stays NULL.
    */
  def qualityScore(text: Column): Column = {
    val diversity = distinctTokenRatio(text)
    val stop = wordSetRatio(text, englishStopwords)
    val lenOk = when(tokenCount(text).between(5, 100000), lit(1.0)).otherwise(lit(0.0))
    // Blank-guard as a MULTIPLIER, not a when(...).otherwise(composite)
    // wrapper: the wrapper makes the whole composite a conditional
    // CaseWhen branch, where Spark skips subexpression elimination and
    // re-evaluates the token array per term (measured 2× on q73). The
    // multiplier keeps the composite unconditional (tokens CSE'd once);
    // null text stays null (null × anything), blank → × 0.0.
    (diversity * 0.5 + stop * 0.3 + lenOk * 0.2) *
      when(length(trim(text)) === 0, lit(0.0)).otherwise(lit(1.0))
  }

  /** Gopher's stop-word presence list (Rae et al. 2021, appendix A —
    * "contains at least 2 of the following English words: the, be, to,
    * of, and, that, have, with").
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-filter rule battery (Rae et al. 2021, appendix
    * A1.1) as ONE struct-returning expression: word-count bounds, mean
    * word length bounds, symbol-to-word ratio ('#' and '…'/'...'),
    * fraction of words with an alphabetic character, and distinct
    * stop-word presence, plus the composite `keep` decision. Thresholds
    * are parameters (the paper's defaults) so the battery can be scaled
    * to corpora with different document-length regimes.
    *
    * Every field is exact integer counting or a double division of
    * exact integers — deterministic cross-engine, so the whole report
    * (including `keep`) is hash-checkable. Narrow per-row arithmetic:
    * no shuffle, stays in whole-stage codegen.
    *
    * @return struct: `n_words, mean_word_len, symbol_ratio,
    *         alpha_word_frac, n_stop_distinct, keep`
    */
  def gopherReport(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaWordFrac: Double = 0.8,
      minDistinctStopwords: Int = 2): Column = {
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val meanLen = avgTokenLength(text)
    val nHash = length(text) - length(regexp_replace(text, "#", ""))
    val nEllipsis =
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3) +
        (length(text) - length(regexp_replace(text, "…", "")))
    val symbolRatio = (nHash + nEllipsis).cast("double") / nWords
    val alphaFrac = size(filter(toks, t => t.rlike("[A-Za-z]")))
      .cast("double") / nWords
    val stopDistinct = size(filter(array_distinct(toks),
      t => t.isin(gopherStopwords.map(x => x: Any): _*))).cast("long")
    val keep = nWords.between(minWords, maxWords) &&
      meanLen.between(minMeanWordLen, maxMeanWordLen) &&
      (symbolRatio <= maxSymbolRatio) &&
      (alphaFrac >= minAlphaWordFrac) &&
      (stopDistinct >= minDistinctStopwords)
    struct(nWords.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), alphaFrac.as("alpha_word_frac"),
      stopDistinct.as("n_stop_distinct"), keep.as("keep"))
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Order matters: ties resolve to the earlier entry.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "在", "了", "我"))

  /** Marker-count score for one language. */
  def langScore(text: Column, lang: String): Column =
    wordSetCount(text, langMarkers.toMap.apply(lang))

  /** Heuristic language ID: argmax of marker counts, first-listed language
    * wins ties (deterministic — required for oracle parity). NULL text →
    * NULL (without the guard every marker score is null, every argmax
    * condition is null, and the CASE falls through to the LAST language —
    * null rows would report as phantom "zh" in [[langConfusion]]).
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, ws) => l -> wordSetCount(text, ws) }
    val branches = scores.zipWithIndex.map { case ((l, s), i) =>
      val geAll = scores.drop(i + 1)
        .map { case (_, other) => s >= other }
        .foldLeft(lit(true))(_ && _)
      (l, geAll)
    }
    // Null-guard via the FINAL branch (`WHEN s_zh IS NOT NULL THEN 'zh'`,
    // no ELSE → null on null text) instead of wrapping the whole argmax
    // in when(text.isNull, …): a wrapper makes every marker count a
    // conditional CaseWhen branch, where Spark skips subexpression
    // elimination — split(trim(text)) would re-evaluate per marker set
    // (measured 2× on q23). Here the first branch's condition stays
    // unconditional, so the shared token array is CSE'd as before.
    branches.init.foldRight(
        when(scores.last._2.isNotNull, lit(branches.last._1))) {
      case ((l, cond), els) => when(cond, lit(l)).otherwise(els)
    }
  }

  /** Language-ID confusion matrix: declared language label vs the
    * [[langId]] prediction, with each cell's exact share of its
    * declared language — the audit that catches mislabeled sources
    * before a language-filtered training mix trusts the metadata
    * column. One bounded-key groupBy shuffle (at most |langs|² cells,
    * map-side combined); `share` divides exact integer counts once, so
    * every column is hash-gateable cross-engine.
    *
    * @return `lang, pred_lang, n_docs, share` — `share` = cell count /
    *         declared-language total
    */
  def langConfusion(df: DataFrame, langCol: String,
      textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
    df.groupBy(col(langCol).as("lang"), langId(col(textCol)).as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("lang"), col("pred_lang"), col("n_docs"),
        (col("n_docs").cast("double") / sum(col("n_docs")).over(w))
          .as("share"))
  }

  /** PII redaction rules: (pattern, replacement), applied in order.
    * Patterns are RE2-compatible (no lookaround/backreferences) so the
    * same rules run identically on Spark (java.util.regex) and any
    * RE2-based engine — verified against the DuckDB oracle.
    */
  val redactionRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("\\+?\\d{10,15}", "<NUM>"))

  /** Scrub emails, IPv4 addresses, and long digit runs (phone/account
    * numbers) from a text column — a chained regexp_replace, codegen'd,
    * narrow. Extend [[redactionRules]] for deployment-specific PII.
    */
  def redact(text: Column): Column =
    redactionRules.foldLeft(text) { case (c, (pattern, repl)) =>
      regexp_replace(c, pattern, repl)
    }

  /** Word n-gram repetition statistics `[n_grams, top_count, dup_count]`
    * (the Gopher/C4-family repetition quality signals: total n-gram
    * occurrences, the most frequent n-gram's count, and occurrences
    * belonging to n-grams seen more than once). One narrow codegen'd
    * pass per row ([[graft.functions.Kernels.gramStats]]) — the
    * explode + groupBy(gram) formulation would shuffle every n-gram of
    * a 100 TB corpus to compute a per-document scalar.
    */
  def gramStats(text: Column, n: Int): Column =
    graftFn("graft_gram_stats", tokens(text), lit(n))

  /** Fraction of n-gram occurrences taken by the single most frequent
    * n-gram — high values flag template/boilerplate text.
    */
  def topGramFraction(text: Column, n: Int): Column = {
    val gs = gramStats(text, n)
    element_at(gs, 2).cast("double") / element_at(gs, 1)
  }

  /** Fraction of n-gram occurrences belonging to n-grams that repeat
    * within the document (the "duplicated n-grams" Gopher rule).
    */
  def dupGramFraction(text: Column, n: Int): Column = {
    val gs = gramStats(text, n)
    element_at(gs, 3).cast("double") / element_at(gs, 1)
  }

  /** Stable content fingerprint (hex): engine-portable md5 of the raw text. */
  /** Per-group distribution drift vs the whole corpus: the total
    * variation distance between each group's hashed-feature distribution
    * and the corpus-wide one — the monitor that answers "which source's
    * content has drifted" on a continuous ingest, where a spiking TV
    * flags a scraper change, an encoding bug, or a topic shift.
    *
    * TV(p_g, p) = ½ Σ_f |c_gf/N_g − c_f/N| is computed EXACTLY: each
    * bucket's term uses the integer numerator |c_gf·N − c_f·N_g| (a
    * DECIMAL — no float sums, so the value is identical on any
    * partitioning and cross-engine hashable), divided once by 2·N_g·N at
    * the end. Features are [[graft.ops.Sampling.hashedNgramBuckets]]
    * (unigrams + bigrams, md5 % `buckets`); everything pre-aggregates to
    * (group, bucket) counts before the one model join.
    *
    * @return `groupCol, n_features, l1_num (DECIMAL 38,0), tv (double)`
    */
  def distributionDrift(df: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 10000): DataFrame = {
    val feats = df.select(col(groupCol).as("__g"),
      explode(Sampling.hashedNgramBuckets(textCol, buckets)).as("__k"))
    val perGroup = feats.groupBy(col("__g"), col("__k"))
      .agg(count(lit(1)).as("__cg"))
    // corpus model and both totals DERIVE from the per-group counts, so
    // every consumer shares the one scan+shuffle subtree (ReusedExchange
    // collapses the repeats — PlanSpec pins a single parquet scan)
    val corpus = perGroup.groupBy(col("__k")).agg(sum(col("__cg")).as("__c"))
    val groupTotals = perGroup.groupBy(col("__g"))
      .agg(sum(col("__cg")).as("__ng"))
    val total = corpus.agg(sum(col("__c")).as("__n"))
    // a group MISSING a corpus bucket still contributes |0·N − c_f·N_g|,
    // so expand groups × corpus buckets explicitly (|groups| is
    // report-sized — sources/languages — so this is |groups|·B rows, the
    // drift table's natural size) and left-join the per-group counts in
    groupTotals.crossJoin(corpus).crossJoin(broadcast(total))
      .join(perGroup, Seq("__g", "__k"), "left")
      .select(col("__g"), col("__ng"), col("__n"),
        coalesce(col("__cg"), lit(0L)).as("__cg"),
        abs(coalesce(col("__cg"), lit(0L)).cast("decimal(19,0)")
            * col("__n").cast("decimal(19,0)")
          - col("__c").cast("decimal(19,0)") * col("__ng").cast("decimal(19,0)"))
          .as("__t"))
      .groupBy(col("__g"))
      .agg(sum(col("__cg")).as("n_features"),
        sum(col("__t")).cast("decimal(38,0)").as("l1_num"),
        max(col("__ng")).as("__ng2"), max(col("__n")).as("__n2"))
      .select(col("__g").as(groupCol), col("n_features"),
        col("l1_num"),
        (col("l1_num").cast("double") /
          (lit(2.0) * col("__ng2").cast("double") * col("__n2").cast("double")))
          .as("tv"))
  }

  /** [[distributionDrift]] against a FIXED reference model (bucket
    * counts from [[graft.ops.Sampling.importanceModel]]) — the form a
    * continuous ingest runs, where the reference is fit once and every
    * batch's distance to it is one small aggregate. Same exact-integer
    * L1 numerator, so batch drift numbers are comparable across runs
    * and layouts.
    *
    * @return one row: `n_features, l1_num (DECIMAL 38,0), tv (double)`
    */
  def driftAgainstModel(batch: DataFrame, refModel: DataFrame,
      buckets: Int = 10000): DataFrame = {
    // refModel: (__k, __cnt); batch side pre-aggregates to its own
    // bucket counts, then the full-outer join covers buckets either
    // side is missing
    val bm = batch
      .groupBy(col("__k")).agg(count(lit(1)).as("__cb"))
    val joined = bm
      .join(refModel.select(col("__k"), col("__cnt").as("__cr")),
        Seq("__k"), "full_outer")
      .select(coalesce(col("__cb"), lit(0L)).as("__cb"),
        coalesce(col("__cr"), lit(0L)).as("__cr"))
    val totals = joined
      .agg(sum(col("__cb")).as("__nb"), sum(col("__cr")).as("__nr"))
    joined.crossJoin(broadcast(totals))
      .select(col("__nb"), col("__nr"),
        abs(col("__cb").cast("decimal(19,0)") * col("__nr").cast("decimal(19,0)")
          - col("__cr").cast("decimal(19,0)") * col("__nb").cast("decimal(19,0)"))
          .as("__t"))
      .agg(max(col("__nb")).as("n_features"),
        sum(col("__t")).cast("decimal(38,0)").as("l1_num"),
        max(col("__nr")).as("__nr2"))
      .select(col("n_features"), col("l1_num"),
        (col("l1_num").cast("double") /
          (lit(2.0) * col("n_features").cast("double") * col("__nr2").cast("double")))
          .as("tv"))
  }

  /** [[driftAgainstModel]] from raw text: hash the batch's features with
    * the same bucketing as the reference model.
    */
  def textDriftAgainstModel(batch: DataFrame, textCol: String,
      refModel: DataFrame, buckets: Int = 10000): DataFrame =
    driftAgainstModel(
      batch.select(
        explode(Sampling.hashedNgramBuckets(textCol, buckets)).as("__k")),
      refModel, buckets)

  def contentFingerprint(text: Column): Column = md5(text)

  /** 64-bit rolling fingerprint over the token stream:
    * `h = xxhash64(h, token)` — order-sensitive, so reordered
    * near-identical documents fingerprint differently (unlike a set hash).
    * (A chained hash rather than `h*31+x`: ANSI mode forbids the
    * wraparound multiply.)
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))
}
