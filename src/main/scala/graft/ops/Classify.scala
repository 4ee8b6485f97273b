package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised document classification for corpus curation — the
  * "train a quality/domain classifier on a labeled slice, score the
  * whole corpus" step of LLM data pipelines (GPT-3 curation trained a
  * classifier against WebText as the positive class; LLaMA filtered
  * pages "classified as references by a linear model"). The classifier
  * here is multinomial Naive Bayes over whitespace tokens: linear in
  * the token counts, trainable in ONE aggregation pass, and — unlike a
  * gradient-trained model — exactly reproducible from integer corpus
  * statistics, so the basis that determines every score is
  * cross-engine hash-checkable.
  *
  * Scale design: the MODEL IS DATA. The per-(label, token) count table
  * is vocab × classes-shaped and joins by `token` key — it never
  * broadcasts and never collects. Documents contribute per-(doc, token)
  * pre-aggregated counts (the [[Vocab]] discipline: raw occurrences
  * collapse map-side before any exchange), each joined row fans out
  * over the class list, which IS model-sized (one row per label) and
  * broadcasts. One corpus-token shuffle to train, one to score; at
  * 100 TB both are the unavoidable token aggregation and nothing else.
  *
  * The transcendental discipline is [[Vocab.bigramLogProb]]'s (q87,
  * proven under the driver twice): every hash-gated column is an
  * integer count or an exact integer dot product against the joined
  * model counts; ln-derived scores are quantized to DECIMAL so they are
  * exact and partition-order independent WITHIN an engine, but they are
  * never hash-compared across engines.
  */
object Classify {

  private def docTokenCounts(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("__id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("__id"), col("token"))
      .agg(count(lit(1)).as("__c"))

  /** Train a multinomial NB model from a labeled slice. Returns the
    * per-(label, token) occurrence counts — `label, token, cnt` — the
    * only corpus-sized model component. Priors and per-label totals are
    * one-row-per-class aggregates derived in [[nbScore]].
    */
  def trainNaiveBayes(train: DataFrame, labelCol: String, textCol: String): DataFrame =
    train.select(col(labelCol).as("label"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-class training document counts — the prior side of the model,
    * one row per class (no tokenization: a metadata aggregate).
    */
  def nbClassDocs(train: DataFrame, labelCol: String): DataFrame =
    train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))

  /** Score every document against every class of a trained model.
    *
    * Output, one row per (document, class):
    *  - `n_tokens` — the doc's token count (BIGINT);
    *  - `model_hits` — Σ c·M(label, w), the exact integer dot product
    *    of the doc's token counts against the class's model counts
    *    (DECIMAL(38,0)); together with α, V, and the class totals this
    *    determines the NB score exactly, so hash-checking it pins the
    *    whole join;
    *  - `score_sum` — Σ c·ln((M+α)/(T_label+αV)) + ln prior, each ln
    *    quantized to DECIMAL(25,`lnScale`): exact within an engine,
    *    NEVER cross-engine hashable (see q87's two-round driver
    *    history);
    *  - `score` — the double of `score_sum` for convenience.
    *
    * @param train the labeled slice; the model, class totals, priors
    *              and vocabulary size all derive from it
    */
  def nbScore(docs: DataFrame, train: DataFrame, idCol: String,
      labelCol: String, textCol: String, alpha: Double = 1.0,
      lnScale: Int = 6): DataFrame =
    nbScoreWithModel(docs, trainNaiveBayes(train, labelCol, textCol),
      nbClassDocs(train, labelCol), idCol, textCol, alpha, lnScale)

  /** [[nbScore]] against a PRE-TRAINED model — the steady-state asset of
    * a continuously-running classifier gate (the stored-key-table
    * discipline): train (and persist) the `(label, token, cnt)` model
    * once, pass it to every batch, and per-batch work is the batch's
    * own tokenization plus the token-key join — independent of how much
    * data trained the model. Class totals, vocabulary size and priors
    * re-derive from the (model-sized, usually cached) model per call.
    */
  def nbScoreWithModel(docs: DataFrame, model: DataFrame,
      classDocs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0, lnScale: Int = 6): DataFrame = {
    // one row per class: token total + doc count (for the prior). The
    // class UNIVERSE is classDocs — a label whose training docs produced
    // no (label, token) rows (all-null/empty text, or a pruned
    // user-supplied model) still scores with total 0, i.e. the pure
    // smoothed likelihood ln(α/(αV)); an inner join here silently erased
    // such a class from scoring and nbPredict's argmax
    val classTotals = model.groupBy(col("label"))
      .agg(sum(col("cnt")).as("__tot"))
    val classes = classDocs.select(col("label"), col("n_docs").as("__nd"))
      .join(classTotals, Seq("label"), "left")
      .na.fill(0L, Seq("__tot"))
    val vocab = model.select(col("token")).distinct()
      .agg(count(lit(1)).as("__v"))
    val nTrain = classDocs.agg(sum(col("n_docs")).as("__n"))
    val docToks = docTokenCounts(docs, idCol, textCol)
    // (doc, token) × classes: the class list is model-sized and
    // broadcasts; the model joins back by (token, label) key
    val lnLik = log(
      (coalesce(col("cnt"), lit(0L)) + alpha) /
        (col("__tot") + lit(alpha) * col("__v")))
    val lnPrior = log(col("__nd").cast("double") / col("__n"))
    val scored = docToks
      .crossJoin(broadcast(classes))
      .join(model, Seq("token", "label"), "left")
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(nTrain))
      .select(col("__id"), col("label"), col("__c"),
        (lnLik.cast(s"decimal(25,$lnScale)") *
          col("__c").cast("decimal(10,0)")).as("__wl"),
        (lnPrior.cast(s"decimal(25,$lnScale)")).as("__lp"),
        (col("__c").cast("decimal(19,0)") *
          coalesce(col("cnt"), lit(0L)).cast("decimal(19,0)")).as("__ch"))
    scored
      .groupBy(col("__id"), col("label"))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__ch")).as("model_hits"),
        (sum(col("__wl")) + first(col("__lp"))).as("__sum"))
      .select(col("__id").as(idCol), col("label"), col("n_tokens"),
        col("model_hits"), col("__sum").as("score_sum"),
        col("__sum").cast("double").as("score"))
  }

  /** Argmax classification over [[nbScore]]: one row per document with
    * the winning `predicted` label (highest quantized-decimal score,
    * ties to the lexicographically smallest label — a total order, so
    * the prediction is deterministic on any partitioning).
    */
  def nbPredict(docs: DataFrame, train: DataFrame, idCol: String,
      labelCol: String, textCol: String, alpha: Double = 1.0): DataFrame =
    argmax(nbScore(docs, train, idCol, labelCol, textCol, alpha), idCol)

  /** [[nbPredict]] against a pre-trained model ([[nbScoreWithModel]]). */
  def nbPredictWithModel(docs: DataFrame, model: DataFrame,
      classDocs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame =
    argmax(nbScoreWithModel(docs, model, classDocs, idCol, textCol, alpha),
      idCol)

  private def argmax(scored: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_sum").desc, col("label"))
    scored
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("label").as("predicted"), col("n_tokens"),
        col("score_sum"), col("score"))
  }
}
