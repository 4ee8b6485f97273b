package graft.ops

import org.apache.spark.sql.DataFrame
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
