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

  /** Per-token corpus statistics: `token, tf` (total occurrences) and
    * `doc_freq` (documents containing the token). Deterministic top-`k`
    * by (tf desc, token asc).
    */
  def topK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val perDoc = df
      .select(col(idCol).as("__id"), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("__id"))
      .agg(count(lit(1)).as("__c"))
    perDoc
      .groupBy(col("token"))
      .agg(sum(col("__c")).as("tf"), count(lit(1)).as("doc_freq"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)
  }
}
