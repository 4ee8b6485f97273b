package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus keyword retrieval (BM25) as model-as-data relational plans —
  * the "find the docs about X" primitive a curation team runs when
  * auditing what a corpus contains (reference analog: the processor's
  * label→value filter queries over scraped records; here generalized to
  * ranked full-text scoring).
  *
  * Scale shape: the query-term set is a broadcast literal filter applied
  * DURING the token explode, so the exploded stream that reaches any
  * shuffle is matched-occurrence-sized, not corpus-token-sized. Document
  * frequencies and corpus scalars are term-count-sized aggregates joined
  * back by broadcast. One exploded corpus scan plus one count-only
  * corpus scan (the `(n_docs, corpus_tokens)` scalars need every doc,
  * matched or not, and Spark does not share a subtree between the two
  * aggregations), then one matched-token shuffle. At 100 TB, compute
  * the two scalars once per corpus snapshot and reuse them across
  * queries instead of paying the count scan per call.
  */
object Retrieval {

  /** The integer basis of a BM25 evaluation for a fixed query-term set:
    * one row per (document, matched term) with the document's term
    * frequency `tf`, its length `dl` in whitespace tokens, the term's
    * document frequency `df`, corpus size `n_docs`, and corpus token
    * total `corpus_tokens`. Every column is integral → the whole table
    * hash-gates cross-engine; the ln-based BM25 score itself rides on
    * top in [[bm25TopK]] and stays rows-only (the q87 discipline: a
    * transcendental never enters a hash gate).
    */
  def queryTermStats(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val toks = df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val lengths = toks.select(col(idCol),
      size(col("__toks")).cast("long").as("dl"), col("__toks"))
    // filter BEFORE the explode reaches a shuffle: only query-term
    // occurrences survive the Generate, so the groupBy input is
    // match-sized even when the corpus is 100 TB of tokens
    val matched = lengths
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .where(col("term").isin(terms.map(x => x: Any): _*))
    val tf = matched.groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    // tf has one row per (doc, term) → counting rows per term IS df
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // count-only second scan (see object doc): two aggregated longs per
    // task, no token arrays carried
    val corpus = df
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long"))
          .as("corpus_tokens"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus)) // one-row scalar — never a real cross
      .select(col(idCol), col("term"), col("tf"), col("dl"), col("df"),
        col("n_docs"), col("corpus_tokens"))
  }

  /** The per-(doc, term) BM25 score term over [[queryTermStats]]'s
    * column names: idf (the +1 variant that stays positive at
    * df > N/2) × tf-saturation. ONE definition — [[bm25TopK]] and
    * [[bm25TopKRanked]] must rank identically for any future formula
    * tweak.
    */
  private def bm25Term(k1: Double, b: Double) = {
    val avgdl = col("corpus_tokens").cast("double") / col("n_docs")
    val idf = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0))
    val tfSat = col("tf").cast("double") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    idf * tfSat
  }

  /** Top-k documents by BM25 (Robertson/Sparck Jones, the +1 idf variant
    * that stays positive at df > N/2). Built on [[queryTermStats]]'s
    * integer basis; the per-document score sums each matched term's
    * idf·tf-saturation product. Ties break to the smaller document id so
    * the cut is deterministic. ln-based → rows-only at the oracle gate.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    queryTermStats(df, idCol, textCol, terms)
      .groupBy(col(idCol))
      .agg(sum(bm25Term(k1, b)).as("bm25"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)

  /** [[bm25TopK]] with an explicit 1-based `rank` column whose ORDER is
    * cross-engine hash-gateable even though the ln-based score is not:
    * each term's idf·tf-saturation product is quantized to
    * DECIMAL(38,`quantScale`) BEFORE the per-document sum, so the score
    * is exact decimal arithmetic — partition-order independent within an
    * engine (a float sum of a doc's terms is not: two docs with
    * identical integer stats could drift a ulp apart on merge order and
    * flip a doc_id tie-break), and rank-stable across engines as long
    * as adjacent top-k scores differ by more than the quantization step
    * + ln ulp noise (~1e-9 at the default scale; measured adjacent gaps
    * on the fixtures are ≥ 3e-5 relative, sf0.01 and sf0.1, with the
    * only exact tie coming from identical (tf, dl, df) stats — which
    * both engines tie and break by id identically). The gate is thus
    * corpus-conditional like q135's: re-verify the gap audit after a
    * fixture regeneration.
    *
    * Scale: the top-k cut is a distributed TakeOrdered on the decimal
    * score; only the k survivors enter the rank window (single
    * partition of k rows, never corpus-sized).
    *
    * @return `rank, idCol, n_terms_hit, bm25` ordered by rank; gate
    *         (rank, id, n_terms_hit), all integral
    */
  def bm25TopKRanked(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
      quantScale: Int = 9): DataFrame = {
    val top = queryTermStats(df, idCol, textCol, terms)
      .groupBy(col(idCol))
      .agg(sum(bm25Term(k1, b).cast(s"decimal(38,$quantScale)")).as("__s"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("__s").desc, col(idCol))
      .limit(k)
    top
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__s").desc, col(idCol))))
      .select(col("rank"), col(idCol), col("n_terms_hit"),
        col("__s").cast("double").as("bm25"))
      .orderBy(col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of two
    * per-query rankings — the standard hybrid-retrieval combiner
    * (lexical BM25 + dense ANN) that needs no score calibration
    * because it only consumes RANKS:
    * `rrf = Σ 1 / (kConst + rank)`, missing docs contribute 0.
    *
    * Determinism/oracle: each term is a single IEEE division of exact
    * integers and the sum has two fixed-order operands, so the fused
    * score (unlike the ln-based BM25 score itself) hash-gates
    * cross-engine when the input ranks do. Fused ties break to the
    * smaller id.
    *
    * Scale: inputs are per-query top-k lists (retrieval output, never
    * corpora), so the full-outer join and the per-query rank window
    * move ≤ |A| + |B| rows per query; the window is keyed by
    * `queryCol` — no single-partition sort at any query-set size.
    *
    * @param a,b rankings with (queryCol, idCol, rankCol); rank is
    *            1-based
    * @return `queryCol, idCol, rank_a, rank_b, rrf_score, rank` with
    *         `rank` ≤ topK per query
    */
  def rrfFuse(a: DataFrame, b: DataFrame, queryCol: String, idCol: String,
      rankCol: String = "rank", kConst: Int = 60,
      topK: Int = 10): DataFrame = {
    val fa = a.select(col(queryCol), col(idCol),
      col(rankCol).cast("long").as("rank_a"))
    val fb = b.select(col(queryCol), col(idCol),
      col(rankCol).cast("long").as("rank_b"))
    val score =
      coalesce(lit(1.0) / (lit(kConst) + col("rank_a")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(kConst) + col("rank_b")), lit(0.0))
    fa.join(fb, Seq(queryCol, idCol), "full_outer")
      .select(col(queryCol), col(idCol), col("rank_a"), col("rank_b"),
        score.as("rrf_score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(queryCol))
          .orderBy(col("rrf_score").desc, col(idCol))))
      .where(col("rank") <= topK)
  }
}
