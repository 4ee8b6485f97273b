package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregations for single-pass corpus statistics.
  *
  * The exact token top-k (`Vocab.topK`) shuffles the full distinct
  * vocabulary; at 100 TB of web text that is billions of (token, count)
  * rows through the exchange. The sketches here bound what moves: each
  * partition contributes one fixed-size summary, so the shuffle carries
  * `partitions × m` counters no matter how large the vocabulary grows —
  * the heavy-hitter scale path when "the top 100 tokens, roughly" is the
  * actual question.
  */
object Sketches {

  /** Misra-Gries summary state: at most `m` counters (enforced by the
    * [[MisraGries]] operations, not the type).
    */
  case class MGSummary(counts: Map[String, Long])

  /** Misra-Gries heavy-hitters as a typed Spark [[Aggregator]] — the
    * classic frequent-items summary (Misra & Gries 1982) under the
    * mergeable-summaries merge rule (Agarwal et al., PODS 2012): partial
    * summaries sum counter-wise, then the (m+1)-th largest count is
    * subtracted from every counter and non-positive ones drop, so the
    * merged state never exceeds `m` counters and the estimate error
    * stays ≤ N/(m+1) regardless of merge topology.
    *
    * Guarantees: every estimate LOWER-bounds the true count by at most
    * N/(m+1); any token with true frequency > N/(m+1) is guaranteed
    * present. When the total distinct count never exceeds `m`, no
    * decrement ever fires and the summary is EXACT and
    * layout-independent — the regime the DuckDB oracle checks; in the
    * approximate regime counter values are layout-dependent within the
    * error bound (like any mergeable sketch), so never hash-gate them.
    *
    * Spark execution: partial aggregation runs per partition (each task
    * reduces its rows into one m-bounded state) and only the m-sized
    * states cross the exchange — the reduce side merges
    * `partitions` summaries, never raw tokens.
    */
  class MisraGries[I](m: Int, token: I => String)
      extends Aggregator[I, MGSummary, Seq[(String, Long)]] {
    require(m > 0, s"capacity must be positive, got $m")

    def zero: MGSummary = MGSummary(Map.empty)

    def reduce(b: MGSummary, in: I): MGSummary = {
      val tok = token(in)
      val c = b.counts
      c.get(tok) match {
        case Some(n) => MGSummary(c.updated(tok, n + 1))
        case None if c.size < m => MGSummary(c.updated(tok, 1L))
        case None =>
          // classic MG step: decrement every counter, drop zeros — at
          // least one slot frees; amortized O(1) decrement events per
          // input row
          MGSummary(c.flatMap { case (t, n) =>
            if (n > 1) Some(t -> (n - 1)) else None
          })
      }
    }

    def merge(a: MGSummary, b: MGSummary): MGSummary = {
      val sum = b.counts.foldLeft(a.counts) { case (acc, (t, n)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + n)
      }
      if (sum.size <= m) MGSummary(sum)
      else {
        // subtract the (m+1)-th largest count: at most m survive (only
        // counters STRICTLY above it), deterministically for a given
        // pair of inputs
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
        MGSummary(sum.flatMap { case (t, n) =>
          if (n > cut) Some(t -> (n - cut)) else None
        })
      }
    }

    def finish(b: MGSummary): Seq[(String, Long)] =
      b.counts.toSeq.sortBy { case (t, n) => (-n, t) }

    def bufferEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Global heavy hitters over a string column: top-`k` tokens by
    * estimated count from one [[MisraGries]] pass with capacity `m`
    * (choose `m` ≥ a few × the k of interest; `m` ≥ the distinct count
    * makes the result exact). Null tokens are ignored, SQL-aggregate
    * style — a null is not a token, and letting one into the summary
    * would crash the Map-key encoder mid-aggregation. Output:
    * `(token, est_count)` ordered by (count desc, token).
    */
  def heavyHitters(df: DataFrame, tokenCol: String, m: Int,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(tokenCol).isNotNull)
      .select(col(tokenCol).cast("string")).as[String]
      .select(new MisraGries[String](m, identity).toColumn.name("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("token"), col("e._2").as("est_count"))
      .orderBy(col("est_count").desc, col("token"))
      .limit(k)
  }

  /** Per-group heavy hitters: top-`k` tokens within each value of
    * `groupCol` — e.g. the dominant tokens per language — with the same
    * one-summary-per-(partition, group) movement bound. Null tokens are
    * ignored like [[heavyHitters]]'s; a null GROUP is a group (SQL
    * GROUP BY semantics). The output `groupCol` is coerced to string
    * (the typed groupByKey needs one key type for any input); join the
    * result back on a cast of the source column, not the raw column,
    * when the original type was numeric.
    */
  def heavyHittersBy(df: DataFrame, groupCol: String, tokenCol: String,
      m: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(tokenCol).isNotNull)
      .select(col(groupCol).cast("string"), col(tokenCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .agg(new MisraGries[(String, String)](m, _._2).toColumn)
      .toDF(groupCol, "hh")
      .select(col(groupCol), explode(col("hh")).as("e"))
      .select(col(groupCol), col("e._1").as("token"),
        col("e._2").as("est_count"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
          .orderBy(col("est_count").desc, col("token"))))
      .where(col("__rn") <= k)
      .drop("__rn")
  }
}
