package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantile thresholds and threshold-based filtering — the
  * "keep documents above the per-language quality median / drop the
  * bottom decile" step of corpus curation.
  *
  * The exact threshold is defined by rank, not interpolation: the
  * smallest value whose `cume_dist` reaches `p`. Rank selection picks an
  * EXISTING value — no floating-point interpolation arithmetic — so any
  * engine that sorts the same doubles derives the identical threshold
  * (which is what lets the DuckDB oracle hash-verify it byte-for-byte).
  *
  * Scale: the exact path sorts each group once (one shuffle on the group
  * key; per-group sort is spill-safe). When groups are huge and the
  * threshold only needs to be approximately placed, swap in
  * `approx_percentile` (one ordinary aggregate, mergeable sketches, no
  * sort) — same downstream join/filter shape.
  *
  * Null contract (all four functions): percentiles are over the NON-NULL
  * values of `valueCol`; null rows are dropped before ranking, and a
  * group whose values are all null is absent from the output. Without
  * the explicit filter the exact and approx twins silently diverged on
  * nullable inputs — `cume_dist` counts null rows in its denominator
  * (they sort first), shifting every non-null rank, while
  * `percentile_approx` ignores nulls — so the "twins" disagreed by more
  * than the sketch's rank error wherever nulls were present.
  */
object Quantiles {

  /** Exact per-group `p`-quantile thresholds (rank-based, see above).
    * @return one row per group: `groupCol, threshold`
    */
  def groupThresholds(df: DataFrame, groupCol: String, valueCol: String,
      p: Double): DataFrame = {
    require(p > 0 && p <= 1, s"p must be in (0, 1], got $p")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    df.select(col(groupCol), col(valueCol))
      .where(col(valueCol).isNotNull)
      .withColumn("__cd", cume_dist().over(w))
      .where(col("__cd") >= p)
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("threshold"))
  }

  /** Multi-percentile profile per group in ONE pass: the p50/p90/p99
    * table a length/quality distribution review reads — every requested
    * percentile is the rank-based smallest-value-reaching-`p` (see
    * above), computed from the same cume_dist window with one
    * conditional-min aggregate per percentile (no per-p re-sort, no
    * interpolation). Output columns are `p50, p90, …` — percent with
    * any fractional part after `_` (`0.995` → `p99_5`), so nearby ps
    * like 0.995 and 1.0 keep distinct names instead of both rounding
    * to `p100`.
    */
  def groupPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    val names = percentileNames(ps)
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val aggs = ps.zip(names).map { case (p, n) =>
      min(when(col("__cd") >= p, col(valueCol))).as(n)
    }
    df.select(col(groupCol), col(valueCol))
      .where(col(valueCol).isNotNull)
      .withColumn("__cd", cume_dist().over(w))
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Shared `p → column name` contract for the percentile tables:
    * percent with any fractional part after `_` (`0.995` → `p99_5`).
    * Decimal-string basis (BigDecimal(p.toString)), not p * 100 in
    * doubles: 0.9 * 100 is not exactly 90 in binary. Rounded to 6
    * decimal places of the percent so an arithmetically-computed p
    * (0.1 * 3 = 0.30000000000000004) still names p30, while 0.995 vs
    * 1.0 stay distinct; the requires catch a collision or a p so
    * small it rounds to zero (p ≥ 1e-8 always names nonzero).
    */
  private def percentileNames(ps: Seq[Double]): Seq[String] = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"bad ps: $ps")
    def nameFor(p: Double): String = "p" + (BigDecimal(p.toString) * 100)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .underlying.stripTrailingZeros.toPlainString.replace(".", "_")
    val names = ps.map(nameFor)
    require(names.distinct.size == names.size,
      s"percentile names collide: ${ps.zip(names)}")
    require(!names.contains("p0"),
      s"a percentile rounds to p0 — p too small to name: ${ps.zip(names)}")
    names
  }

  /** Sketch-based twin of [[groupPercentiles]] for the 100 TB path:
    * same output shape and column-name contract, ONE ordinary
    * aggregate (mergeable `percentile_approx` sketches, map-side
    * partial, no shuffle-and-sort of the values) — in particular no
    * single-partition window when the "group" is the whole corpus,
    * which is exactly the datasheet's corpus-wide dup-density row.
    * Values are approximate within the sketch's rank error
    * (1/accuracy); the exact twin stays the oracle-gated one.
    */
  def groupPercentilesApprox(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val names = percentileNames(ps)
    val sk = percentile_approx(col(valueCol),
      array(ps.map(lit): _*), lit(accuracy))
    df.where(col(valueCol).isNotNull).groupBy(col(groupCol)).agg(sk.as("__ps"))
      .select(col(groupCol) +:
        names.zipWithIndex.map { case (n, i) => col("__ps")(i).as(n) }: _*)
  }

  /** Sketch-based thresholds for the 100 TB path: same output shape as
    * [[groupThresholds]], one aggregate, no per-group sort.
    */
  def groupThresholdsApprox(df: DataFrame, groupCol: String, valueCol: String,
      p: Double, accuracy: Int = 10000): DataFrame =
    df.where(col(valueCol).isNotNull).groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), lit(p), lit(accuracy)).as("threshold"))

  /** Keep rows whose `valueCol` is at or above their group's `p`-quantile
    * threshold. Thresholds are one row per group — always broadcast.
    */
  def filterAboveQuantile(df: DataFrame, groupCol: String, valueCol: String,
      p: Double): DataFrame =
    df.join(broadcast(groupThresholds(df, groupCol, valueCol, p)), Seq(groupCol))
      .where(col(valueCol) >= col("threshold"))
      .drop("threshold")
}
