package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in this engine's sessions) handles most runtime skew; these
  * operators cover the two cases AQE cannot re-plan:
  *  - a single group key receiving most rows in an aggregation (one
  *    reducer owns the heavy key no matter how partitions split);
  *  - a broadcast-ineligible join where one probe key dominates.
  *
  * Both trade one skewed shuffle for balanced ones, at the cost of a
  * `salts`-way fan-out of the small/partial side.
  */
object Skew {

  /** Salt in [0, salts) from the row's partition-local position. NOT
    * layout-independent — `monotonically_increasing_id` depends on how
    * rows land in partitions, so two runs over different layouts salt
    * differently. That is fine here: every result below is salt-invariant
    * (counts/sums/join matches are identical for ANY salt assignment);
    * the position basis is chosen over a row-content hash deliberately,
    * because the heavy key's rows are often byte-identical duplicates — a
    * content hash would send them all to ONE salt bucket, recreating the
    * exact hotspot salting exists to break.
    */
  private def saltCol(salts: Int): Column = {
    // every public op routes through here; salts <= 0 otherwise degrades
    // silently (pmod by 0 → null salt → the single-reducer hotspot these
    // ops exist to break) or throws mid-job inside sequence()
    require(salts > 0, s"salts must be positive, got $salts")
    pmod(spark_partition_id() * 31 + monotonically_increasing_id(), lit(salts))
  }

  /** Salted two-phase count: groupBy(key, salt) partial counts, then
    * groupBy(key) sums the partials. Identical result to
    * `df.groupBy(key).count()`; the heavy key's rows spread over `salts`
    * reducers in the wide first shuffle while the second shuffle carries
    * only `distinct_keys × salts` rows.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("count"))

  /** Salted sum — same two-phase shape for an associative aggregate. Use
    * exact types (long / decimal) for the summed column: partial order
    * differs from the unsalted plan, so float sums would not be
    * bit-stable.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Skew-proof equi-join: the big (skewed) side gets a per-row salt in
    * [0, salts); the small side is replicated `salts` times; the join key
    * becomes (key, salt), so a heavy key's rows land on `salts` tasks
    * instead of one. Result equals `big.join(small, key, "inner")`
    * (small's key must be unique or duplicates multiply as usual).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(salts))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
