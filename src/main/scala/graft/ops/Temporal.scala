package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's optimizer has no native strategy for:
  * as-of joins and point-in-interval joins. Both are implemented as
  * equi-shuffle plans — the naive formulations (theta join on `<=`, or
  * interval containment) plan as broadcast-nested-loop/cross products
  * that are quadratic per key and impossible at corpus scale.
  */
object Temporal {

  /** As-of join: for every left row, the single latest right row of the
    * same `keyCol` with `right.tsCol <= left.tsCol` (left join — left
    * rows with no prior right row keep null payloads). Ties on the right
    * timestamp resolve to the highest `seqCol` (a unique per-row
    * sequencer, e.g. an event id — required for determinism).
    *
    * Implementation: tag and union both sides, then one window pass per
    * key ordered by (ts, side, seq) taking the last non-null payload —
    * the classic union-scan as-of. ONE shuffle on the key for both
    * inputs together; no range theta join, no per-key quadratic work;
    * window state is one row of carried payload per partition stream.
    *
    * @param seqCol    unique per-row sequencer present on BOTH sides
    *                  (the window orders by it, so it must be selected)
    * @param leftCols  left columns to keep — must include `keyCol`,
    *                  `tsCol` AND `seqCol`
    * @param payload   right columns carried onto matching left rows,
    *                  emitted as `asof_<name>`
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, seqCol: String, leftCols: Seq[String],
      payload: Seq[String]): DataFrame = {
    val missing = Seq(keyCol, tsCol, seqCol).filterNot(leftCols.contains)
    require(missing.isEmpty,
      s"asofJoin: leftCols must include keyCol, tsCol and seqCol — missing: " +
        missing.mkString(", "))
    // Payload rides as ONE struct so the carried value is always a whole
    // right row — carrying columns independently would back-fill a null
    // payload FIELD from an older right row, splicing two rows together.
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    val l = left.select(
      leftCols.map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast(pType).as("__p")): _*)
    val r = right.select(
      leftCols.map(c =>
        (if (c == keyCol || c == tsCol || c == seqCol) col(c)
         else lit(null).cast(left.schema(c).dataType)).as(c)) ++
        Seq(lit(0).as("__side"),
          struct(payload.map(col): _*).cast(pType).as("__p")): _*)
    // right sorts before left at an equal timestamp => "<=" semantics;
    // seqCol breaks right-side ts ties deterministically
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("__p").getField(c).as(s"asof_$c")): _*)
  }

  /** Funnel analysis: for each key, the earliest strictly-ordered
    * completion of `stages` — t1 = first stage-1 event, t2 = first
    * stage-2 event after t1, and so on (the greedy earliest-completion
    * funnel). Returns keys that complete ALL stages, with `t1..tN`.
    *
    * Scale: one filtered aggregate plus one equi-join + aggregate per
    * stage, all keyed on `keyCol`; the accumulator side only shrinks
    * stage over stage, and nothing is ever ordered globally.
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (s, i)) =>
      events.where(col(typeCol) === s)
        .join(acc, Seq(keyCol))
        .where(col(tsCol) > col(s"t$i"))
        .groupBy(col(keyCol) +: (1 to i).map(j => col(s"t$j")): _*)
        .agg(min(col(tsCol)).as(s"t${i + 1}"))
    }
  }

  /** Retention cohort matrix: users grouped by their FIRST active
    * period (the cohort), with per-(cohort, period-offset) distinct
    * active-user counts and the retention rate against the cohort's
    * size — the standard product-analytics table, here over the event
    * stream's integer-ns timestamps (`DIV`, never double division — ns
    * epochs exceed double precision).
    *
    * Scale: one distinct over (user, period) — the only event-sized
    * shuffle, map-side combined; first-period and activity aggregates
    * are user-keyed; the output is cohorts × offsets (report-sized).
    *
    * @return `cohort, period_offset, n_active, cohort_size, retention`
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      periodNs: Long): DataFrame = {
    require(periodNs > 0, s"periodNs must be positive, got $periodNs")
    val pu = events.select(col(userCol).as("__u"),
        expr(s"$tsCol DIV $periodNs").as("__p"))
      .distinct()
    val firsts = pu.groupBy(col("__u")).agg(min(col("__p")).as("__c"))
    val counts = pu.join(firsts, Seq("__u"))
      .groupBy(col("__c").as("cohort"),
        (col("__p") - col("__c")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firsts.groupBy(col("__c").as("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    counts.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("period_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retention"))
  }

  /** Point-in-interval join: every (interval, point) pair of the same
    * `keyCol` with `lo <= pt <= hi`. Both sides bucketize on
    * `bucketWidth`-sized ranges of the point/interval domain and
    * equi-join on (key, bucket): a point belongs to EXACTLY one bucket,
    * so each qualifying pair is produced exactly once — no dedup pass.
    * Intervals explode into ceil(len/width)+1 bucket rows; size
    * `bucketWidth` near the typical interval length to keep the
    * explosion factor ~2 while the join stays an equi-shuffle (the
    * scale-safe shape — a `BETWEEN` theta join plans as a per-key cross
    * product).
    *
    * Columns: interval columns + the point columns listed in `ptCols`.
    */
  def intervalJoin(intervals: DataFrame, points: DataFrame, keyCol: String,
      loCol: String, hiCol: String, ptCol: String, ptCols: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val iv = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__b",
        explode(sequence(expr(s"$loCol DIV $bucketWidth"),
          expr(s"$hiCol DIV $bucketWidth"))))
    val pt = points
      .select(Seq(col(keyCol).as("__pk"), col(ptCol),
        expr(s"$ptCol DIV $bucketWidth").as("__b")) ++
        ptCols.filter(_ != ptCol).map(col): _*)
    iv.join(pt, iv(keyCol) === pt("__pk") && iv("__b") === pt("__b"))
      .where(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("__b", "__pk")
  }
}
