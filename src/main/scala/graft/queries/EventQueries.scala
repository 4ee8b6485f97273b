package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-stream analytics in batch form (the Structured-Streaming module
  * reuses the same column logic; see graft.streaming).
  *
  * `ts` arrives as epoch-nanosecond Long (see Tables.events), so window
  * bucketing and session gaps are exact integer arithmetic on both
  * engines — no float/timestamp-precision hazards.
  */
object EventQueries {

  private val NanosPer15Min = 900L * 1000L * 1000L * 1000L
  private val NanosPer30Min = 1800L * 1000L * 1000L * 1000L

  /** Tumbling 15-minute windows per event type: count + integer-exact
    * value sum (floor to millis — immune to accumulation order).
    */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(
        // integral DIV: a Double `/` would lose precision at epoch-ns scale
        (expr(s"ts DIV $NanosPer15Min") * 900).as("window_start_s"),
        $"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(floor($"value" * 1000).cast("long")).as("sum_value_millis"))
      .orderBy($"window_start_s", $"event_type")
  }

  /** Sessionization: 30-minute-gap sessions per user (lag window + flag
    * sum — the batch analog of flatMapGroupsWithState).
    */
  private def q35(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        when($"prev_ts".isNull || $"ts" - $"prev_ts" > NanosPer30Min, 1).otherwise(0))
      .groupBy($"user_id")
      .agg(
        sum($"new_session").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  /** Event-type transition counts per user (lag over event stream). */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .where($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"prev_type", $"event_type")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_event_windows" -> (q34 _),
    "q35_sessionization" -> (q35 _),
    "q36_transitions" -> (q36 _))

  val oracles: Map[String, String] = Map(
    "q34_event_windows" ->
      """SELECT (epoch_ns(ts) // 900000000000) * 900 AS window_start_s,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_millis
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start_s, event_type""".stripMargin,
    "q35_sessionization" ->
      """WITH t AS (SELECT user_id, event_id, epoch_ns(ts) AS tns,
        |             lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tns
        |           FROM events)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN prev_tns IS NULL OR tns - prev_tns > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q36_transitions" ->
      """WITH t AS (SELECT event_type,
        |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |           FROM events)
        |SELECT prev_type, event_type, count(*) AS n
        |FROM t WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type
        |ORDER BY prev_type, event_type""".stripMargin)
}
