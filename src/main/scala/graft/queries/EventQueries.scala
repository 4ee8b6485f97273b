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

  /** As-of join: every click annotated with the user's latest purchase
    * at or before it (event id + value), null when no purchase precedes.
    * The union-window plan: one shuffle on user_id — never a `<=` theta
    * join (which Spark plans as a per-key cross product).
    *
    * All temporal queries here run on µs-truncated timestamps: DuckDB
    * reads parquet TIMESTAMP(NANOS) at µs precision, so comparing at ns
    * on the Spark side would let two events in the same µs order
    * differently across engines.
    */
  private def q65(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts DIV 1000"))
    graft.ops.Temporal.asofJoin(
        ev.where($"event_type" === "click"),
        ev.where($"event_type" === "purchase"),
        keyCol = "user_id", tsCol = "ts_us", seqCol = "event_id",
        leftCols = Seq("user_id", "ts_us", "event_id"),
        payload = Seq("event_id", "value"))
      .select($"event_id", $"user_id", $"ts_us",
        $"asof_event_id", $"asof_value")
      .orderBy($"event_id")
  }

  /** Interval join: views landing in a 30-minute post-purchase
    * attribution window of the same user, via the bucketed equi-join
    * (bucket width = window length → ≤2 bucket rows per interval, each
    * qualifying pair emitted exactly once).
    */
  private def q66(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val MicrosPer30Min = 1800L * 1000L * 1000L
    val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts DIV 1000"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
        $"ts_us".as("lo"), ($"ts_us" + MicrosPer30Min).as("hi"))
    val views = ev.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts_us".as("view_ts"))
    graft.ops.Temporal.intervalJoin(purchases, views, keyCol = "user_id",
        loCol = "lo", hiCol = "hi", ptCol = "view_ts",
        ptCols = Seq("view_id"), bucketWidth = MicrosPer30Min)
      .select($"purchase_id", $"view_id", $"user_id",
        ($"view_ts" - $"lo").as("lag_us"))
      .orderBy($"purchase_id", $"view_id")
  }

  /** Funnel: earliest strictly-ordered signup → view → purchase per
    * user (µs-truncated stage timestamps, see q65 note).
    */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts DIV 1000"))
    graft.ops.Temporal.funnel(ev, "user_id", "ts_us",
        "event_type", Seq("signup", "view", "purchase"))
      .select($"user_id", $"t1".as("signup_us"), $"t2".as("view_us"),
        $"t3".as("purchase_us"))
      .orderBy($"user_id")
  }

  /** Weekly retention cohorts over the event stream: users bucketed by
    * first active week, per-(cohort, offset) active counts + retention
    * rate — integer ns DIV arithmetic end to end.
    */
  private def q146(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ops.Temporal.retentionCohorts(Tables.events(s, dir),
        "user_id", "ts", periodNs = 604800000000000L)
      .orderBy($"cohort", $"period_offset")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q146_retention_cohorts" -> (q146 _),
    "q34_event_windows" -> (q34 _),
    "q35_sessionization" -> (q35 _),
    "q36_transitions" -> (q36 _),
    "q65_asof_join" -> (q65 _),
    "q66_interval_join" -> (q66 _),
    "q72_funnel" -> (q72 _))

  val oracles: Map[String, String] = Map(
    // q146: (user, week) distinct activity → first week per user →
    // cohort/offset counts; integers + one division.
    "q146_retention_cohorts" ->
      """WITH pu AS (SELECT DISTINCT user_id AS u,
        |              epoch_ns(ts) // 604800000000000 AS p
        |            FROM events),
        |f AS (SELECT u, min(p) AS c FROM pu GROUP BY u),
        |act AS (SELECT f.c AS cohort, pu.p - f.c AS period_offset, pu.u
        |        FROM pu JOIN f USING (u)),
        |cnt AS (SELECT cohort, period_offset, count(*) AS n_active
        |        FROM act GROUP BY 1, 2),
        |sz AS (SELECT c AS cohort, count(*) AS cohort_size FROM f GROUP BY c)
        |SELECT cnt.cohort, cnt.period_offset, cnt.n_active, sz.cohort_size,
        |       CAST(cnt.n_active AS DOUBLE) / sz.cohort_size AS retention
        |FROM cnt JOIN sz USING (cohort)
        |ORDER BY cohort, period_offset""".stripMargin,
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
        |ORDER BY prev_type, event_type""".stripMargin,
    // rank over the <= left join reproduces "latest purchase at or
    // before, ties to highest event_id" — the as-of contract
    "q65_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_ns(ts) AS tns FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, epoch_ns(ts) AS tns, value FROM events
        |      WHERE event_type = 'purchase'),
        |j AS (SELECT c.event_id, c.user_id, c.tns,
        |             p.event_id AS pid, p.value AS pvalue,
        |             row_number() OVER (PARTITION BY c.event_id
        |               ORDER BY p.tns DESC, p.event_id DESC) AS rn
        |      FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.tns <= c.tns)
        |SELECT event_id, user_id, tns // 1000 AS ts_us,
        |       pid AS asof_event_id, pvalue AS asof_value
        |FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin,
    "q66_interval_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS lo,
        |             epoch_ns(ts) + 1800000000000 AS hi
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT event_id AS view_id, user_id, epoch_ns(ts) AS vts
        |      FROM events WHERE event_type = 'view')
        |SELECT p.purchase_id, v.view_id, p.user_id,
        |       v.vts // 1000 - p.lo // 1000 AS lag_us
        |FROM p JOIN v ON v.user_id = p.user_id AND v.vts BETWEEN p.lo AND p.hi
        |ORDER BY purchase_id, view_id""".stripMargin,
    "q72_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, s1.t1, min(e.t) AS t2
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.t > s1.t1
        |       GROUP BY e.user_id, s1.t1),
        |s3 AS (SELECT e.user_id, s2.t1, s2.t2, min(e.t) AS t3
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t > s2.t2
        |       GROUP BY e.user_id, s2.t1, s2.t2)
        |SELECT user_id, t1 // 1000 AS signup_us, t2 // 1000 AS view_us,
        |       t3 // 1000 AS purchase_us
        |FROM s3 ORDER BY user_id""".stripMargin)
}
