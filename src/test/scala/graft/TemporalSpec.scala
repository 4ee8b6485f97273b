package graft

import org.apache.spark.sql.functions._

import graft.ops.Temporal

class TemporalSpec extends SparkSuite {

  test("asofJoin takes the latest right row <= left ts, ties to highest seq") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // after purchases at 50 and 100 → equal-ts match wins
      (1L, 40L, 11L),  // before any purchase → null
      (2L, 500L, 12L)) // two purchases share ts 400 → highest event_id
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, 50L, 1L, 5.0),
      (1L, 100L, 2L, 7.0),
      (2L, 400L, 3L, 1.0),
      (2L, 400L, 4L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
        leftCols = Seq("user_id", "ts", "event_id"),
        payload = Seq("event_id", "value"))
      .select($"event_id", $"asof_event_id", $"asof_value")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out === Set((10L, 2L, 7.0), (11L, -1L, -1.0), (12L, 4L, 2.0)))
  }

  test("asofJoin carries whole right rows — null payload fields are not back-filled") {
    import spark.implicits._
    val left = Seq((1L, 200L, 10L)).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, 50L, 1L, Some(5.0)),
      (1L, 100L, 2L, None)) // latest row has a NULL value field
      .toDF("user_id", "ts", "event_id", "value")
    val r = Temporal.asofJoin(left, right, "user_id", "ts", "event_id",
        leftCols = Seq("user_id", "ts", "event_id"),
        payload = Seq("event_id", "value"))
      .select($"asof_event_id", $"asof_value").head()
    assert(r.getLong(0) === 2L)
    assert(r.isNullAt(1), "null field of the matched row must stay null")
  }

  test("asofJoin matches the per-key driver-side model on random events") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 150).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, 1000L + i))
    val right = (1 to 80).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, 2000L + i, rnd.nextInt(50).toDouble))
    val out = Temporal.asofJoin(
        left.toDF("user_id", "ts", "event_id").repartition(4),
        right.toDF("user_id", "ts", "event_id", "value").repartition(3),
        "user_id", "ts", "event_id",
        leftCols = Seq("user_id", "ts", "event_id"),
        payload = Seq("event_id", "value"))
      .collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    // model: latest right (ts <= left ts), ties to highest right event_id
    val want = left.map { case (k, ts, id) =>
      val best = right.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption
      id -> best.map(_._3).getOrElse(-1L)
    }.toMap
    assert(out === want)
  }

  test("intervalJoin equals the theta join and emits each pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val intervals = (1 to 60).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, rnd.nextInt(3).toLong, lo, lo + rnd.nextInt(120))
    }.toDF("iv_id", "k", "lo", "hi")
    val points = (1 to 300).map { i =>
      (1000L + i, rnd.nextInt(3).toLong, rnd.nextInt(1100).toLong)
    }.toDF("pt_id", "k2", "pt")
    val got = Temporal.intervalJoin(intervals,
        points.withColumnRenamed("k2", "k"), "k", "lo", "hi", "pt",
        ptCols = Seq("pt_id"), bucketWidth = 64L)
      .select($"iv_id", $"pt_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly-once: no duplicate pairs even when an interval spans buckets
    assert(got.length === got.toSet.size)
    val want = intervals.join(points,
        intervals("k") === points("k2") &&
          points("pt").between(intervals("lo"), intervals("hi")))
      .select($"iv_id", $"pt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet === want)
  }

  test("funnel finds the earliest strictly-ordered completion only") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes a->b->c, but b appears BEFORE a too (must skip it)
      (1L, 10L, "b"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "c"),
      // user 2 never reaches c
      (2L, 10L, "a"), (2L, 20L, "b"),
      // user 3: c precedes b -> incomplete
      (3L, 10L, "a"), (3L, 15L, "c"), (3L, 20L, "b"))
      .toDF("user_id", "ts", "event_type")
    val out = Temporal.funnel(ev, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 20L, 30L, 40L)))
  }

  test("intervalJoin boundary points are inclusive on both ends") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 10L, 20L)).toDF("iv_id", "k", "lo", "hi")
    val pts = Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, 0L, 9L), (4L, 0L, 21L))
      .toDF("pt_id", "k", "pt")
    val got = Temporal.intervalJoin(iv, pts, "k", "lo", "hi", "pt",
        ptCols = Seq("pt_id"), bucketWidth = 7L)
      .select($"pt_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("retentionCohorts: hand-computed matrix, repeat events count once") {
    import spark.implicits._
    // period = 10 ns. u1 first in p0, active p0/p1/p2 (p1 twice);
    // u2 first in p0, active p0 only; u3 first in p1, active p1/p2
    val ev = Seq(
      (1L, 1L), (1L, 12L), (1L, 15L), (1L, 25L),
      (2L, 5L),
      (3L, 11L), (3L, 29L)).toDF("user_id", "ts")
    val out = Temporal.retentionCohorts(ev, "user_id", "ts", periodNs = 10L)
      .orderBy($"cohort", $"period_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 2L, 1.0),   // cohort p0: u1+u2 at offset 0
      (0L, 1L, 1L, 2L, 0.5),   // only u1 returns in p1
      (0L, 2L, 1L, 2L, 0.5),   // only u1 in p2
      (1L, 0L, 1L, 1L, 1.0),   // cohort p1: u3
      (1L, 1L, 1L, 1L, 1.0)))  // u3 returns in p2
  }
}
