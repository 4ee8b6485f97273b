package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.util.{DoubleAccumulator, LongAccumulator}

/** Observability for the bucket/cell safety caps in the near-dup and ANN
  * paths.
  *
  * Every capped operator DROPS over-cap groups by design (a mass-duplicate
  * bucket explodes quadratically; the cap is the 100 TB guardrail), but a
  * silent drop turns a mass-duplication event into silently lost recall.
  * [[cappedWhere]] makes the cap filter itself do the accounting: the
  * predicate is a deterministic-output UDF (marked nondeterministic so the
  * optimizer can neither split, push, nor re-evaluate it) that bumps two
  * named Spark accumulators — `graft.cap.<tag>.groups` / `.rows`, visible
  * in the Spark UI — for every over-cap row it rejects.
  *
  * Why accumulators and not `Dataset.observe`: a CollectMetrics node's
  * delivery depends on the node surviving into the final adaptive plan.
  * Measured here (Spark 4.1): when the observed subtree feeds a join that
  * AQE replans (empty-relation propagation, broadcast demotion), the
  * metrics silently vanish — and the all-buckets-dropped case is EXACTLY
  * the one that must alarm. Accumulators ride task completion instead and
  * survive any plan rewrite. The trade: a stage retry or a re-executed
  * subtree (both legs of a self-join re-run the filter; adaptive planning
  * may elide one) can tally a drop once or twice — this is an
  * at-least-once alarm with counts, not an exact ledger, and zero stays
  * exactly zero. (An uncounted second self-join leg was tried and is
  * strictly worse: AQE can materialize it first, find it empty, and skip
  * the counted leg — silencing the alarm in the worst case.)
  *
  * A session listener logs a warning after any action during which new
  * drops accumulated.
  */
object CapMetrics {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private final case class Acc(groups: DoubleAccumulator, rows: LongAccumulator)
  private val accs =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, String), Acc]()
  private val logged =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  private val sessions =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  /** Totals per tag so far: (dropped groups, dropped rows). Values are
    * current as soon as the dropping action returns (accumulators merge
    * on task completion, before the job finishes).
    */
  def drops: Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    accs.asScala.iterator.map { case ((_, tag), a) =>
      (tag, (math.round(a.groups.value), a.rows.value): (Long, Long))
    }.toMap
  }

  def dropsFor(tag: String): (Long, Long) =
    drops.getOrElse(tag, (0L, 0L))

  /** Zero all counters (specs). */
  def reset(): Unit = {
    accs.forEach((_, a) => { a.groups.reset(); a.rows.reset() })
    logged.clear()
  }

  /** Keep rows whose group size ≤ `cap`, counting what the cap rejects.
    *
    * @param sizeCol    the row's group size (a window count, or the bucket
    *                   size on an aggregated one-row-per-bucket frame)
    * @param memberRows true when each input row is ONE MEMBER of a group
    *                   (rows += 1, groups += 1/size per rejected row —
    *                   Σ1/n over a whole group is exactly 1); false when
    *                   each row IS a whole group (groups += 1,
    *                   rows += size)
    */
  def cappedWhere(df: DataFrame, tag: String, sizeCol: Column, cap: Int,
      memberRows: Boolean): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val a = accs.computeIfAbsent((spark.sparkContext, tag), _ =>
      Acc(spark.sparkContext.doubleAccumulator(s"graft.cap.$tag.groups"),
        spark.sparkContext.longAccumulator(s"graft.cap.$tag.rows")))
    val (groups, rows) = (a.groups, a.rows)
    val keep = udf { n: Long =>
      if (n > cap) {
        rows.add(if (memberRows) 1L else n)
        groups.add(if (memberRows) 1.0 / n else 1.0)
      }
      n <= cap
    }.asNondeterministic()
    df.where(keep(sizeCol.cast("long")))
  }

  /** Corpus-scale form of [[cappedWhere]] for member tables grouped by
    * `groupCols`: group sizes come from a map-side-combinable count
    * aggregate, only the OVER-cap groups survive the filter (tallied
    * there, exactly once per group), and the member table drops their
    * rows through an anti-join on the same keys.
    *
    * Why not a `count().over(Window.partitionBy(groupCols))` on the
    * member table: WindowExec sorts its exchange and buffers every
    * partition's rows (`ExternalAppendOnlyUnsafeRowArray`) before
    * emitting — with hot groups and wide parallelism the buffers
    * exhausted the execution-memory pool (measured: the 20×-replica
    * inline probe OOM'd in exactly this spot, two stacked cap windows ×
    * 32 tasks). Here the member rows never shuffle for the cap at all:
    * the count agg moves map-combined partials, its over-cap survivor
    * set is at most (rows / cap) groups — the hot tail, usually a
    * handful — and AQE turns the anti-join into a broadcast at runtime,
    * so the cap costs one narrow agg plus a broadcast probe instead of
    * a corpus-wide sort. (No broadcast hint: a pathological reject set —
    * mass duplication across millions of keys — falls back to a shuffle
    * join and stays correct.)
    */
  def cappedByCount(df: DataFrame, tag: String, groupCols: Seq[String],
      cap: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val a = accs.computeIfAbsent((spark.sparkContext, tag), _ =>
      Acc(spark.sparkContext.doubleAccumulator(s"graft.cap.$tag.groups"),
        spark.sparkContext.longAccumulator(s"graft.cap.$tag.rows")))
    val (groups, rows) = (a.groups, a.rows)
    val overCap = udf { n: Long =>
      val over = n > cap
      if (over) { rows.add(n); groups.add(1.0) }
      over
    }.asNondeterministic()
    val rejects = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .where(overCap(col("__n")))
      .drop("__n")
    df.join(rejects, groupCols, "left_anti")
  }

  private def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!sessions.add(spark)) return
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        drops.foreach { case (tag, (g, r)) =>
          val (lg, lr) = logged.getOrDefault(tag, (0L, 0L))
          if (g > lg || r > lr) {
            logged.put(tag, (g, r))
            log.warn(s"graft.cap.$tag: dropped ${g - lg} over-cap group(s) " +
              s"/ ${r - lr} row(s) this query ($g/$r total) — a " +
              "mass-duplication event loses recall here; raise the cap or " +
              "run exact dedup first")
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
  }
}
