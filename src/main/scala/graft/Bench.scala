package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query executes to completion through the `noop` sink (full plan
  * runs, every row materialized — unlike count(), which lets Catalyst
  * prune work the query would really do). Warmup: every table is
  * touched, then each query runs once at the smallest scale factor so
  * codegen compilation and JIT warm on identical generated code before
  * the timed target-scale run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")

    Tables.names.foreach(n => Tables.load(spark, sfDir, n).write.format("noop")
      .mode("overwrite").save())

    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    val doWarmup = new java.io.File(warmupDir).isDirectory && warmupDir != sfDir
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    if (doWarmup) ordered.foreach { case (_, fn) =>
      try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }

    // median of 3 timed runs per query: sub-second timings are noisy
    // under a shared local JVM (GC, compilation), and the median is
    // robust to one bad run in either direction
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val results = ordered.map { case (name, fn) =>
      val times = (1 to iterations).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
