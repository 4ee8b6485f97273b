package graft

import org.apache.spark.sql.functions._

/** Longitudinal latency/file-growth profile of the streaming IVFADC
  * index gate ([[graft.streaming.EventStreams.ingestPqIndex]]) — the
  * round-13 gap: the keyed text/embedding gates have
  * [[StreamSustained]], but the PQ gate appended centroid-partitioned
  * files per batch with NO compaction trigger and no longitudinal
  * evidence. One long AvailableNow drain of N one-file micro-batches
  * (novel ids per batch — the replay guard's anti-join stays a no-op,
  * which is the honest steady state for an index ingest), per-batch
  * wall time from the engine's own progress events, and the per-cell
  * file-count distribution at the end: the pass condition is that
  * per-cell file counts do NOT track batch count (the generational
  * per-cell fold bounds them) and the latency series does not trend.
  *
  * `maxStoreFiles` is deliberately small-able and `targetBytes`
  * scalable so the toy corpus (2k vectors at sf0.1) exercises the
  * trigger many times — at the defaults a 100-batch run triggers each
  * cell at most once.
  *
  * Usage: runMain graft.PqStreamSustained [sfDir] [nBatches=100]
  *          [maxStoreFiles=16] [targetBytes=1048576] [numCells=16]
  */
object PqStreamSustained {

  def main(args: Array[String]): Unit = {
    def argOr(i: Int, d: String) = if (args.length > i) args(i) else d
    val sfDir = argOr(0, "/root/testdata/sf0.1")
    val nBatches = argOr(1, "100").toInt
    val maxStoreFiles = argOr(2, "16").toInt
    val targetBytes = argOr(3, "1048576").toLong
    val numCells = argOr(4, "16").toInt
    val spark = GraftSession.local("graft-pq-stream-sustained")
    import graft.ops.Similarity

    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-sustained").toString
    // frozen model, trained once at deployment (the gate's contract)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      numCells)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", 8,
      numCells)
    // one parquet file per micro-batch: the same vectors under fresh
    // disjoint ids each batch (vector CONTENT is irrelevant to file
    // growth; novel ids mean every row appends, the worst case)
    val slice = emb.where(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding"))
    (0 until nBatches).foreach { i =>
      slice.select(
          (col("vec_id") + lit(10000000000L + i * 100000000L)).as("vec_id"),
          col("embedding"))
        .coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
    }

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (nBatches + 16).toString)
    val schema = spark.read.parquet(s"$dir/in").schema
    val query = graft.streaming.EventStreams.ingestPqIndex(spark, schema,
      s"$dir/in", s"$dir/codes", s"$dir/chk", "vec_id", "embedding",
      cbs, centroids, maxFilesPerTrigger = 1,
      maxStoreFiles = maxStoreFiles, targetBytes = targetBytes)
    query.awaitTermination()

    val indexRows = spark.read.parquet(s"$dir/codes").count()
    // per-cell file counts: the bounded-store pass condition
    val cellFiles = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.isDirectory)
      .map(d => d.getName -> graft.io.Layouts.dataFileCount(spark,
        d.getAbsolutePath))
      .sortBy(_._1)
    val rows = query.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map { p =>
        val ms = Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(0L)
        (p.batchId, ms / 1e3, p.numInputRows)
      }
      .sortBy(_._1)
    val ts = rows.map(_._2)
    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) -1.0
      else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))
    val steady = ts.drop(2)
    val slopeMsPerBatch =
      if (steady.size < 3) 0.0
      else {
        val n = steady.size
        val xs = (0 until n).map(_.toDouble)
        val xm = xs.sum / n
        val ym = steady.sum / n
        val num = xs.zip(steady).map { case (x, y) => (x - xm) * (y - ym) }.sum
        1000.0 * num / xs.map(x => (x - xm) * (x - xm)).sum
      }
    val seriesJson = rows.map { case (b, s, n) =>
      s"""{"batch":$b,"sec":${Bench.fmt(s)},"rows":$n}"""
    }.mkString("[", ",", "]")
    val cellsJson = cellFiles.map { case (c, n) => s""""$c":$n""" }
      .mkString("{", ",", "}")
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(dir)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case scala.util.control.NonFatal(_) => }
    spark.stop()
    println(
      s"""{"profile":"pq_streaming_sustained","sf":"$sfDir","n_batches":${rows.size},"index_rows":$indexRows,"num_cells":$numCells,"max_store_files":$maxStoreFiles,"target_bytes":$targetBytes,"max_cell_files":${if (cellFiles.isEmpty) 0 else cellFiles.map(_._2).max},"total_files":${cellFiles.map(_._2).sum},"p50_sec":${Bench.fmt(pct(ts, 0.5))},"p99_sec":${Bench.fmt(pct(ts, 0.99))},"ols_slope_ms_per_batch":${Bench.fmt(slopeMsPerBatch)},"cell_files":$cellsJson,"series":$seriesJson}""")
  }
}
