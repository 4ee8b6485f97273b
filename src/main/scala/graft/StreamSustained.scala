package graft

import org.apache.spark.sql.functions._

/** Sustained-load latency profile for the streaming keyed near-dup
  * ingest (VERDICT r10 task 6): the four keyed ingest gates report
  * throughput-shaped evidence, and the scale probes measure two points
  * (1× vs R×); this main produces the LONGITUDINAL series — one
  * long AvailableNow drain of ≥ N micro-batches into a corpus that
  * GROWS as the run appends survivors, with the per-micro-batch wall
  * time captured from the engine's own progress events. The
  * "per-batch work independent of corpus size" claim passes when the
  * series is flat: by the last batch the corpus holds ~(N·batchRows +
  * seed) docs, ~11× the seed at the defaults, while the per-batch time
  * should not trend with it.
  *
  * Batch construction mirrors [[ScaleData]]'s invariants: each batch
  * is the seed corpus's doc_id ≡ 0 (mod 5) slice under an injective
  * per-batch token renaming (novel vocabulary — realistic mostly-new
  * content) except every 50th doc, which keeps its base text verbatim
  * (a planted duplicate the probe must catch and drop against the
  * ever-growing corpus). Ids shift to a disjoint 10¹⁰ + batch·10⁸
  * block. One file per batch + maxFilesPerTrigger = 1 ⇒ one
  * micro-batch per file.
  *
  * Emits one JSON line: the full per-batch series (batchId, seconds,
  * input rows) plus p50/p99, first-vs-last-decile p50s and an OLS
  * slope in ms/batch over batches 2.. (batch 0 pays stream start +
  * the once-per-run heal; batch 1 still JIT-warms the per-batch
  * plans). Archive under bench_history/.
  *
  * `targetBytes` scales the generational-compaction file target down
  * to the toy corpus (production default 512 MB; at the profile's
  * ~10 MB store nothing would graduate under it and every fold would
  * remain store-sized, masking exactly the bounded-stall behavior the
  * profile exists to measure).
  *
  * Usage: runMain graft.StreamSustained [sfDir] [nBatches=100]
  *          [targetBytes=default]
  */
object StreamSustained {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 100
    val targetBytes =
      if (args.length > 2) args(2).toLong
      else graft.streaming.EventStreams.DefaultStoreTargetBytes
    val spark = GraftSession.local("graft-stream-sustained")
    import graft.ops.Dedup

    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sustained").toString
    // seed corpus + key table (the pre-existing deployment state)
    docs.select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$dir/corpus")
    Dedup.corpusBandKeys(spark.read.parquet(s"$dir/corpus"), "doc_id",
        "text", numHashes = 16, bands = 4)
      .write.mode("overwrite").parquet(s"$dir/keys")
    // one parquet file per future micro-batch, novel vocabulary per
    // batch, planted every-50th verbatim duplicates
    val slice = docs.where(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    (0 until nBatches).foreach { i =>
      val renamed = regexp_replace(col("text"), "(\\S+)", s"$$1_sb$i")
      slice.select(
          (col("doc_id") + lit(10000000000L + i * 100000000L)).as("doc_id"),
          when(col("doc_id") % 50 === 0, col("text"))
            .otherwise(renamed).as("text"))
        .coalesce(1)
        .write.mode("append").parquet(s"$dir/in")
    }

    // per-micro-batch wall time from the engine's own progress events —
    // not wrapped timers, so scheduling gaps between batches don't leak
    // into a batch's number. Read from the TERMINATED query's
    // recentProgress (synchronous — complete once awaitTermination
    // returns), not a StreamingQueryListener: listener events are
    // delivered asynchronously, so reading right after termination
    // could miss the LAST batches — silently truncating the tail the
    // last-decile p50 and the OLS slope depend on (round-11 advisor
    // finding). Retention must cover the run: the default keeps only
    // ~100 updates.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (nBatches + 16).toString)
    val schema = spark.read.parquet(s"$dir/in").schema
    val query = graft.streaming.EventStreams.ingestNearDupKeyed(spark,
        schema, s"$dir/in", s"$dir/corpus", s"$dir/keys", s"$dir/chk",
        "doc_id", "text", threshold = 0.95, numHashes = 16, bands = 4,
        maxFilesPerTrigger = 1, targetBytes = targetBytes)
    query.awaitTermination()

    val corpusRows = spark.read.parquet(s"$dir/corpus").count()
    // bounded-store evidence: the compaction lifecycle's pass condition
    // is that file counts do NOT track batch count
    val corpusFiles = graft.io.Layouts.dataFileCount(spark, s"$dir/corpus")
    val keyFiles = graft.io.Layouts.dataFileCount(spark, s"$dir/keys")
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
    // trend over the steady-state tail: batch 0 pays stream start + the
    // once-per-run heal, batch 1 the per-batch plan JIT
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
    val firstDecile = steady.take(math.max(1, steady.size / 10))
    val lastDecile = steady.takeRight(math.max(1, steady.size / 10))
    val seriesJson = rows.map { case (b, s, n) =>
      s"""{"batch":$b,"sec":${Bench.fmt(s)},"rows":$n}"""
    }.mkString("[", ",", "]")
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(dir)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case scala.util.control.NonFatal(_) => }
    spark.stop()
    println(
      s"""{"profile":"streaming_sustained","sf":"$sfDir","n_batches":${rows.size},"final_corpus_rows":$corpusRows,"final_corpus_files":$corpusFiles,"final_key_files":$keyFiles,"max_store_files":${graft.streaming.EventStreams.DefaultMaxStoreFiles},"target_bytes":$targetBytes,"p50_sec":${Bench.fmt(pct(ts, 0.5))},"p99_sec":${Bench.fmt(pct(ts, 0.99))},"steady_first_decile_p50":${Bench.fmt(pct(firstDecile, 0.5))},"steady_last_decile_p50":${Bench.fmt(pct(lastDecile, 0.5))},"ols_slope_ms_per_batch":${Bench.fmt(slopeMsPerBatch)},"series":$seriesJson}""")
  }
}
