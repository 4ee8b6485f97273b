package graft

import org.apache.spark.sql.functions._

import graft.io.Layouts

/** A/B probe of the keyed-gate store-maintenance policies in the WALL
  * regime (round-13 task 1): seed store bytes ≫ maxStoreFiles ×
  * targetBytes, so the round-12 policy — raw `dataFileCount` trigger +
  * whole-store [[Layouts.compactInPlace]] — re-fires on EVERY
  * micro-batch (the post-compaction file count alone exceeds the
  * trigger) and rewrites the entire corpus each time, while the
  * round-13 policy — sub-graduation [[Layouts.smallFileCount]] trigger
  * + generational [[Layouts.compactGenerational]] — folds only batch
  * appends and residue, keeping per-batch maintenance work O(new
  * data).
  *
  * Both arms drive the IDENTICAL ingest seam
  * (`EventStreams.ingestNearDupKeyedBatch` with internal compaction
  * disabled) over the same pre-written batch files and seed stores;
  * only the post-batch maintenance policy differs, applied exactly as
  * each round's gate wires it. Per-batch wall time covers batch +
  * policy (what a stream would observe); compaction events record the
  * bytes they rewrote. A final row-multiset digest proves the two
  * arms' corpora identical — the policies must never change gate
  * OUTPUT. Arms run sequentially after a shared warmup drain (JVM
  * warmth; the legacy arm runs FIRST, so any residual warmup bias
  * favors it, against the round's claim).
  *
  * Usage: runMain graft.CompactionWallProbe
  *          [seedDir=testdata/sf1] [batchSrc=/root/testdata/sf0.1]
  *          [nBatches=30] [targetBytes=65536] [maxStoreFiles=8]
  */
object CompactionWallProbe {

  def main(args: Array[String]): Unit = {
    def argOr(i: Int, d: String) = if (args.length > i) args(i) else d
    val seedDir = argOr(0, "testdata/sf1")
    val batchSrc = argOr(1, "/root/testdata/sf0.1")
    val nBatches = argOr(2, "30").toInt
    val target = argOr(3, "65536").toLong
    val maxFiles = argOr(4, "8").toInt
    val spark = GraftSession.local("graft-compaction-wall-probe")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-wallprobe").toString
    val hconf = spark.sparkContext.hadoopConfiguration

    // one parquet file per micro-batch: novel vocabulary per batch,
    // every 50th doc a verbatim planted duplicate (the StreamSustained
    // construction), ids in a disjoint 10^10 block
    val slice = Tables.documents(spark, batchSrc)
      .where(col("doc_id") % 50 === 0)
      .select(col("doc_id"), col("text"))
    (0 until nBatches).foreach { i =>
      val renamed = regexp_replace(col("text"), "(\\S+)", s"$$1_wb$i")
      slice.select(
          (col("doc_id") + lit(10000000000L + i * 100000000L)).as("doc_id"),
          when(col("doc_id") % 50 === 0 && col("doc_id") % 2500 === 0,
              col("text"))
            .otherwise(renamed).as("text"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$scratch/in/b$i")
    }
    val seed = Tables.documents(spark, seedDir)
      .select(col("doc_id"), col("text"))

    def smallBytes(d: String): Long = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }.filter(_.getLen < math.max(1L, target / 2)).map(_.getLen).sum
    }

    /** Drive one arm: seed stores, replay all batches through the seam
      * with the arm's maintenance policy, record per-batch seconds and
      * compaction events.
      */
    def runArm(tag: String,
        policy: String => Option[Long]): (Seq[Double], Seq[(Int, Long)],
        Long, String, Int, Long) = {
      val corpus = s"$scratch/$tag/corpus"
      val keys = s"$scratch/$tag/keys"
      seed.coalesce(1).write.mode("overwrite").parquet(corpus)
      graft.ops.Dedup.corpusBandKeys(spark.read.parquet(corpus), "doc_id",
          "text", numHashes = 16, bands = 4)
        .write.mode("overwrite").parquet(keys)
      val healed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val times = Array.ofDim[Double](nBatches)
      val events = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
      (0 until nBatches).foreach { i =>
        val batch = spark.read.parquet(s"$scratch/in/b$i")
        val t0 = System.nanoTime()
        graft.streaming.EventStreams.ingestNearDupKeyedBatch(spark, batch,
          corpus, keys, "doc_id", "text", threshold = 0.95,
          numHashes = 16, bands = 4, healed, maxStoreFiles = 0)
        Seq(corpus, keys).foreach { d =>
          policy(d).foreach(b => events += ((i, b)))
        }
        times(i) = (System.nanoTime() - t0) / 1e9
      }
      // decimal sum: exact, order-independent, and immune to ANSI
      // long-overflow (xxhash64 values span the full long range)
      val digest = spark.read.parquet(corpus)
        .agg(count(lit(1)),
          sum(xxhash64(col("doc_id"), col("text")).cast("decimal(38,0)")))
        .head()
      (times.toSeq, events.toSeq, digest.getLong(0),
        digest.getDecimal(1).toBigInteger.toString,
        Layouts.dataFileCount(spark, corpus) +
          Layouts.dataFileCount(spark, keys),
        Layouts.storeBytes(spark, corpus) + Layouts.storeBytes(spark, keys))
    }

    def legacy(d: String): Option[Long] =
      if (Layouts.dataFileCount(spark, d) > maxFiles) {
        val b = Layouts.storeBytes(spark, d)
        Layouts.compactInPlace(spark, d, target); Some(b)
      } else None
    def generational(d: String): Option[Long] =
      if (Layouts.smallFileCount(spark, d, math.max(1L, target / 2))
          > maxFiles) {
        val b = smallBytes(d)
        Layouts.compactGenerational(spark, d, target); Some(b)
      } else None

    // shared warmup drain into a throwaway store pair: pays stream-free
    // seam JIT before either timed arm
    {
      val w = new java.util.concurrent.atomic.AtomicBoolean(false)
      seed.limit(2000).coalesce(1).write.mode("overwrite")
        .parquet(s"$scratch/warm/corpus")
      graft.ops.Dedup.corpusBandKeys(
          spark.read.parquet(s"$scratch/warm/corpus"), "doc_id", "text",
          numHashes = 16, bands = 4)
        .write.mode("overwrite").parquet(s"$scratch/warm/keys")
      (0 until 3).foreach { i =>
        graft.streaming.EventStreams.ingestNearDupKeyedBatch(spark,
          spark.read.parquet(s"$scratch/in/b$i"), s"$scratch/warm/corpus",
          s"$scratch/warm/keys", "doc_id", "text", threshold = 0.95,
          numHashes = 16, bands = 4, w, maxStoreFiles = 0)
      }
    }

    val (tL, eL, nL, hL, fL, bL) = runArm("legacy", legacy)
    val (tG, eG, nG, hG, fG, bG) = runArm("gen", generational)
    require(nL == nG && hL == hG,
      s"ARMS DIVERGED: legacy ($nL, $hL) vs generational ($nG, $hG) — " +
        "maintenance policy changed gate output")

    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) -1.0
      else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))
    import Bench.fmt
    def armJson(ts: Seq[Double], ev: Seq[(Int, Long)], files: Int,
        bytes: Long): String = {
      val series = ts.zipWithIndex
        .map { case (s, i) => s"""{"batch":$i,"sec":${fmt(s)}}""" }
        .mkString("[", ",", "]")
      val events = ev.map { case (i, b) => s"""{"batch":$i,"bytes":$b}""" }
        .mkString("[", ",", "]")
      s"""{"p50_sec":${fmt(pct(ts, 0.5))},"p99_sec":${fmt(pct(ts, 0.99))},""" +
        s""""total_sec":${fmt(ts.sum)},"n_compactions":${ev.size},""" +
        s""""rewritten_bytes":${ev.map(_._2).sum},""" +
        s""""final_files":$files,"final_store_bytes":$bytes,""" +
        s""""compactions":$events,"series":$series}"""
    }
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(scratch)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case scala.util.control.NonFatal(_) => }
    spark.stop()
    println(
      s"""{"probe":"compaction_wall","seed":"$seedDir","batch_src":"$batchSrc","n_batches":$nBatches,"target_bytes":$target,"max_store_files":$maxFiles,"corpus_rows":$nL,"digest_equal":true,"legacy":${armJson(tL, eL, fL, bL)},"generational":${armJson(tG, eG, fG, bG)}}""")
  }
}
