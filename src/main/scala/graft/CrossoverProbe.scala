package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Pruned-vs-fullscan crossover curve (round-12 task 6): the round-11
  * prefix-pruned probe record rests on a 20-doc worst-case batch;
  * serving batches vary, and a batch whose band keys cover the whole
  * prefix space degrades the pruned read to a full scan PLUS the
  * per-directory listing overhead. This main probes ONE corpus
  * directory with three fixed replica-0 batch sizes (~20 / ~200 /
  * ~1667 docs — the 20-doc batch is all planted clique docs, the
  * worst-case output mass) through BOTH probe forms, recording times,
  * match counts (identical by spec), and each batch's PREFIX COVERAGE
  * (distinct `__pfx` values of its band keys, of 256) — the quantity
  * the crossover rule of thumb is stated in, because coverage is what
  * a caller can compute driver-side BEFORE choosing an API.
  *
  * Usage: runMain graft.CrossoverProbe [fixedDir] [dir] [iters]
  *   defaults: testdata/sf1, testdata/sf10, 2
  */
object CrossoverProbe {

  def main(args: Array[String]): Unit = {
    def argOr(i: Int, d: String) = if (args.length > i) args(i) else d
    val fixedDir = argOr(0, "testdata/sf1")
    val dir = argOr(1, "testdata/sf10")
    val iters = argOr(2, "2").toInt
    val spark = GraftSession.local("graft-crossover-probe")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-crossover").toString

    val base = Tables.documents(spark, fixedDir)
      .where(col("doc_id") < 100000000L)
      .select(col("doc_id"), col("text"))
    val batches = Seq(
      "b20" -> base.where(col("doc_id") % 50 === 0 && col("doc_id") < 1000),
      "b200" -> base.where(col("doc_id") % 25 === 0),
      "b1667" -> base.where(col("doc_id") % 3 === 0))

    def release(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time1(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      try { val n = df.count(); ((System.nanoTime() - t0) / 1e9, n) }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[crossover] failed: $e"); (-1.0, -1L) }
      finally release()
    }

    // untimed ingest: prefix-partitioned key + corpus stores (the
    // round-12 single stored-key format) and a plain key table for the
    // full-scan arm
    val docs = Tables.documents(spark, dir)
    val keys = Dedup.corpusBandKeys(docs, "doc_id", "text",
      numHashes = 16, bands = 4)
    graft.io.Layouts.writePrefixPartitioned(keys, s"$scratch/keys",
      "key", 256)
    graft.io.Layouts.writePrefixPartitioned(
      docs.select(col("doc_id"), col("text")), s"$scratch/corpus",
      "doc_id", 256)
    keys.write.mode("overwrite").parquet(s"$scratch/plainkeys")

    val coverage = batches.map { case (bt, b) =>
      bt -> Dedup.corpusBandKeys(b, "doc_id", "text", numHashes = 16,
          bands = 4)
        .select(graft.io.Layouts.prefixOf(col("key"), 256))
        .distinct().count()
    }.toMap
    val counts = batches.map { case (bt, b) => bt -> b.count() }.toMap

    def pruned(b: DataFrame): DataFrame =
      Dedup.incrementalNearDupsPruned(b, s"$scratch/keys",
        s"$scratch/corpus", "doc_id", "text", threshold = 0.95,
        numHashes = 16, bands = 4, prefixes = 256)
    def full(b: DataFrame): DataFrame =
      Dedup.incrementalNearDupsWithKeys(b,
        spark.read.parquet(s"$scratch/plainkeys"), docs, "doc_id",
        "text", threshold = 0.95, numHashes = 16, bands = 4)
    // the r13 dispatcher: picks its arm from the stores' markers +
    // on-disk bytes at the DEFAULT threshold — the probe records the
    // decision it makes at this corpus scale and times it end to end
    def auto(b: DataFrame): DataFrame =
      Dedup.incrementalNearDupsAuto(b, s"$scratch/keys",
        s"$scratch/corpus", "doc_id", "text", threshold = 0.95,
        numHashes = 16, bands = 4)
    val storeBytes = Seq("keys", "corpus")
      .map(t => t -> graft.io.Layouts.storeBytes(spark, s"$scratch/$t"))
      .toMap
    val decision = graft.io.Layouts.prunedDispatch(spark,
        Seq(s"$scratch/keys", s"$scratch/corpus"))
      .fold("full")(_ => "pruned")

    time1(pruned(batches.head._2)); time1(full(batches.head._2)) // warmup
    val acc =
      scala.collection.mutable.LinkedHashMap[String, List[(Double, Long)]]()
    for (pass <- 1 to iters; (bt, b) <- batches;
         mode <- Seq("pruned", "full", "auto")) {
      val r = mode match {
        case "pruned" => time1(pruned(b))
        case "full"   => time1(full(b))
        case _        => time1(auto(b))
      }
      val k = s"${bt}_$mode"
      acc(k) = acc.getOrElse(k, Nil) :+ r
      System.err.println(s"[crossover] pass $pass $k: $r")
    }
    import Bench.fmt
    def minPos(ts: Seq[Double]) = { val ok = ts.filter(_ > 0)
      if (ok.isEmpty) -1.0 else ok.min }
    val cases = acc.map { case (k, rs) =>
      s""""$k":{"min_sec":${fmt(minPos(rs.map(_._1)))},"matches":${rs.head._2},"passes":[${rs.map(r => fmt(r._1)).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val cov = coverage.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val cnt = counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(scratch)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case scala.util.control.NonFatal(_) => }
    spark.stop()
    val bytesJson = storeBytes.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"probe":"pruned vs fullscan crossover","dir":"$dir","fixed":"$fixedDir","prefixes":256,"store_bytes":$bytesJson,"auto_decision":"$decision","prune_min_store_bytes":${graft.io.Layouts.DefaultPruneMinStoreBytes},"batch_docs":$cnt,"batch_prefix_coverage":$cov,"iters":$iters,"cases":$cases}""")
  }
}
