package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Stored-key-table layout shootout (round-12 task 3): the round-11
  * decomposition caught the BUCKETED band-key table reading 2× slower
  * than plain parquet at sf10 (fixed bucket count forgoing AQE sizing)
  * while the prefix-partitioned store won the pruned small-batch probes
  * — three layouts, no single recorded winner. This main probes ONE
  * corpus directory through all three layouts with the production
  * keyed-probe shape (`incrementalNearDupsWithKeys`, fixed replica-0
  * batch, stores built untimed) and prints one JSON line; run it per
  * decade and the union is the decision record.
  *
  * Note the probe JOIN never benefits from bucketing's zero-exchange
  * property — the stored side is semi-joined against a BROADCAST of
  * the batch's keys, so no exchange exists to elide on any layout;
  * bucketing only constrains the scan. That is why a layout can win
  * here on pure scan shape (file sizing, AQE freedom, parallelism).
  *
  * Usage: runMain graft.LayoutProbe [fixedDir] [dir] [iters]
  *   defaults: testdata/sf1, testdata/sf1, 3
  */
object LayoutProbe {

  def main(args: Array[String]): Unit = {
    def argOr(i: Int, d: String) = if (args.length > i) args(i) else d
    val fixedDir = argOr(0, "testdata/sf1")
    val dir = argOr(1, "testdata/sf1")
    val iters = argOr(2, "3").toInt
    val spark = GraftSession.local("graft-layout-probe")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val tag = new java.io.File(dir).getName.replace('.', '_')
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-layout-probe").toString

    val fixedBatch = Tables.documents(spark, fixedDir)
      .where(col("doc_id") < 100000000L && col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val docs = Tables.documents(spark, dir)

    def release(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time1(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      try { df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[layout-probe] failed: $e"); -1.0 }
      finally release()
    }

    // untimed ingest: the same capped key table in all three layouts
    val keys = Dedup.corpusBandKeys(docs, "doc_id", "text",
      numHashes = 16, bands = 4)
    graft.io.Layouts.replaceBucketed(keys, s"lp_keys_$tag", "band",
      parts, "key")
    keys.write.mode("overwrite").parquet(s"$scratch/plain")
    graft.io.Layouts.writePrefixPartitioned(keys, s"$scratch/pfx",
      "key", 256)

    def probe(layout: String): DataFrame = {
      val kf = layout match {
        case "bucketed" => spark.table(s"lp_keys_$tag")
        case "plain"    => spark.read.parquet(s"$scratch/plain")
        case "prefix"   => spark.read.parquet(s"$scratch/pfx")
          .drop(graft.io.Layouts.PrefixCol)
      }
      Dedup.incrementalNearDupsWithKeys(fixedBatch, kf, docs, "doc_id",
        "text", threshold = 0.95, numHashes = 16, bands = 4)
    }

    val layouts = Seq("bucketed", "plain", "prefix")
    layouts.foreach(l => time1(probe(l))) // warmup pass, discarded
    val acc = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    for (pass <- 1 to iters; l <- layouts) {
      val t = time1(probe(l))
      acc(l) = acc.getOrElse(l, Nil) :+ t
      System.err.println(s"[layout-probe] pass $pass $l: $t")
    }
    spark.sql(s"DROP TABLE IF EXISTS lp_keys_$tag")
    import Bench.fmt
    def minPos(ts: Seq[Double]) = { val ok = ts.filter(_ > 0)
      if (ok.isEmpty) -1.0 else ok.min }
    val cases = acc.map { case (l, ts) =>
      s""""$l":{"min":${fmt(minPos(ts))},"passes":[${ts.map(fmt).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(scratch)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case scala.util.control.NonFatal(_) => }
    spark.stop()
    println(s"""{"probe":"keyed store layout shootout","dir":"$dir","fixed":"$fixedDir","iters":$iters,"interleaved":true,"layouts":$cases}""")
  }
}
