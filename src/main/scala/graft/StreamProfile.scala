package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Profiling harness for the streaming-ingest constant (VERDICT r8
  * task 5): `streaming_ingest_keyed` costs ~17 s at x1 while its
  * growth is a healthy 1.15× — so the cost is per-RUN constant, not
  * data. This main decomposes that constant on the bench's exact
  * shape (sf0.1 documents, pre-seeded corpus + key table, AvailableNow
  * drain):
  *
  *   - `stream_b2` — the bench case verbatim (maxFilesPerTrigger=16
  *     over a 32-file input → 2 micro-batches)
  *   - `stream_b1` — same drain in ONE batch (mfpt=32): the b2−b1 gap
  *     is the marginal cost of a batch boundary (plan re-analysis +
  *     checkpoint commit + second heal-free pass)
  *   - `stream_noop` — identical stream machinery with a count()-only
  *     foreachBatch: the floor Structured Streaming itself imposes at
  *     this input size (offset log, file listing, commit fsyncs)
  *   - `batch_b2` — the SAME per-batch code (ingestNearDupKeyedBatch)
  *     driven directly, twice, no streaming machinery: stream_b2 −
  *     batch_b2 is what the machinery adds on top of the real work
  *
  * Usage: runMain graft.StreamProfile [sfDir] — prints one JSON line.
  */
object StreamProfile {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-stream-profile")
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-sprof").toString

    def seed(tag: String): (String, String, String, String) = {
      val base = s"$dir/$tag"
      docs.select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$base/corpus")
      Dedup.corpusBandKeys(spark.read.parquet(s"$base/corpus"), "doc_id",
          "text", numHashes = 16, bands = 4)
        .write.mode("overwrite").parquet(s"$base/keys")
      docs.select((col("doc_id") + lit(10000000000L)).as("doc_id"),
          col("text"))
        .repartition(32).write.mode("overwrite").parquet(s"$base/in")
      (s"$base/in", s"$base/corpus", s"$base/keys", s"$base/chk")
    }

    def streamRun(tag: String, mfpt: Int): Double = {
      val (in, corpus, keys, chk) = seed(tag)
      val schema = spark.read.parquet(in).schema
      time {
        graft.streaming.EventStreams.ingestNearDupKeyed(spark, schema,
            in, corpus, keys, chk, "doc_id", "text", threshold = 0.95,
            numHashes = 16, bands = 4, maxFilesPerTrigger = mfpt)
          .awaitTermination()
      }
    }

    def noopRun(tag: String, mfpt: Int): Double = {
      val (in, _, _, chk) = seed(tag)
      val schema = spark.read.parquet(in).schema
      time {
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", mfpt).parquet(in)
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
          .option("checkpointLocation", chk)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
    }

    def batchRun(tag: String, nBatches: Int): Double = {
      val (in, corpus, keys, _) = seed(tag)
      val input = spark.read.parquet(in)
      val healed = new java.util.concurrent.atomic.AtomicBoolean(false)
      time {
        (0 until nBatches).foreach { i =>
          graft.streaming.EventStreams.ingestNearDupKeyedBatch(spark,
            input.where(pmod(col("doc_id"), lit(nBatches)) === i),
            corpus, keys, "doc_id", "text", threshold = 0.95,
            numHashes = 16, bands = 4, healed)
        }
      }
    }

    val results = Seq(
      "stream_b2" -> streamRun("s2", 16),
      "stream_b1" -> streamRun("s1", 32),
      "stream_noop_b2" -> noopRun("n2", 16),
      "stream_noop_b1" -> noopRun("n1", 32),
      "batch_b2" -> batchRun("b2", 2),
      "batch_b1" -> batchRun("b1", 1))
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(dir)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case scala.util.control.NonFatal(_) => }
    val js = results.map { case (k, v) => s""""$k":${Bench.fmt(v)}""" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"profile":"streaming_ingest_keyed","sf":"$sfDir","cases":$js}""")
  }
}
