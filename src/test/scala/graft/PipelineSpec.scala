package graft

import java.nio.file.Files

import graft.enrich.SyntheticFetcher
import graft.io.{Sinks, Sources}
import graft.pipeline.{Cursor, Pipelines}

class PipelineSpec extends SparkSuite {

  private def writeUrlList(n: Int): String = {
    val dir = Files.createTempDirectory("graft-pipe").toString
    val json = (0 until n)
      .map(i => s"""{"url": "https://example.org/media/$i"}""")
      .mkString("[", ",\n", "]")
    Sinks.writeText(s"$dir/urls.json", json)
    s"$dir/urls.json"
  }

  test("processor advances the cursor and writes shards + dead letters") {
    val urlPath = writeUrlList(100)
    val out = Files.createTempDirectory("graft-out").toString
    val c1 = Pipelines.processor(spark, urlPath, out,
      () => new SyntheticFetcher, maxRecords = 40,
      cursorPath = s"$out/cursor.txt", totalTarget = 100)
    assert(c1.totalProcessed === 40)
    assert(c1.hasMore)
    val c2 = Pipelines.processor(spark, urlPath, out,
      () => new SyntheticFetcher, maxRecords = 40,
      cursorPath = s"$out/cursor.txt", totalTarget = 100)
    val c3 = Pipelines.processor(spark, urlPath, out,
      () => new SyntheticFetcher, maxRecords = 40,
      cursorPath = s"$out/cursor.txt", totalTarget = 100)
    assert(c3.totalProcessed === 100)
    assert(!c3.hasMore)
    val shards = Sources.parquetTreeMerged(spark, s"$out/shards")
    assert(shards.count() + c3.skippedCount === 100L)
    // cursor round-trips through the key=value file
    assert(Cursor.read(s"$out/cursor.txt") === c3)
  }

  test("aggregator validates, merges and writes all four artifacts") {
    val urlPath = writeUrlList(60)
    val out = Files.createTempDirectory("graft-agg").toString
    Pipelines.processAll(spark, urlPath, out, () => new SyntheticFetcher,
      batchSize = 25, cursorPath = s"$out/cursor.txt", totalTarget = 60)
    val stats = Pipelines.aggregator(spark, s"$out/shards", s"$out/agg")
    assert(stats.totalRecords > 0)
    assert(new java.io.File(s"$out/agg/statistics.json").exists)
    assert(new java.io.File(s"$out/agg/aggregation_summary.md").exists)
    assert(Sources.parquet(spark, s"$out/agg/combined.parquet").count() === stats.totalRecords)
    val md = Files.readString(java.nio.file.Paths.get(s"$out/agg/aggregation_summary.md"))
    assert(md.contains("Total records"))
  }

  test("coordinator plan mirrors the reference cost model") {
    val p = Pipelines.plan(totalRecords = 25000, numSegments = 5,
      avgSecondsPerRecord = 5.0, maxConcurrent = 3)
    assert(p.segments.length === 5)
    assert(p.segments.head === ((0L, 5000L, "0k-5k")))
    assert(p.segments.last._2 === 25000L)
    // avg_time × segment / 3600 (coordinator.yml:280)
    assert(math.abs(p.estHoursPerSegment - 5.0 * 5000 / 3600) < 1e-9)
    assert(math.abs(p.estHoursTotal - 5.0 * 25000 / (3600 * 3)) < 1e-9)
  }

  test("canary gate passes on the synthetic corpus") {
    val urlPath = writeUrlList(30)
    val out = Files.createTempDirectory("graft-canary").toString
    val (ok, avg) = Pipelines.canary(spark, urlPath, out,
      () => new SyntheticFetcher, records = 10)
    assert(ok)
    assert(avg < 30.0)
  }

  test("schema-merge union null-fills heterogeneous shards") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-merge").toString
    Seq(("u1", 0.1, null: String, 0, "Mesh"))
      .toDF("url", "processing_time", "error", "batch_index", "media_type")
      .write.parquet(s"$dir/a.parquet")
    Seq(("u2", 0.2, null: String, 1, "12345"))
      .toDF("url", "processing_time", "error", "batch_index", "points")
      .write.parquet(s"$dir/b.parquet")
    val merged = Sources.parquetTreeMerged(spark, dir)
    assert(merged.count() === 2)
    assert(merged.columns.toSet.contains("media_type"))
    assert(merged.columns.toSet.contains("points"))
    assert(merged.where($"media_type".isNull).count() === 1)
  }
}
