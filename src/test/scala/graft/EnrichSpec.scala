package graft

import java.nio.file.Files

import graft.enrich.{Enricher, Fetcher, SyntheticFetcher}
import graft.model.MediaSchema

class EnrichSpec extends SparkSuite {

  private def urlDf(urls: Seq[String]) = {
    import spark.implicits._
    urls.toDF("url")
  }

  test("enrichment produces superset-schema records with metadata") {
    val urls = (0 until 20).map(i => s"https://example.org/media/$i")
    val out = Enricher.enrich(urlDf(urls), () => new SyntheticFetcher)
    val recs = out.records.collect()
    assert(out.records.schema === MediaSchema.superset)
    assert(recs.nonEmpty)
    val byName = out.records.columns.zipWithIndex.toMap
    recs.foreach { r =>
      assert(!r.isNullAt(byName("url")))
      assert(!r.isNullAt(byName("processing_time")))
      assert(r.getInt(byName("attempt")) >= 1)
    }
  }

  test("transient failures are retried and recorded via attempt > 1") {
    // SyntheticFetcher fails the first attempt for urls whose md5 ends in 'f'
    val urls = (0 until 200).map(i => s"https://example.org/media/$i")
    val out = Enricher.enrich(urlDf(urls), () => new SyntheticFetcher,
      Enricher.Config(backoffMs = 1))
    import org.apache.spark.sql.functions._
    val retried = out.records.where(col("attempt") > 1).count()
    assert(retried > 0, "expected at least one retried record")
    assert(out.records.where(col("attempt") > 1 && col("error").isNotNull).count() === 0)
  }

  test("permanent failures dead-letter with reason max_attempts") {
    val urls = (0 until 400).map(i => s"https://example.org/media/$i")
    val out = Enricher.enrich(urlDf(urls), () => new SyntheticFetcher,
      Enricher.Config(backoffMs = 1))
    val dead = out.deadLetter.collect()
    assert(dead.nonEmpty, "expected md5-prefix-00 urls to dead-letter")
    assert(dead.forall(_.getAs[String]("reason") == "max_attempts"))
    assert(out.records.count() + dead.length === 400L)
  }

  test("slow fetches hit the record timeout and dead-letter") {
    class SlowFetcher extends Fetcher {
      def fetch(url: String): Map[String, String] = {
        if (url.endsWith("/7")) Thread.sleep(60000)
        Map("Media Type" -> "Mesh", "Media ID" -> "x")
      }
    }
    val urls = (0 until 10).map(i => s"https://example.org/media/$i")
    val out = Enricher.enrich(urlDf(urls), () => new SlowFetcher,
      Enricher.Config(recordTimeoutMs = 300))
    val dead = out.deadLetter.collect()
    assert(dead.length === 1)
    assert(dead.head.getAs[String]("reason") === "timeout")
    assert(dead.head.getAs[String]("url").endsWith("/7"))
    assert(out.records.count() === 9)
  }

  test("batch_index is contiguous from startIndex in input order") {
    val urls = (0 until 50).map(i => f"https://example.org/media/$i%03d")
    val out = Enricher.enrich(urlDf(urls), () => new SyntheticFetcher(
        failFirstSuffix = "zz", alwaysFailPrefix = "zz"),
      Enricher.Config(startIndex = 1000))
    import org.apache.spark.sql.functions._
    val idx = out.records.orderBy("url").select("batch_index").collect().map(_.getLong(0))
    assert(idx.toSeq === (1000L until 1050L))
  }

  test("media-type-conditional columns: mesh fields null for volumetric") {
    val urls = (0 until 100).map(i => s"https://example.org/media/$i")
    val out = Enricher.enrich(urlDf(urls), () => new SyntheticFetcher,
      Enricher.Config(backoffMs = 1))
    import org.apache.spark.sql.functions._
    // SyntheticFetcher never emits section fields beyond base — but the
    // conditional masking is what produced the all-null section columns
    val mesh = out.records.where(col("media_type") === "Mesh")
    assert(mesh.count() > 0)
    assert(mesh.where(col("slice_thickness").isNotNull).count() === 0)
  }
}
