package graft.cli

import org.apache.spark.sql.SparkSession

import graft.enrich.{Fetcher, HtmlFetcher, SyntheticFetcher}
import graft.pipeline.Pipelines

/** CLI mirroring the reference's workflow_dispatch surfaces
  * (.github/workflows/test_parquet_processor.yml:4-33,
  * test_parquet_coordinator.yml:4-25, test_parquet_aggregator.yml:4-14).
  *
  * Usage:
  *   graft.cli.Main process   <urlList.json> <outDir> [maxRecords] [totalTarget]
  *   graft.cli.Main canary    <urlList.json> <outDir> [records]
  *   graft.cli.Main aggregate <shardsDir> <outDir>
  *   graft.cli.Main plan      <totalRecords> <numSegments> <avgSecPerRecord>
  *   graft.cli.Main query     <tableDir> <name|SQL> [outDir]
  *   graft.cli.Main release   <corpusParquet> <outDir> [sampleRate]
  *
  * `query` runs either a named `SparkEntry.queries` entry (e.g.
  * `q01_stats_global`) or, when the argument is not a known name, an
  * arbitrary SQL string over the tables registered as temp views
  * (`region … documents embeddings`, with every `graft_*` function
  * available — the ad-hoc surface a library user gets). Results print
  * (20 rows) or land in `outDir` as parquet when given.
  *
  * GRAFT_FETCHER selects the enrichment fetcher: `html` (the real
  * HTTP/HTML scrape, the reference's live behavior) or `synthetic`
  * (default — deterministic md5-derived records, no network; what the
  * hermetic test environment runs).
  */
object Main {

  private def session(): SparkSession = graft.GraftSession.local("graft-cli")

  private def fetcher(): () => Fetcher =
    sys.env.getOrElse("GRAFT_FETCHER", "synthetic") match {
      case "html" => () => new HtmlFetcher()
      case _ => () => new SyntheticFetcher
    }

  def main(args: Array[String]): Unit = args.toList match {
    case "process" :: urlList :: outDir :: rest =>
      val maxRecords = rest.headOption.map(_.toInt).getOrElse(50)
      val target = rest.drop(1).headOption.map(_.toLong).getOrElse(Long.MaxValue)
      val spark = session()
      val c = Pipelines.processAll(spark, urlList, outDir,
        fetcher(), maxRecords, s"$outDir/cursor.txt", target)
      println(c.toKeyValue)
      spark.stop()

    case "canary" :: urlList :: outDir :: rest =>
      val records = rest.headOption.map(_.toInt).getOrElse(10)
      val spark = session()
      val (ok, avg) = Pipelines.canary(spark, urlList, outDir,
        fetcher(), records)
      println(s"success=$ok")
      println(f"avg_time=$avg%.4f")
      spark.stop()
      if (!ok) sys.exit(1)

    case "aggregate" :: shardsDir :: outDir :: Nil =>
      val spark = session()
      val stats = Pipelines.aggregator(spark, shardsDir, outDir)
      println(s"total_records=${stats.totalRecords}")
      println(f"avg_processing_time=${stats.avgProcessingTime}%.4f")
      println(f"error_rate=${stats.errorRate}%.4f")
      spark.stop()

    case "query" :: tableDir :: q :: rest =>
      val spark = session()
      val df = graft.SparkEntry.queries.get(q) match {
        case Some(fn) => fn(spark, tableDir)
        case None =>
          // existence via the Hadoop FS of the PATH, not java.io.File —
          // the CLI supports cluster masters (SPARK_MASTER), where the
          // table dir can be hdfs://, s3a://, …; a local-File check is
          // always false there and would register zero temp views
          val hconf = spark.sparkContext.hadoopConfiguration
          graft.Tables.names.foreach { t =>
            val p = new org.apache.hadoop.fs.Path(s"$tableDir/$t.parquet")
            if (p.getFileSystem(hconf).exists(p))
              graft.Tables.load(spark, tableDir, t).createOrReplaceTempView(t)
          }
          spark.sql(q)
      }
      rest.headOption match {
        case Some(outDir) =>
          df.write.mode("overwrite").parquet(outDir)
          println(s"rows=${spark.read.parquet(outDir).count()}")
        case None => df.show(20, truncate = false)
      }
      spark.stop()

    case "release" :: corpus :: outDir :: rest =>
      val rate = rest.headOption.map(_.toDouble).getOrElse(0.05)
      val spark = session()
      Pipelines.datasetRelease(spark, corpus, outDir, sampleRate = rate)
      println(s"release artifacts written to $outDir")
      spark.stop()

    case "plan" :: total :: segments :: avgSec :: Nil =>
      val p = Pipelines.plan(total.toLong, segments.toInt, avgSec.toDouble)
      p.segments.foreach { case (s, e, n) => println(s"segment,$s,$e,$n") }
      println(f"est_hours_per_segment=${p.estHoursPerSegment}%.4f")
      println(f"est_hours_total=${p.estHoursTotal}%.4f")

    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      System.err.println(
        "commands: process | canary | aggregate | query | release | plan")
      sys.exit(2)
  }
}
