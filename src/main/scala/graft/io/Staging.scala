package graft.io

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: artifact (zip) ingestion — the reference downloads per-run GitHub
  * artifact zips and extracts them into `artifacts/<segment>/` before the
  * aggregator reads the tree
  * (reference .github/workflows/test_parquet_aggregator.yml:62-99,112-117).
  *
  * Spark-first shape: archives are read with the `binaryFile` source (one
  * task per archive, pushdown-pruned by glob), and entries are exploded
  * per-partition with `java.util.zip` — archive bytes never leave the
  * executor that scanned them, and extraction parallelism is the archive
  * count. The driver only ever sees metadata.
  */
object Staging {

  /** One extracted archive member. `content` is the raw entry bytes —
    * route parquet members to a staged tree ([[extractTo]]) for the S4
    * readers, or parse text/JSON members directly from the bytes.
    */
  case class ZipEntryRow(archive: String, entry: String, size: Long,
      content: Array[Byte])

  /** Explode every `*.zip` under `dir` (recursively) into one row per
    * file entry. Directory entries are skipped. Entry sizes come from the
    * decompressed bytes, not the zip header (headers may carry -1 for
    * streamed archives).
    *
    * Scale: each archive is a single `binaryFile` row, so memory per task
    * is one archive + its largest entry; thousands of shard archives
    * extract embarrassingly parallel. Entries stream in archive order —
    * no random access, so this also reads non-seekable object-store
    * copies.
    */
  def zipEntries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .option("recursiveFileLookup", true)
      .load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (path, bytes) =>
          val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
          Iterator.continually(zin.getNextEntry)
            .takeWhile(_ != null)
            .filterNot(_.isDirectory)
            .map { e =>
              val content = zin.readAllBytes()
              ZipEntryRow(path, e.getName, content.length.toLong, content)
            }
        }
      }
      .toDF()
  }

  /** Extract every archive under `zipDir` into `outDir/<entry-path>`,
    * preserving member paths — the reference's unzip-to-artifacts step.
    * Returns the number of entries written. After staging, the S4 tree
    * readers ([[Sources.parquetTree]]) consume `outDir` directly.
    *
    * Writes happen executor-side through Hadoop `FileSystem`, so the
    * target can be any supported scheme; the session's Hadoop conf is
    * shipped as a plain map (the executors rebuild it) because the
    * extraction tasks, not the driver, own the I/O.
    */
  def extractTo(spark: SparkSession, zipDir: String, outDir: String): Long = {
    import spark.implicits._
    val confMap = spark.sessionState.newHadoopConf().asScala
      .map(e => e.getKey -> e.getValue).toMap
    val confBc = spark.sparkContext.broadcast(confMap)
    zipEntries(spark, zipDir)
      .select("entry", "content").as[(String, Array[Byte])]
      .mapPartitions { rows =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val out = new Path(outDir)
        val fs = FileSystem.get(out.toUri, conf)
        var written = 0L
        rows.foreach { case (entry, content) =>
          val target = new Path(out, entry)
          val os = fs.create(target, true)
          try os.write(content) finally os.close()
          written += 1
        }
        Iterator.single(written)
      }
      .reduce(_ + _)
  }
}
