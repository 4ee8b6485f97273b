package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** X7: artifact retention — the reference keeps uploaded shard artifacts
  * for 5 days (reference .github/workflows/test_parquet_processor.yml:85-93).
  *
  * Both policies are metadata-only: one `listStatus` of the retention
  * root, then deletes — no data is read, so cost is O(children) driver
  * RPCs regardless of how many petabytes the children hold. Deletion is
  * recursive per child (a child is a whole run/shard directory).
  */
object Retention {

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (FileSystem.get(p.toUri, spark.sessionState.newHadoopConf()), p)
  }

  /** Delete direct children of `dir` whose modification time is older
    * than `maxAgeMs` before `nowMs`. `nowMs` is explicit so retention
    * runs are reproducible and testable. Returns deleted paths.
    */
  def expireOlderThan(spark: SparkSession, dir: String, maxAgeMs: Long,
      nowMs: Long): Seq[String] = {
    val (filesystem, root) = fs(spark, dir)
    if (!filesystem.exists(root)) return Nil
    filesystem.listStatus(root).toSeq
      .filter(st => nowMs - st.getModificationTime > maxAgeMs)
      .map { st =>
        filesystem.delete(st.getPath, true)
        st.getPath.toString
      }
  }

  /** Keep the `n` newest direct children of `dir` by modification time
    * (ties broken by path for determinism); delete the rest. Returns
    * deleted paths.
    */
  def keepNewest(spark: SparkSession, dir: String, n: Int): Seq[String] = {
    val (filesystem, root) = fs(spark, dir)
    if (!filesystem.exists(root)) return Nil
    filesystem.listStatus(root).toSeq
      .sortBy(st => (-st.getModificationTime, st.getPath.toString))
      .drop(n)
      .map { st =>
        filesystem.delete(st.getPath, true)
        st.getPath.toString
      }
  }
}
