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
    *
    * MTIME CAVEAT: directory modification time is meaningful on local
    * filesystems and HDFS only. On object stores (S3A and friends)
    * "directories" are synthetic and expose no useful mtime — use the
    * `*Stamped` variants there, which key on a run timestamp encoded in
    * the child's NAME instead of filesystem metadata.
    */
  def expireOlderThan(spark: SparkSession, dir: String, maxAgeMs: Long,
      nowMs: Long): Seq[String] = {
    val (filesystem, root) = fs(spark, dir)
    if (!filesystem.exists(root)) return Nil
    filesystem.listStatus(root).toSeq
      .filter(st => nowMs - st.getModificationTime > maxAgeMs)
      .flatMap { st =>
        // report only what was ACTUALLY deleted: delete() returns false
        // on failure (permissions, concurrent removal) and a retention
        // audit must not claim reclaimed space that still exists
        if (filesystem.delete(st.getPath, true)) Some(st.getPath.toString)
        else None
      }
  }

  /** Keep the `n` newest direct children of `dir` by modification time
    * (ties broken by path for determinism); delete the rest. Returns
    * deleted paths. Same mtime caveat as [[expireOlderThan]].
    */
  def keepNewest(spark: SparkSession, dir: String, n: Int): Seq[String] = {
    val (filesystem, root) = fs(spark, dir)
    if (!filesystem.exists(root)) return Nil
    filesystem.listStatus(root).toSeq
      .sortBy(st => (-st.getModificationTime, st.getPath.toString))
      .drop(n)
      .flatMap { st =>
        // report only what was ACTUALLY deleted: delete() returns false
        // on failure (permissions, concurrent removal) and a retention
        // audit must not claim reclaimed space that still exists
        if (filesystem.delete(st.getPath, true)) Some(st.getPath.toString)
        else None
      }
  }

  /** Epoch-millis run stamp parsed from a child name, for object stores
    * where directory mtime is meaningless: the first standalone run of
    * 13–18 digits in the name (e.g. `run-1765598400000`,
    * `1765598400000-shard3`). Longer digit runs (which would overflow a
    * Long) and unparsable names yield None — the child is kept, never
    * crashed on: retention must skip what it cannot date.
    */
  val epochMillisStamp: String => Option[Long] =
    name => raw"(?<!\d)\d{13,18}(?!\d)".r.findFirstIn(name)
      .flatMap(s => scala.util.Try(s.toLong).toOption)

  /** [[expireOlderThan]] keyed on a name-encoded run stamp instead of
    * filesystem mtime. Children whose name yields no stamp are KEPT —
    * retention must never delete what it cannot date. Returns deleted
    * paths.
    */
  def expireOlderThanStamped(spark: SparkSession, dir: String,
      maxAgeMs: Long, nowMs: Long,
      stamp: String => Option[Long] = epochMillisStamp): Seq[String] = {
    val (filesystem, root) = fs(spark, dir)
    if (!filesystem.exists(root)) return Nil
    filesystem.listStatus(root).toSeq
      .filter(st => stamp(st.getPath.getName).exists(t => nowMs - t > maxAgeMs))
      .flatMap { st =>
        // report only what was ACTUALLY deleted: delete() returns false
        // on failure (permissions, concurrent removal) and a retention
        // audit must not claim reclaimed space that still exists
        if (filesystem.delete(st.getPath, true)) Some(st.getPath.toString)
        else None
      }
  }

  /** [[keepNewest]] keyed on a name-encoded run stamp. Unstamped
    * children are kept and do not count against `n`. Returns deleted
    * paths.
    */
  def keepNewestStamped(spark: SparkSession, dir: String, n: Int,
      stamp: String => Option[Long] = epochMillisStamp): Seq[String] = {
    val (filesystem, root) = fs(spark, dir)
    if (!filesystem.exists(root)) return Nil
    filesystem.listStatus(root).toSeq
      .flatMap(st => stamp(st.getPath.getName).map(t => (t, st)))
      .sortBy { case (t, st) => (-t, st.getPath.toString) }
      .drop(n)
      .flatMap { case (_, st) =>
        if (filesystem.delete(st.getPath, true)) Some(st.getPath.toString)
        else None
      }
  }
}
