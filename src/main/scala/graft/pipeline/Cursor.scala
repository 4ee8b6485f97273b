package graft.pipeline

/** T2/K7: incremental cursor state chained across runs
  * (reference test_parquet_processor.py:377-386,447-457 — the
  * `$GITHUB_OUTPUT` key=value contract, persisted to a checkpoint file).
  *
  * Semantics are the reference's at-least-once: a rerun from the same
  * cursor reprocesses the same slice. Structured-Streaming checkpoints
  * subsume this when the streaming variant is used.
  */
case class Cursor(nextIndex: Long, totalProcessed: Long, hasMore: Boolean,
    errorCount: Long, skippedCount: Long) {

  def toKeyValue: String =
    s"""has_more=$hasMore
       |next_index=$nextIndex
       |total_processed=$totalProcessed
       |error_count=$errorCount
       |skipped_count=$skippedCount
       |""".stripMargin
}

object Cursor {
  val initial: Cursor = Cursor(0, 0, hasMore = true, 0, 0)

  /** Scheme-aware via [[graft.io.Sinks.writeText]]: an `s3a://…` cursor
    * path lands on the object store, not in a local `./s3a:/…` tree —
    * the java.nio form silently did the latter, so a new driver host
    * read `initial` and reprocessed the corpus from index 0.
    */
  def write(path: String, c: Cursor): Unit =
    graft.io.Sinks.writeText(path, c.toKeyValue)

  /** Parse the key=value form; missing/garbled ints fall back to 0 like
    * the reference's defensive int() coercion
    * (test_parquet_processor.py:433-442).
    */
  def read(path: String): Cursor =
    graft.io.Sinks.readTextIfExists(path) match {
      case None => initial
      case Some(content) =>
        val kv = content.linesIterator
          .flatMap { line =>
            line.split("=", 2) match {
              case Array(k, v) => Some(k.trim -> v.trim)
              case _ => None
            }
          }.toMap
        def long(k: String) = kv.get(k).flatMap(_.toLongOption).getOrElse(0L)
        Cursor(long("next_index"), long("total_processed"),
          kv.get("has_more").flatMap(_.toBooleanOption).getOrElse(true),
          long("error_count"),
          long("skipped_count"))
    }
}
