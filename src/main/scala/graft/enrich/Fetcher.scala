package graft.enrich

/** Per-URL page fetcher — the pluggable boundary around the reference's
  * Selenium scrape (test_parquet_processor.py:40-77,218-266).
  *
  * One instance is created per partition and reused across records
  * (mirroring the one-Chrome-driver-per-batch reuse at
  * test_parquet_processor.py:296-298); [[reset]] is called after a failure
  * (reset-on-error, :323-328).
  *
  * Implementations must be constructible on executors — pass a factory
  * `() => Fetcher`, not an instance.
  */
trait Fetcher extends AutoCloseable {
  /** Fetch one URL and return label→value pairs (un-normalized labels,
    * e.g. "Media ID"); must include "Media Type". Throw on failure.
    */
  def fetch(url: String): Map[String, String]

  /** Recover after a failed fetch (reference recreates the driver).
    *
    * MUST replace internal state (a fresh driver/connection), never
    * repair shared state in place: after a record TIMEOUT the
    * enricher abandons the wedged worker thread, which may still be
    * blocked inside [[fetch]] when reset() and the next record's
    * fetch run — an in-place mutation would race with it; a swap
    * leaves the abandoned thread holding only the old, orphaned
    * state (exactly what recreating a Selenium driver does).
    */
  def reset(): Unit = ()

  override def close(): Unit = ()
}

/** Deterministic synthetic fetcher for tests and benchmarks: every field
  * is a pure function of md5(url), so results are reproducible on any
  * cluster AND expressible in SQL for the DuckDB oracle.
  *
  * Failure injection mirrors the reference's observed error modes
  * (processor.log shows retry + dead-letter exercised without a browser):
  *  - urls where md5 ends in 'f' fail on the first attempt, succeed on
  *    retry (exercises attempt counting);
  *  - urls where md5 starts with "00" fail every attempt (exercises
  *    max_attempts dead-lettering).
  */
final class SyntheticFetcher(failFirstSuffix: String = "f",
    alwaysFailPrefix: String = "00") extends Fetcher {

  private val seen = new java.util.HashSet[String]()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  override def fetch(url: String): Map[String, String] = {
    val h = md5hex(url)
    if (h.startsWith(alwaysFailPrefix))
      throw new RuntimeException(s"synthetic permanent failure for $url")
    if (h.endsWith(failFirstSuffix) && seen.add(url))
      throw new RuntimeException(s"synthetic transient failure for $url")
    val mediaType =
      if (h.charAt(0) < '6') "Volumetric Image Series"
      else if (h.charAt(0) < 'c') "Mesh"
      else "Photograph"
    Map(
      "Media ID" -> h.substring(0, 8),
      "Media Type" -> mediaType,
      "Object Taxonomy" -> s"taxon-${h.charAt(1)}",
      "Creator" -> s"creator-${h.charAt(2)}",
      "Short Description" -> s"synthetic record $h")
  }
}
