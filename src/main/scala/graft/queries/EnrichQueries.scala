package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.enrich.{Enricher, SyntheticFetcher}

/** The reference's core behavior — per-URL enrichment with retry and
  * dead-letter semantics (SURVEY.md §2.11/S5/P5/T4) — as oracle-checked
  * queries: SyntheticFetcher derives every field and failure mode from
  * md5(url), which DuckDB can compute, so the mapPartitions pipeline's
  * OUTPUT (not just its specs) is hash-verified against SQL.
  *
  * Only deterministic columns are emitted (processing_time and
  * timestamps are wall-clock; batch_index depends on slice order).
  */
object EnrichQueries {

  /** ONE enrichment setup for q45/q46/q47 (records AND dead-letter):
    * the three queries share a single md5-derived oracle model, so the
    * URL scheme / fetcher / Config must never diverge between them —
    * return the full pair instead of `.records` so the dead-letter
    * query can't drift onto its own copy.
    */
  private def enriched(s: SparkSession, dir: String): Enricher.Enriched = {
    import s.implicits._
    // Spread the URL list before the fetch stage: retry backoffs are
    // wall-clock sleeps, so a coalesced single partition would serialize
    // them (input order only feeds batch_index, which isn't emitted).
    val urls = graft.ops.Dedup.spread(
      Tables.documents(s, dir)
        .select(concat(lit("http://synth/"), $"doc_id").as("url")))
    // backoffMs=1: these queries verify enrichment OUTPUT; the reference's
    // 1 s origin-politeness backoff would add wall-clock sleeps per
    // transient failure (~1/16 of urls) without changing a single value
    Enricher.enrich(urls, () => new SyntheticFetcher,
      Enricher.Config(backoffMs = 1))
  }

  /** Per-record enrichment output: media-type branching (P5), retry
    * attempt counts (T4), permanent failures dead-lettered out of the
    * record stream.
    */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    enriched(s, dir).records
      .select($"url", $"media_type", $"attempt", $"media_id", $"error")
      .orderBy($"url")
  }

  /** The aggregator's histogram over freshly-enriched records (A8 on the
    * S5 output — the full processor→aggregator path in one plan).
    */
  private def q46(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    enriched(s, dir).records
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n"), max($"attempt").as("max_attempt"))
      .orderBy(desc("n"), $"media_type")
  }

  /** Dead-letter side channel (K6/T4): permanently-failing URLs after
    * max attempts, excluded from the record stream.
    */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    enriched(s, dir).deadLetter
      .select($"url", $"reason", $"attempts")
      .orderBy($"url")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_enrich_records" -> (q45 _),
    "q46_enrich_histogram" -> (q46 _),
    "q47_enrich_deadletter" -> (q47 _))

  /** The md5-derived fetcher model, restated in SQL: records whose
    * md5(url) starts "00" dead-letter (excluded); a trailing 'f' fails
    * once then succeeds (attempt=2); media type branches on the first
    * hex digit; media_id is the first 8 hex chars; error is null for
    * every surviving record.
    */
  val oracles: Map[String, String] = Map(
    "q45_enrich_records" ->
      """WITH u AS (SELECT 'http://synth/' || doc_id AS url, md5('http://synth/' || doc_id) AS h
        |           FROM documents)
        |SELECT url,
        |       CASE WHEN substr(h, 1, 1) < '6' THEN 'Volumetric Image Series'
        |            WHEN substr(h, 1, 1) < 'c' THEN 'Mesh'
        |            ELSE 'Photograph' END AS media_type,
        |       CASE WHEN h LIKE '%f' THEN 2 ELSE 1 END AS attempt,
        |       substr(h, 1, 8) AS media_id,
        |       CAST(NULL AS VARCHAR) AS error
        |FROM u
        |WHERE h NOT LIKE '00%'
        |ORDER BY url""".stripMargin,
    "q46_enrich_histogram" ->
      """WITH u AS (SELECT md5('http://synth/' || doc_id) AS h FROM documents),
        |r AS (SELECT CASE WHEN substr(h, 1, 1) < '6' THEN 'Volumetric Image Series'
        |                  WHEN substr(h, 1, 1) < 'c' THEN 'Mesh'
        |                  ELSE 'Photograph' END AS media_type,
        |             CASE WHEN h LIKE '%f' THEN 2 ELSE 1 END AS attempt
        |      FROM u WHERE h NOT LIKE '00%')
        |SELECT media_type, count(*) AS n, max(attempt) AS max_attempt
        |FROM r GROUP BY media_type
        |ORDER BY n DESC, media_type""".stripMargin,
    "q47_enrich_deadletter" ->
      """SELECT 'http://synth/' || doc_id AS url,
        |       'max_attempts' AS reason,
        |       2 AS attempts
        |FROM documents
        |WHERE md5('http://synth/' || doc_id) LIKE '00%'
        |ORDER BY url""".stripMargin)
}
