package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, CorpusQueries, EnrichQueries, EventQueries, MultimodalQueries, SamplingQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of all operator suites; every entry with a
  * matching `oracleSql` key is hash-checked against DuckDB at sf0.01.
  */
object SparkEntry {

  private def suites: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreQueries.all, CoreQueries.oracles),
      (TextQueries.all, TextQueries.oracles),
      (SimilarityQueries.all, SimilarityQueries.oracles),
      (EventQueries.all, EventQueries.oracles),
      (MultimodalQueries.all, MultimodalQueries.oracles),
      (SamplingQueries.all, SamplingQueries.oracles),
      (CorpusQueries.all, CorpusQueries.oracles),
      (EnrichQueries.all, EnrichQueries.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_top_nations")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    suites.map(_._2).reduce(_ ++ _)
}
