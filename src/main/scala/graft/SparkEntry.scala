package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, CorpusQueries, EnrichQueries, EventQueries, MultimodalQueries, SamplingQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of all operator suites; every entry with a
  * matching `oracleSql` key is hash-checked against DuckDB at sf0.01.
  */
object SparkEntry {

  private lazy val suites: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreQueries.all, CoreQueries.oracles),
      (TextQueries.all, TextQueries.oracles),
      (SimilarityQueries.all, SimilarityQueries.oracles),
      (EventQueries.all, EventQueries.oracles),
      (MultimodalQueries.all, MultimodalQueries.oracles),
      (SamplingQueries.all, SamplingQueries.oracles),
      (CorpusQueries.all, CorpusQueries.oracles),
      (EnrichQueries.all, EnrichQueries.oracles))

  /** Union of `maps`, REJECTING duplicate keys: `Map ++` keeps the
    * right-hand entry, so a query name registered by two suites would
    * silently drop one implementation from the driver surface (and
    * could pair the survivor with the other suite's oracle SQL).
    */
  private def unionUnique[V](maps: Seq[Map[String, V]]): Map[String, V] = {
    val merged = maps.reduce(_ ++ _)
    if (merged.size != maps.map(_.size).sum) {
      val dups = maps.flatMap(_.keys).groupBy(identity)
        .collect { case (k, ks) if ks.sizeIs > 1 => k }
      throw new IllegalStateException(
        s"duplicate query keys across suites: ${dups.toSeq.sorted.mkString(", ")}")
    }
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_top_nations")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Built once
    * (lazy val) — the 8 suite maps are immutable and PlanSpec/the bench
    * look queries up hundreds of times.
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    unionUnique(suites.map(_._1))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    unionUnique(suites.map(_._2))
}
