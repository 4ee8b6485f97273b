package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operators (SURVEY.md §2) re-expressed on the synthetic
  * star schema.
  *
  * Determinism contract (required for the DuckDB-oracle hash compare):
  *  - every query ends in a total ORDER BY so row order is unique;
  *  - money arithmetic is done in DECIMAL(18,2) (exact, engine-independent)
  *    and only cast to double at the very end — never `sum(double)`, whose
  *    result depends on partition accumulation order;
  *  - no raw `events.ts` values are emitted (parquet holds nanoseconds,
  *    Spark truncates to microseconds while DuckDB keeps ns).
  *
  * Reference coverage (citations into /root/reference/):
  *  - aggregation shapes A1–A10: .github/workflows/test_parquet_aggregator.yml:169-176,
  *    .github/scripts/evaluate_test_run.py:91-104
  *  - join analogs J1–J3: .github/workflows/test_parquet_aggregator.yml:63-98,
  *    .github/scripts/test_parquet_processor.py:353
  *  - set ops U1–U3: .github/workflows/test_parquet_aggregator.yml:140-151
  *  - string/regex/date functions F1–F6: .github/scripts/test_parquet_processor.py:254-255,
  *    .github/workflows/test_parquet_aggregator.yml:89
  *  - offset/limit pagination S7: .github/scripts/test_parquet_processor.py:277-279
  */
object CoreQueries {

  /** Exact money type: 2-decimal doubles in the test data round-trip losslessly. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ---------------------------------------------------------------- queries

  /** A1–A7: global stats in one pass (count/avg/median/min/max/sum). */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n_rows"),
      (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
      median($"l_quantity").as("median_qty"),
      min($"l_quantity").as("min_qty"),
      max($"l_quantity").as("max_qty"),
      sum(dec($"l_quantity")).cast("double").as("sum_qty"))
  }

  /** TPC-H Q1 shape: filtered grouped aggregation (A1,A2,A5,A8 + P10 filter). */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .where($"l_shipdate" < to_timestamp(lit("1999-01-01 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(BigDecimal(1)) - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** S2/P10: projection + predicate, pushed down to the parquet scan. */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .where($"l_discount" > 0.05 && $"l_quantity" < 10)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** J1 + A8/O1: 4-way join through the dimension chain, top-5 by revenue. */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"n_name", $"r_name")
      .agg(
        sum(dec($"o_totalprice")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(desc("revenue"), $"n_name")
      .limit(5)
  }

  /** J1: broadcast hash join of a fact against two tiny dims (row-level). */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select($"c_custkey", $"c_name", $"n_name", $"r_name")
      .orderBy($"c_custkey")
  }

  /** J2: anti join — customers that never placed a high-value order. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).where($"o_totalprice" > 90000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  /** Semi join — suppliers that shipped at least one lineitem. */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.supplier(s, dir)
    val li = Tables.lineitem(s, dir)
    sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  /** §2.6 analog + A9 argmax: latest order per customer via row_number. */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey")
  }

  /** Running total window (frame spec), decimal-exact accumulation. */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        $"o_custkey", $"o_orderkey",
        sum(dec($"o_totalprice")).over(w).cast("double").as("running_spend"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** A9: per-group argmax (richest customer per nation), tie-broken. */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"c_nationkey", $"c_custkey".as("top_custkey"), $"c_acctbal".as("top_acctbal"))
      .orderBy($"c_nationkey")
  }

  /** A8/O1: histogram ordered by count desc (the media_type value_counts shape). */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), $"event_type")
  }

  /** U3: distinct (dedup-by-key). */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select($"c_nationkey", $"c_mktsegment")
      .distinct()
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  /** U1: schema-merge union of heterogeneous column subsets (null-fill). */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val a = o.select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
    val b = o.select($"o_orderkey", $"o_orderpriority")
    a.unionByName(b, allowMissingColumns = true)
      .orderBy($"o_orderkey", $"o_orderstatus".asc_nulls_last)
  }

  /** F2/P9: regex extraction from a JSON-ish string payload. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        $"event_id",
        regexp_extract($"props", "\"k\": (\\d+)", 1).cast("int").as("k_value"))
      .orderBy($"event_id")
  }

  /** F1/P1/P2: column-value normalization (lower, space→_, first token). */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .select(
        $"p_partkey",
        lower(regexp_replace($"p_name", " ", "_")).as("norm_name"),
        substring_index($"p_name", " ", 1).as("first_token"),
        concat($"p_brand", lit(":"), $"p_type").as("brand_type"))
      .orderBy($"p_partkey")
  }

  /** F3: date_trunc to month + grouped money aggregation. */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(to_date(date_trunc("month", $"o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec($"o_totalprice")).cast("double").as("total_value"))
      .orderBy($"month")
  }

  /** A6/A7: conditional count + derived ratio (the error-rate shape). */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir).agg(
      count(lit(1)).as("n_orders"),
      count(when($"o_orderstatus" === "F", 1)).as("n_f"),
      (count(when($"o_orderstatus" === "F", 1)).cast("double") / count(lit(1)))
        .as("f_ratio"))
  }

  /** J3/X2 analog: range bucketing by integer division (no join needed). */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy(floor($"l_quantity" / 10).cast("int").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec($"l_extendedprice")).cast("double").as("bucket_value"))
      .orderBy($"bucket")
  }

  /** S7: deterministic pagination — offset/limit over a total order. */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
      .offset(100)
      .limit(50)
  }

  /** O4: recency top-k (order by event time desc), ts not emitted (ns vs µs). */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .orderBy($"ts".desc, $"event_id")
      .select($"event_id", $"event_type", $"value")
      .limit(10)
  }

  /** Distinct aggregation (exact): distinct parts/suppliers per return
    * flag — the two-phase distinct-agg shuffle shape.
    */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** Sketched distinct (HyperLogLog++): the 100 TB path where exact
    * distinct's per-key shuffle is too expensive. Rows-only check — the
    * sketch estimate is implementation-specific (deterministic in Spark).
    */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        // default rsd (5%): tighter precision grows the per-group sketch
        // quadratically and is rarely worth it for pipeline stats
        approx_count_distinct($"l_partkey").as("approx_parts"),
        approx_count_distinct($"l_orderkey").as("approx_orders"))
      .orderBy($"l_returnflag")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_distinct_agg" -> (q41 _),
    "q42_approx_distinct" -> (q42 _),
    "q01_stats_global" -> (q01 _),
    "q02_pricing_summary" -> (q02 _),
    "q03_filter_project" -> (q03 _),
    "q04_top_nations" -> (q04 _),
    "q05_broadcast_dims" -> (q05 _),
    "q06_anti_join" -> (q06 _),
    "q07_semi_join" -> (q07 _),
    "q08_latest_order" -> (q08 _),
    "q09_running_total" -> (q09 _),
    "q10_argmax_per_group" -> (q10 _),
    "q11_histogram" -> (q11 _),
    "q12_distinct" -> (q12 _),
    "q13_union_merge" -> (q13 _),
    "q14_regex_extract" -> (q14 _),
    "q15_string_norm" -> (q15 _),
    "q16_orders_by_month" -> (q16 _),
    "q17_conditional_ratio" -> (q17 _),
    "q18_range_buckets" -> (q18 _),
    "q19_offset_limit" -> (q19 _),
    "q20_recent_topk" -> (q20 _))

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(
    "q41_distinct_agg" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q01_stats_global" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       median(l_quantity) AS median_qty,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem""".stripMargin,
    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q04_top_nations" ->
      """SELECT n_name, r_name,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name
        |ORDER BY revenue DESC, n_name
        |LIMIT 5""".stripMargin,
    "q05_broadcast_dims" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 90000)
        |ORDER BY c_custkey""".stripMargin,
    "q07_semi_join" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |ORDER BY s_suppkey""".stripMargin,
    "q08_latest_order" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q09_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q10_argmax_per_group" ->
      """SELECT c_nationkey, c_custkey AS top_custkey, c_acctbal AS top_acctbal
        |FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |      FROM customer)
        |WHERE rn = 1
        |ORDER BY c_nationkey""".stripMargin,
    "q11_histogram" ->
      """SELECT event_type, count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY n DESC, event_type""".stripMargin,
    "q12_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment
        |FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q13_union_merge" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus, CAST(NULL AS VARCHAR) AS o_orderpriority FROM orders
        |UNION ALL
        |SELECT o_orderkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), o_orderpriority FROM orders
        |ORDER BY o_orderkey, o_orderstatus NULLS LAST""".stripMargin,
    "q14_regex_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k_value
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q15_string_norm" ->
      """SELECT p_partkey,
        |       lower(replace(p_name, ' ', '_')) AS norm_name,
        |       split_part(p_name, ' ', 1) AS first_token,
        |       p_brand || ':' || p_type AS brand_type
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q16_orders_by_month" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders
        |GROUP BY 1
        |ORDER BY month""".stripMargin,
    "q17_conditional_ratio" ->
      """SELECT count(*) AS n_orders,
        |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE) / count(*) AS f_ratio
        |FROM orders""".stripMargin,
    "q18_range_buckets" ->
      """SELECT CAST(floor(l_quantity / 10) AS INTEGER) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin,
    "q19_offset_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin,
    "q20_recent_topk" ->
      """SELECT event_id, event_type, value
        |FROM events
        |ORDER BY ts DESC, event_id
        |LIMIT 10""".stripMargin)
}
