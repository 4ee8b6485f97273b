package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture generator for the oracle-gate fuzz check
  * (`tools/fuzz_oracle_gate.py`): one tiny Spark-written parquet result
  * per hash-gate dtype class from SURVEY §8, each paired with DuckDB SQL
  * (VALUES lists over the same seeded values) in `oracle_sql.json` —
  * the same artifact shape `Verify` ships to the driver.
  *
  * The case NAME carries the driver-calibrated expectation
  * (`pass_*` / `fail_*`), so the fuzzer can assert that
  * `tools/check_oracle.py`'s gate classifies every class exactly as the
  * driver's observed behavior (CORRECTNESS_r06: q104 green on
  * oracle-DECIMAL-vs-spark-double, q16 green on date-vs-midnight-
  * timestamp, q21/q22 green on int32-vs-int64; all 8 spark-DECIMAL
  * emitters red, all 5 uncast SUM-HUGEINT oracles red) prescribes.
  * Values are seeded-random per run (seed = args(1), default 42) and
  * the Spark side is written in shuffled row order, so the canonical
  * sort-then-compare path is exercised, not just the schema path.
  */
object GateFixtures {

  private def sqlStr(s: String): String =
    "'" + s.replace("'", "''") + "'"

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val seed = if (args.length > 1) args(1).toLong else 42L
    val rnd = new scala.util.Random(seed)
    val spark = GraftSession.local("graft-gate-fixtures")
    import spark.implicits._
    new java.io.File(outDir).mkdirs()

    val n = 24
    val longs: Seq[Option[Long]] =
      Seq(None) ++ (1 until n).map(_ => Some(rnd.nextLong() >> 16))
    val ints: Seq[Option[Int]] =
      Seq(None) ++ (1 until n).map(_ => Some(rnd.nextInt()))
    // exact binary fractions: deterministic doubles, the gateable kind
    val doubles: Seq[Option[Double]] =
      Seq(None) ++ (1 until n).map(_ => Some(rnd.nextInt(1 << 20) / 8.0))
    // two-decimal values for the oracle-DECIMAL(9,2) twin (q104 shape)
    val cents: Seq[Option[Double]] =
      Seq(None) ++ (1 until n).map(_ => Some(rnd.nextInt(1000000) / 100.0))
    val strings: Seq[Option[String]] =
      Seq(None) ++ (1 until n).map(i =>
        Some(s"s${rnd.alphanumeric.take(8).mkString}é$i"))
    val dates: Seq[Option[java.sql.Date]] =
      Seq(None) ++ (1 until n).map(_ =>
        Some(java.sql.Date.valueOf(s"20${10 + rnd.nextInt(20)}-0${1 + rnd.nextInt(9)}-${10 + rnd.nextInt(18)}")))
    val bytes: Seq[Array[Byte]] =
      (0 until n).map { _ => val b = new Array[Byte](12); rnd.nextBytes(b); b }

    def shuffled[T](xs: Seq[T]): Seq[T] = rnd.shuffle(xs)
    def values(lits: Seq[String]): String =
      lits.map(l => s"($l)").mkString("VALUES ", ", ", "")
    def lit1[T](o: Option[T], cast: String): String =
      o.map(v => s"CAST($v AS $cast)").getOrElse(s"CAST(NULL AS $cast)")
    def litS(o: Option[String]): String =
      o.map(sqlStr).getOrElse("CAST(NULL AS VARCHAR)")

    // (case name, spark result, duckdb oracle sql); pass_/fail_ prefix =
    // the driver-calibrated expectation the fuzzer asserts
    val cases: Seq[(String, DataFrame, String)] = Seq(
      ("pass_bigint",
        shuffled(longs).toDF("v"),
        s"SELECT v FROM (${values(longs.map(lit1(_, "BIGINT")))}) t(v)"),
      ("pass_int32_vs_bigint",
        shuffled(ints).toDF("v"),
        s"SELECT v FROM (${values(ints.map(lit1(_, "BIGINT")))}) t(v)"),
      ("fail_sum_hugeint",
        shuffled(ints).toDF("x").agg(sum(col("x")).as("v")),
        s"SELECT SUM(v) AS v FROM (${values(ints.map(lit1(_, "INTEGER")))}) t(v)"),
      ("pass_sum_cast_bigint",
        shuffled(ints).toDF("x").agg(sum(col("x")).as("v")),
        s"SELECT CAST(SUM(v) AS BIGINT) AS v FROM (${values(ints.map(lit1(_, "INTEGER")))}) t(v)"),
      ("pass_double_det",
        shuffled(doubles).toDF("v"),
        s"SELECT v FROM (${values(doubles.map(lit1(_, "DOUBLE")))}) t(v)"),
      ("pass_oracle_decimal_vs_double",
        shuffled(cents).toDF("v"),
        s"SELECT CAST(v AS DECIMAL(9,2)) AS v FROM (${values(cents.map(lit1(_, "DOUBLE")))}) t(v)"),
      ("fail_spark_decimal",
        shuffled(cents).toDF("x").select(col("x").cast("decimal(12,2)").as("v")),
        s"SELECT CAST(v AS DECIMAL(12,2)) AS v FROM (${values(cents.map(lit1(_, "DOUBLE")))}) t(v)"),
      ("pass_string",
        shuffled(strings).toDF("v"),
        s"SELECT v FROM (${values(strings.map(litS))}) t(v)"),
      ("pass_date_vs_ts_midnight",
        shuffled(dates).toDF("v"),
        s"SELECT CAST(v AS TIMESTAMP) AS v FROM (${values(dates.map(d => lit1(d.map(x => s"DATE '$x'"), "DATE")))}) t(v)"),
      ("fail_ts_noon_values",
        shuffled(dates).toDF("v"),
        s"SELECT CAST(v AS TIMESTAMP) + INTERVAL 12 HOUR AS v FROM (${values(dates.map(d => lit1(d.map(x => s"DATE '$x'"), "DATE")))}) t(v)"),
      ("pass_binary_as_base64",
        shuffled(bytes.map(b => Some(b))).toDF("x")
          .select(base64(col("x")).as("v")),
        s"SELECT v FROM (${values(bytes.map(b => litS(Some(java.util.Base64.getEncoder.encodeToString(b)))))}) t(v)"),
      ("fail_string_vs_bigint",
        shuffled(longs).toDF("x").select(col("x").cast("string").as("v")),
        s"SELECT v FROM (${values(longs.map(lit1(_, "BIGINT")))}) t(v)"),
      ("fail_double_vs_bigint",
        shuffled(longs).toDF("x").select(col("x").cast("double").as("v")),
        s"SELECT v FROM (${values(longs.map(lit1(_, "BIGINT")))}) t(v)"))

    cases.foreach { case (name, df, _) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      cases.map { case (k, _, sql) => s"${q(k)}: ${q(sql)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
