package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salting operators: results must be identical to their unsalted
  * counterparts; only the shuffle shape differs.
  */
class SkewSpec extends SparkSuite {

  test("saltedCount equals plain groupBy().count()") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val got = Skew.saltedCount(li, "l_returnflag", salts = 8)
    val exp = li.groupBy($"l_returnflag").agg(count(lit(1)).as("count"))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("saltedSum equals plain sum for exact types") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast("decimal(18,2)").as("q"))
    val got = Skew.saltedSum(li, "l_returnflag", "q", salts = 8)
    val exp = li.groupBy($"l_returnflag").agg(sum($"q").as("sum_q"))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("non-positive salts fail at call time, not mid-job") {
    import spark.implicits._
    val df = Seq(("k", 1L)).toDF("key", "v")
    intercept[IllegalArgumentException] { Skew.saltedCount(df, "key", 0) }
    intercept[IllegalArgumentException] { Skew.saltedJoin(df, df, "key", -1) }
  }

  test("saltedJoin equals the plain inner join") {
    import spark.implicits._
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
      .select($"o_custkey", $"c_name", $"c_nationkey")
    val got = Skew.saltedJoin(orders, customer, "o_custkey", salts = 4)
    val exp = orders.join(customer, Seq("o_custkey"))
    assert(got.count() === exp.count())
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }
}
