package graft

import org.apache.spark.sql.functions._

import graft.plans.RewriteJaccard

/** The Jaccard rewrite rule: naive size(intersect)/size(union) plans
  * collapse to the kernel expression with identical results, including
  * on duplicate- and null-containing arrays.
  */
class RewriteJaccardSpec extends SparkSuite {

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteJaccard
    try body finally spark.experimental.extraOptimizations = prev
  }

  private def naive(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  test("rule rewrites the naive expression to graft_jaccard") {
    import spark.implicits._
    // non-literal source: literals constant-fold away before inspection
    val df = Tables.documents(spark, sfDir)
      .select(split($"text", " ").as("x"), split($"lang", "-").as("y"))
    withRule {
      val q = df.select(naive($"x", $"y").as("j"))
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_jaccard"),
        q.queryExecution.optimizedPlan.toString)
      q.collect() // executes through codegen
    }
    // without the rule the plan keeps the set operations
    val plain = df.select(naive($"x", $"y").as("j"))
    assert(!plain.queryExecution.optimizedPlan.toString.contains("graft_jaccard"))
  }

  test("rewritten result matches the naive one on edge shapes") {
    import spark.implicits._
    val rows = Seq(
      (Seq("a", "a", "b"), Seq("b", "b", "c")),      // duplicates
      (Seq("a", null, "b"), Seq(null, "c")),         // null elements
      (Seq.empty[String], Seq("x")),                 // one empty
      (Seq("x"), Seq("x")))                          // identical
    val df = rows.toDF("x", "y")
    val base = df.select(naive($"x", $"y").as("j")).collect().map(_.getDouble(0))
    val rewritten = withRule {
      df.select(naive($"x", $"y").as("j")).collect().map(_.getDouble(0))
    }
    assert(base.toSeq === rewritten.toSeq)
  }

  test("mismatched argument pairs are left untouched") {
    import spark.implicits._
    val df = Seq((Seq("a"), Seq("b"), Seq("c"))).toDF("x", "y", "z")
    withRule {
      val q = df.select(
        (size(array_intersect($"x", $"y")).cast("double")
          / size(array_union($"x", $"z"))).as("j"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("graft_jaccard"))
    }
  }
}
