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

  /** The edge-shape rows, written to parquet: a `toDF` LocalRelation is
    * eagerly evaluated by `ConvertToLocalRelation` BEFORE the
    * User Provided Optimizers batch, so the rule never sees such plans —
    * an in-memory df here compared the naive evaluation to itself.
    */
  private def edgeParquet(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rw-jaccard").toString
    Seq(
      (Seq("a", "a", "b"), Seq("b", "b", "c"), Seq("z")), // duplicates
      (Seq("a", null, "b"), Seq(null, "c"), Seq("z")),    // null elements
      (Seq.empty[String], Seq("x"), Seq("z")),            // one empty
      (Seq("x"), Seq("x"), Seq("z")))                     // identical
      .toDF("x", "y", "z").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("rewritten result matches the naive one on edge shapes") {
    import spark.implicits._
    val df = edgeParquet()
    val base = df.select(naive($"x", $"y").as("j"))
      .orderBy($"j").collect().map(_.getDouble(0))
    val rewritten = withRule {
      val q = df.select(naive($"x", $"y").as("j")).orderBy($"j")
      // the rule must actually FIRE on this plan, or the comparison
      // below is the naive evaluation against itself
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_jaccard"),
        q.queryExecution.optimizedPlan.toString)
      q.collect().map(_.getDouble(0))
    }
    assert(base.toSeq === rewritten.toSeq)
  }

  test("mismatched argument pairs are left untouched") {
    import spark.implicits._
    // parquet-backed for the same reason as above: on a pre-collapsed
    // LocalRelation the negative assertion could never fail
    val df = edgeParquet()
    withRule {
      val q = df.select(
        (size(array_intersect($"x", $"y")).cast("double")
          / size(array_union($"x", $"z"))).as("j"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("graft_jaccard"))
      // control: the matched pair in the SAME session still rewrites
      assert(df.select(naive($"x", $"y").as("j"))
        .queryExecution.optimizedPlan.toString.contains("graft_jaccard"))
    }
  }
}
