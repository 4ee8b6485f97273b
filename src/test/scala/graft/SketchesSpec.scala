package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Misra-Gries heavy hitters: exact in the small-vocabulary regime,
  * guarantee-bounded in the adversarial one, and mergeable across any
  * partitioning.
  */
class SketchesSpec extends SparkSuite {

  private def tokens = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(explode(graft.ops.TextAnalysis.tokens($"text")).as("token"))
  }

  test("exact regime: capacity above distinct count reproduces true counts") {
    import spark.implicits._
    val got = Sketches.heavyHitters(tokens, "token", m = 1024, k = 20)
    val truth = tokens.groupBy($"token").agg(count(lit(1)).as("est_count"))
      .orderBy($"est_count".desc, $"token").limit(20)
    assert(got.collect().toSeq === truth.collect().toSeq)
  }

  test("exact regime is layout-independent") {
    val a = Sketches.heavyHitters(tokens, "token", m = 256, k = 10).collect().toSeq
    val b = Sketches.heavyHitters(tokens.repartition(13), "token", m = 256, k = 10)
      .collect().toSeq
    assert(a === b)
  }

  test("approximate regime: MG guarantees hold under a tiny capacity") {
    import spark.implicits._
    // 50 a's + 30 b's + 20 distinct singletons, N = 100, m = 4:
    // error ≤ N/(m+1) = 20, so a (50 > 20) and b (30 > 20) MUST appear,
    // and every estimate lower-bounds truth by at most 20
    val rows = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      (1 to 20).map(i => s"s$i")
    val df = rows.toDF("token").repartition(5)
    val est = Sketches.heavyHitters(df, "token", m = 4, k = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    assert(est.contains("a") && est.contains("b"))
    est.foreach { case (t, e) =>
      assert(e <= truth(t), s"estimate for $t overshoots")
      assert(truth(t) - e <= 20, s"estimate for $t outside the N/(m+1) bound")
    }
  }

  test("null tokens are ignored, not crashed on or counted") {
    import spark.implicits._
    // a null in the summary Map would fail the Map-key encoder (and the
    // finish sortBy) mid-aggregation; null tokens must never enter
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("token").repartition(3)
    val got = Sketches.heavyHitters(df, "token", m = 16, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got === Seq("a" -> 2L, "b" -> 1L))
    val grouped = Seq((Some(1), Some("x")), (Some(1), None), (None, Some("x")))
      .toDF("g", "token")
    val by = Sketches.heavyHittersBy(grouped, "g", "token", m = 16, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // null GROUP is a group (SQL GROUP BY semantics); null token is not
    assert(by.toSet === Set(("1", "x", 1L), (null, "x", 1L)))
  }

  test("per-group heavy hitters: exact per language, k rows max per group") {
    import spark.implicits._
    val byLang = Tables.documents(spark, sfDir)
      .select($"lang", explode(graft.ops.TextAnalysis.tokens($"text")).as("token"))
    val got = Sketches.heavyHittersBy(byLang, "lang", "token", m = 256, k = 5)
    val truth = byLang.groupBy($"lang", $"token").agg(count(lit(1)).as("est_count"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lang")
          .orderBy($"est_count".desc, $"token")))
      .where($"__rn" <= 5).drop("__rn")
      .select($"lang", $"token", $"est_count")
    assert(got.exceptAll(truth).isEmpty && truth.exceptAll(got).isEmpty)
    val counts = got.groupBy($"lang").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 5) && counts.nonEmpty)
  }
}
