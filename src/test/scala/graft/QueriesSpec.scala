package graft

/** Smoke: every declared query runs at sf0.001 and the flagship entry
  * returns rows (mirrors the driver's t1 check). Hash correctness is the
  * driver's DuckDB gate (see tools/check_oracle.py).
  */
class QueriesSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.count() // executes the plan
    }
  }

  // Queries without an oracle get only a rows-only check from the
  // driver; determinism is their remaining correctness obligation —
  // two evaluations must produce identical rows.
  (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted
    .foreach { name =>
      test(s"$name (rows-only) is deterministic") {
        val a = SparkEntry.queries(name)(spark, sfDir)
        val b = SparkEntry.queries(name)(spark, sfDir)
        assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
      }
    }
}
