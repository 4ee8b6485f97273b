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

  test("the quality-score formula is byte-identical in every oracle embedding it") {
    // TextAnalysis.qualityScore is restated in SQL by ~9 oracles whose
    // surrounding contexts differ (so no single string binding à la
    // ExactDecontamSql applies). This pin makes a drifted copy fail
    // HERE, naming the query, instead of surfacing later as an opaque
    // driver hash-gate failure.
    val canonical =
      "CASE WHEN toks[1] = '' THEN 0.0 ELSE " +
        "(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5 " +
        "+ (CAST(len(list_filter(toks, s -> s IN ('the','a','an','of','and'," +
        "'is','in','to','it','that'))) AS DOUBLE) / len(toks)) * 0.3 " +
        "+ (CASE WHEN len(toks) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)" +
        " * 0.2 END"
    def norm(s: String) = s.replaceAll("\\s+", " ")
    // The checked set is NAMED, not marker-derived: a marker inside the
    // guarded formula would let a drifted copy silently drop out of the
    // checked set. The marker scan below only catches NEW embeddings
    // missing from this list.
    val expected = Set(
      "q44_text_extras", "q63_quality_quantile", "q73_weighted_sample",
      "q85_token_budget", "q90_quality_dedup", "q103_curriculum_order",
      "q104_gate_calibration", "q107_release_delta", "q118_corpus_datasheet")
    expected.foreach { name =>
      assert(norm(SparkEntry.oracleSql(name)).contains(norm(canonical)),
        s"$name's quality formula drifted from the canonical form")
    }
    // the ×0.3 stop-ratio term is unique to the quality composite
    // (q22's bare stop_ratio shares the IN-list but not the weight)
    val marker = "AS DOUBLE) / len(toks)) * 0.3"
    val found = SparkEntry.oracleSql.filter(kv => norm(kv._2).contains(marker)).keySet
    assert((found -- expected).isEmpty,
      s"new quality-formula embeddings not in the pinned set: ${found -- expected}")
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
