package graft

import org.apache.spark.sql.functions._

import graft.ops.{Classify, Dedup}

class ClassifySpec extends SparkSuite {

  // labeled train slice: class "en" dominated by a/b, class "de" by c/d
  private def trainDf = {
    import spark.implicits._
    Seq(
      (1L, "en", "a a b"),
      (2L, "en", "a b b"),
      (3L, "de", "c c d"),
      (4L, "de", "c d d"),
      (5L, "de", "d d c")).toDF("doc_id", "lang", "text")
  }

  test("nbScore matches the hand-computed multinomial NB model") {
    import spark.implicits._
    val docs = Seq((10L, "a b")).toDF("doc_id", "text")
    val out = Classify.nbScore(docs, trainDf, "doc_id", "lang", "text")
      .collect()
      .map(r => (r.getString(1),
        (r.getLong(2), r.getDecimal(3).longValueExact(), r.getDouble(5))))
      .toMap
    // model: en {a:3, b:3} tot 6; de {c:4, d:5} tot 9; V=4; priors 2/5, 3/5
    // doc "a b": n_tokens 2
    // en model_hits = 1·3 + 1·3 = 6; de = 0
    assert(out("en")._1 === 2L)
    assert(out("en")._2 === 6L)
    assert(out("de")._2 === 0L)
    // score(en) = ln(2/5) + ln((3+1)/(6+4)) + ln((3+1)/(6+4))
    // quantization at 1e-6 makes each term exact to 6 dp
    def q6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val en = q6(math.log(2.0 / 5)) + 2 * q6(math.log(4.0 / 10))
    val de = q6(math.log(3.0 / 5)) + 2 * q6(math.log(1.0 / 13))
    assert(math.abs(out("en")._3 - en) < 1e-9, s"${out("en")._3} vs $en")
    assert(math.abs(out("de")._3 - de) < 1e-9, s"${out("de")._3} vs $de")
  }

  test("a class with zero model tokens still scores (pure smoothed likelihood)") {
    import spark.implicits._
    // label "fr" has training docs but NO (label, token) model rows —
    // e.g. a pruned user-supplied model; it must stay in the class
    // universe with total 0 (ln(α/(αV)) likelihood), not vanish
    val model = Classify.trainNaiveBayes(trainDf, "lang", "text")
    val classDocs = Classify.nbClassDocs(trainDf, "lang")
      .union(Seq(("fr", 3L)).toDF("label", "n_docs"))
    val docs = Seq((10L, "a b")).toDF("doc_id", "text")
    val out = Classify.nbScoreWithModel(docs, model, classDocs, "doc_id", "text")
      .collect().map(r => r.getString(1) -> r.getDecimal(3).longValueExact())
      .toMap
    assert(out.keySet === Set("en", "de", "fr"), "fr must be scored, not dropped")
    assert(out("fr") === 0L)
  }

  test("nbPredict argmaxes deterministically and recovers planted classes") {
    import spark.implicits._
    val docs = Seq(
      (10L, "a b a"), // en-looking
      (11L, "c d d"), // de-looking
      // all-unseen tokens: en wins — its SMALLER class total makes the
      // smoothed unseen likelihood α/(tot+αV) larger, outweighing de's
      // prior edge (ln .4 + 2 ln(1/10) = −5.52 > ln .6 + 2 ln(1/13) = −5.64)
      (12L, "z z")
    ).toDF("doc_id", "text")
    val got = Classify.nbPredict(docs, trainDf, "doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(10L -> "en", 11L -> "de", 12L -> "en"))
  }

  test("nbPredict recovers planted class vocabularies on a held-out split") {
    import spark.implicits._
    // 3 classes with overlapping-but-tilted vocabularies; deterministic
    // token mix per doc from its id
    val vocab = Map(
      "en" -> Seq("cat", "dog", "run", "the", "of"),
      "de" -> Seq("katze", "hund", "lauf", "the", "of"),
      "fr" -> Seq("chat", "chien", "cours", "the", "of"))
    val rows = (0 until 300).map { i =>
      val cls = Seq("en", "de", "fr")(i % 3)
      val v = vocab(cls)
      val text = (0 until 12).map(j => v((i * 7 + j * 3) % v.size)).mkString(" ")
      (i.toLong, cls, text)
    }
    val df = rows.toDF("doc_id", "lang", "text")
    val train = df.where($"doc_id" % 10 =!= 0)
    val heldOut = df.where($"doc_id" % 10 === 0)
    val pred = Classify.nbPredict(heldOut, train, "doc_id", "lang", "text")
      .join(df.select($"doc_id", $"lang"), "doc_id")
    val n = pred.count()
    val nRight = pred.where($"predicted" === $"lang").count()
    assert(n === 30)
    assert(nRight === n, s"held-out accuracy ${nRight.toDouble / n} < 1.0")
  }

  test("nbScore on the real corpus emits one finite score per (doc, class)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = docs.where(col("doc_id") % 10 =!= 0)
    val nClasses = train.select(col("lang")).distinct().count()
    val scored = Classify.nbScore(docs, train, "doc_id", "lang", "text")
    assert(scored.count() === docs.count() * nClasses)
    assert(scored.where(col("score").isNull || isnan(col("score"))).count() === 0)
    val pred = Classify.nbPredict(docs, train, "doc_id", "lang", "text")
    assert(pred.count() === docs.count())
  }

  test("intraDocChunkDedup is idempotent on the real corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // materialize pass 1: nesting it as an expression would re-evaluate
    // the whole pass-1 tree inside pass 2's per-element HOF lambdas
    // (interpreted, no CSE) — an exponential blowup, not a plan
    val once = Dedup.intraDocChunkDedup(docs, "doc_id", "text", 2)
      .withColumnRenamed("dedup_text", "text")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    // pass 1 must cover every document, or the idempotence predicate
    // below is vacuous over whatever rows survived
    assert(once.count() === docs.count())
    val twice = Dedup.intraDocChunkDedup(once, "doc_id", "text", 2)
    // a second pass finds nothing left to drop
    assert(twice.count() === docs.count())
    assert(twice.where(col("n_kept") =!= col("n_chunks")).count() === 0)
  }

  test("intraDocChunkDedup drops repeated spans within a doc only") {
    import spark.implicits._
    val df = Seq(
      // chunks of 2: "a b" / "c d" / "a b" / "e" → drop 3rd
      (1L, "a b c d a b e"),
      // identical text in ANOTHER doc is untouched (no cross-doc compare)
      (2L, "a b c d a b e"),
      (3L, "x y")).toDF("doc_id", "text")
    val out = Dedup.intraDocChunkDedup(df, "doc_id", "text", chunkTokens = 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 4L, 3L, "a b c d e")))
    assert(out(1) === ((2L, 4L, 3L, "a b c d e")))
    assert(out(2) === ((3L, 1L, 1L, "x y")))
  }
}
