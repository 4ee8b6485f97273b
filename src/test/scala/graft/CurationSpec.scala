package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, TextAnalysis, Vocab}

/** Gate-stability pins for the composed CCNet pipeline (q89).
  *
  * The LM gate predicate compares the DECIMAL(38,6) ln-sum against
  * `θ × n_bigrams`. The sum itself is engine-dependent at the ulp level
  * (rounds 3–4: hash-gating it failed the driver's cross-engine check
  * twice), so q89 keeps it out of its hashed OUTPUT — but the gate
  * PREDICATE still uses it. That is only safe if no document sits close
  * enough to the threshold for an ulp-scale `ln` spread to flip its
  * membership. These tests assert that margin on the real test tables:
  * every scored document must clear (or miss) the threshold by far more
  * than the worst-case cross-engine error, `n_bigrams × 10⁻⁶`-scale.
  */
class CurationSpec extends SparkSuite {

  private val theta = BigDecimal("-3.55")

  /** q89's LM-stage inputs, reproduced stage-for-stage. */
  private def lmScores(dir: String) = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val corpus = docs.where($"doc_id" % 97 =!= 0)
    val reference = docs.where($"doc_id" % 7 === 0)
    val quality = corpus
      .select($"doc_id", $"text",
        TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"),
        TextAnalysis.dupGramFraction($"text", 2).as("dup2"))
      .where($"n_tokens" >= 20 && $"dup2" <= 0.2)
      .select($"doc_id", $"text")
    Vocab.bigramLogProb(quality, reference, "doc_id", "text")
  }

  test("q89 LM gate: every sf0.001 document clears the threshold by ≫ quantum × n_bigrams") {
    val rows = lmScores(sfDir)
      .select(col("doc_id"), col("n_bigrams"), col("logprob_sum"))
      .collect()
    assert(rows.nonEmpty)
    // worst-case cross-engine divergence of the quantized sum is one
    // quantum (1e-6) per bigram; demand ≥50× that (measured min:
    // 1.13e-4/bigram at sf0.001, 2.06e-4 at sf0.01 — 100–200× slack)
    val marginPerBigram = rows.map { r =>
      val n = BigDecimal(r.getLong(1))
      val s = BigDecimal(r.getDecimal(2))
      ((s - theta * n) / n).abs
    }
    val min = marginPerBigram.min
    assert(min > BigDecimal("0.00005"),
      s"a document sits within $min/bigram of the LM gate — cross-engine membership could flip")
  }

  test("q89 LM gate margin holds at sf0.01 (the driver's gate scale)") {
    val rows = lmScores("/root/testdata/sf0.01")
      .select(col("doc_id"), col("n_bigrams"), col("logprob_sum"))
      .collect()
    assert(rows.nonEmpty)
    val min = rows.map { r =>
      val n = BigDecimal(r.getLong(1))
      val s = BigDecimal(r.getDecimal(2))
      ((s - theta * n) / n).abs
    }.min
    assert(min > BigDecimal("0.00005"),
      s"a document sits within $min/bigram of the LM gate — cross-engine membership could flip")
  }

  test("q89 output carries no transcendental-derived column") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val out = Curation.curateCcnet(
      docs.where($"doc_id" % 97 =!= 0),
      docs.where($"doc_id" % 7 === 0),
      docs.where($"doc_id" % 97 === 0),
      "doc_id", "text", contaminationN = 3)
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_tokens", "dup_2gram_frac", "n_bigrams", "n_oov"))
    assert(out.count() > 0)
  }

  test("bigramLogProb hit columns are the exact model-count dot products") {
    import spark.implicits._
    val train = Seq((100L, "a b a c")).toDF("doc_id", "text")
    // unigrams a:2 b:1 c:1; bigrams (a,b):1 (b,a):1 (a,c):1
    val corpus = Seq((1L, "a b c"), (2L, "z z")).toDF("doc_id", "text")
    val got = Vocab.bigramLogProb(corpus, train, "doc_id", "text")
      .select(col("doc_id"), col("bigram_hits"), col("unigram_hits"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getDecimal(1).longValueExact, r.getDecimal(2).longValueExact))
      .toMap
    // doc 1: (a,b) hits B=1,U(a)=2; (b,c) hits B=0,U(b)=1 → (1, 3)
    assert(got(1L) === ((1L, 3L)))
    // doc 2: (z,z) unseen → (0, 0)
    assert(got(2L) === ((0L, 0L)))
  }

  test("curateCcnet rejects minTokens < 2 (an LM-ungateable document class)") {
    import spark.implicits._
    // a < 2-token doc has no bigrams → no bigramLogProb row → the LM
    // join would silently DROP it rather than gate it; the require makes
    // the constraint loud
    val df = Seq((1L, "one")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Curation.curateCcnet(df, df, df, "doc_id", "text", minTokens = 1)
    }
  }

  test("curateGopher: rule gate, decontamination, span rewrite, dedup compose") {
    import spark.implicits._
    val bench = Seq((100L, "secret eval question body")).toDF("doc_id", "text")
    val corpus = Seq(
      // passes rules; repeated 2-token span "aaa bbb" rewritten away
      (1L, "the cat aaa bbb ccc ddd aaa bbb runs"),
      // after cleanup identical to doc 1's cleaned text → deduped (higher id)
      (2L, "the cat aaa bbb ccc ddd ccc ddd runs"),
      // fails the word-count rule (minWords = 5 below)
      (3L, "the end"),
      // contains a bench 3-gram → decontaminated away
      (4L, "the secret eval question body leaked here today"),
      // passes everything untouched
      (5L, "the dog walks eee fff ggg hhh slowly")).toDF("doc_id", "text")
    val out = Curation.curateGopher(corpus, bench, "doc_id", "text",
        minWords = 5, minDistinctStopwords = 1, contaminationN = 3,
        chunkTokens = 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // doc 1: chunks [the cat][aaa bbb][ccc ddd][aaa bbb][runs] → drop
    //   the repeated "aaa bbb"; doc 2 drops its repeated "ccc ddd" —
    //   SAME cleaned text as doc 1 → doc 2 collapses into doc 1
    assert(out.toSeq === Seq(
      (1L, 5L, 4L, "the cat aaa bbb ccc ddd runs"),
      (5L, 4L, 4L, "the dog walks eee fff ggg hhh slowly")))
  }
}
