package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Packing, Retrieval, Sampling, Similarity, Vocab}

/** Hand-computed models for the round-6 training-data operators: BM25
  * retrieval, blocklist gating, tokenizer fertility, padding waste,
  * epoch allocation, and hard-negative mining.
  */
class RetrievalSpec extends SparkSuite {

  private def corpus3 = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana"),
      (3L, "cherry dates")).toDF("doc_id", "text")
  }

  test("queryTermStats computes tf/dl/df and corpus scalars exactly") {
    val out = Retrieval.queryTermStats(corpus3, "doc_id", "text",
        Seq("apple", "banana"))
      .orderBy(col("doc_id"), col("term")).collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
      r.getAs[Long]("tf"), r.getAs[Long]("dl"), r.getAs[Long]("df"))).toSeq ===
      Seq((1L, "apple", 2L, 4L, 1L), (1L, "banana", 1L, 4L, 2L),
        (2L, "banana", 2L, 2L, 2L)))
    assert(out.forall(r => r.getAs[Long]("n_docs") === 3L &&
      r.getAs[Long]("corpus_tokens") === 8L))
  }

  test("bm25TopK ranks the rare-term doc first and counts term hits") {
    val top = Retrieval.bm25TopK(corpus3, "doc_id", "text",
      Seq("apple", "banana"), k = 2).collect()
    // doc 1 holds the rare term (df=1 → high idf) twice; doc 2 only the
    // common one — BM25 must prefer doc 1 despite equal raw tf totals
    assert(top.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    assert(top.map(_.getAs[Long]("n_terms_hit")).toSeq === Seq(2L, 1L))
    assert(top.forall(_.getAs[Double]("bm25") > 0.0))
    assert(top(0).getAs[Double]("bm25") > top(1).getAs[Double]("bm25"))
  }

  test("bm25 score matches the hand-computed Robertson +1-idf value") {
    // independent restatement of the published formula (k1=1.2, b=0.75)
    // over queryTermStats' hand-verified integer basis — bm25TopK and
    // bm25TopKRanked share bm25Term, so their mutual agreement alone
    // cannot catch a formula bug (swapped k1/b, dropped k1+1, wrong
    // idf smoothing)
    val top = Retrieval.bm25TopK(corpus3, "doc_id", "text",
      Seq("apple", "banana"), k = 2).collect()
    val avgdl = 8.0 / 3 // corpus_tokens / n_docs from the stats test
    def idf(df: Long): Double = math.log((3 - df + 0.5) / (df + 0.5) + 1.0)
    def sat(tf: Long, dl: Long): Double =
      tf * (1.2 + 1.0) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    val doc1 = idf(1) * sat(2, 4) + idf(2) * sat(1, 4) // apple×2 + banana×1
    val doc2 = idf(2) * sat(2, 2)                      // banana×2
    assert(top.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    assert(math.abs(top(0).getAs[Double]("bm25") - doc1) < 1e-12, top(0).toString)
    assert(math.abs(top(1).getAs[Double]("bm25") - doc2) < 1e-12, top(1).toString)
  }

  test("bm25TopKRanked agrees with bm25TopK's order and numbers ranks 1..k") {
    val plain = Retrieval.bm25TopK(corpus3, "doc_id", "text",
      Seq("apple", "banana"), k = 2).collect()
    val ranked = Retrieval.bm25TopKRanked(corpus3, "doc_id", "text",
      Seq("apple", "banana"), k = 2).collect()
    assert(ranked.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2))
    // the quantized-decimal twin must order identically to the float
    // scorer (quantization at 1e-9 can't flip these hand-sized gaps)
    assert(ranked.map(_.getAs[Long]("doc_id")).toSeq ===
      plain.map(_.getAs[Long]("doc_id")).toSeq)
    assert(ranked.map(_.getAs[Long]("n_terms_hit")).toSeq ===
      plain.map(_.getAs[Long]("n_terms_hit")).toSeq)
    // the convenience double tracks the float score closely
    ranked.zip(plain).foreach { case (r, p) =>
      assert(math.abs(r.getAs[Double]("bm25") - p.getAs[Double]("bm25")) < 1e-6)
    }
  }

  test("blocklist gate is token-exact, case-folded, and per-source audited") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A", "good text here"),
      (2L, "A", "bad things bad"),
      (3L, "B", "evil BAD stuff"),
      (4L, "C", "assess the situation")).toDF("doc_id", "source", "text")
    val words = Seq("bad", "evil", "ass")
    val kept = Curation.blocklistFilter(docs, "text", words, maxHits = 0)
      .select("doc_id").as[Long].collect().sorted
    // "assess" must NOT trip the "ass" entry (token-exact, not substring);
    // "BAD" must trip "bad" (case-folded)
    assert(kept.toSeq === Seq(1L, 4L))
    val rep = Curation.blocklistReport(docs, "source", "text", words,
        maxHits = 0)
      .orderBy(col("source")).collect()
    assert(rep.map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_flagged"), r.getAs[Long]("total_hits"),
      r.getAs[Double]("keep_rate"))).toSeq ===
      Seq(("A", 2L, 1L, 2L, 0.5), ("B", 1L, 1L, 2L, 0.0),
        ("C", 1L, 0L, 0L, 1.0)))
  }

  test("fertilityReport splits punctuation into its own tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "hello, world!"),
      (2L, "de", "abc def")).toDF("doc_id", "lang", "text")
    val out = Vocab.fertilityReport(docs, "lang", "text")
      .orderBy(col("lang")).collect()
    val de = out(0)
    assert(de.getAs[Long]("n_words") === 2L &&
      de.getAs[Long]("n_tokens") === 2L && de.getAs[Long]("n_chars") === 7L)
    assert(de.getAs[Double]("fertility") === 1.0)
    val en = out(1)
    // "hello, world!" → 2 whitespace words but 4 pre-tokens
    // (hello , world !) over 13 chars
    assert(en.getAs[Long]("n_words") === 2L &&
      en.getAs[Long]("n_tokens") === 4L && en.getAs[Long]("n_chars") === 13L)
    assert(en.getAs[Double]("fertility") === 2.0)
    assert(en.getAs[Double]("chars_per_token") === 3.25)
  }

  test("bpeFertilityReport's subword counts respect the trained merges") {
    import spark.implicits._
    // "aa" dominates → first merges collapse a·a; with enough merges the
    // corpus words become single tokens and fertility returns to 1.0
    val docs = Seq((1L, "x", "aaaa aaaa aa"), (2L, "x", "aaaa aa aa"))
      .toDF("doc_id", "lang", "text")
    val out = Vocab.bpeFertilityReport(docs, "lang", "text", numMerges = 8)
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_words") === 6L)
    assert(out(0).getAs[Long]("n_subwords") === 6L)
    assert(out(0).getAs[Double]("fertility") === 1.0)
    // with zero merges every character is its own subword: the six
    // words carry 4+4+2 + 4+2+2 = 18 characters
    val none = Vocab.bpeFertilityReport(docs, "lang", "text", numMerges = 0)
      .collect()(0)
    assert(none.getAs[Long]("n_subwords") === 18L)
  }

  test("paddingWasteReport hand model across a two-length grid") {
    import spark.implicits._
    val docs = Seq((1L, "a " * 3), (2L, "b " * 5), (3L, "c " * 8))
      .map { case (i, t) => (i, t.trim) }.toDF("doc_id", "text")
    val out = Packing.paddingWasteReport(docs, "text", Seq(4, 8))
      .orderBy(col("seq_len")).collect()
    val l4 = out(0)
    assert(l4.getAs[Long]("seq_len") === 4L)
    assert(l4.getAs[Long]("n_docs") === 3L && l4.getAs[Long]("n_tokens") === 16L)
    // ceil(3/4)+ceil(5/4)+ceil(8/4) = 1+2+2 = 5 sequences → 20 slots
    assert(l4.getAs[Long]("padded_seqs") === 5L)
    assert(l4.getAs[Long]("padded_tokens") === 20L)
    assert(l4.getAs[Double]("pad_waste_frac") === 0.2)
    assert(l4.getAs[Long]("packed_seqs") === 4L)
    val l8 = out(1)
    assert(l8.getAs[Long]("padded_seqs") === 3L)
    assert(l8.getAs[Long]("padded_tokens") === 24L)
    assert(l8.getAs[Double]("pad_waste_frac") === 1.0 / 3.0)
    assert(l8.getAs[Long]("packed_seqs") === 2L)
  }

  test("epochAllocation grants budget-proportional epochs under the cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A", "t " * 300), (2L, "B", "t " * 100))
      .map { case (i, s, t) => (i, s, t.trim) }
      .toDF("doc_id", "source", "text")
    val out = Sampling.epochAllocation(docs, "source", "text",
        budgetTokens = 400L, alpha = 0.5, maxEpochs = 4.0)
      .orderBy(col("source")).collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("n_tokens") === 300L && b.getAs[Long]("n_tokens") === 100L)
    // √-temperature: shares 0.75/0.25 → weights √3:1 → 0.633975/0.366025
    assert(a.getAs[java.math.BigDecimal]("weight").toPlainString === "0.633975")
    assert(b.getAs[java.math.BigDecimal]("weight").toPlainString === "0.366025")
    // grants: 0.633975·400/300 = 0.845300; 0.366025·400/100 = 1.464100
    assert(a.getAs[java.math.BigDecimal]("epochs").toPlainString === "0.845300")
    assert(b.getAs[java.math.BigDecimal]("epochs").toPlainString === "1.464100")
    assert(a.getAs[Long]("effective_tokens") === 253L)
    assert(b.getAs[Long]("effective_tokens") === 146L)
    // a huge budget pins every group at the cap
    val capped = Sampling.epochAllocation(docs, "source", "text",
        budgetTokens = 100000L, alpha = 0.5, maxEpochs = 4.0)
      .collect()
    assert(capped.forall(
      _.getAs[java.math.BigDecimal]("epochs").doubleValue === 4.0))
  }

  test("hardNegatives excludes same-label vectors and breaks ties by id") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(1f, 0f), 0), // identical but same label → never a negative
      (2L, Array(0.9f, 0.1f), 1),
      (3L, Array(0f, 1f), 1),
      (4L, Array(0f, 1f), 1)) // exact tie with id 3 → id 3 ranks first
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        anchors = emb.where(col("vec_id") === 0L), m = 3)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getAs[Long]("negative_id")).toSeq === Seq(2L, 3L, 4L))
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    assert(out.forall(_.getAs[Int]("negative_label") === 1))
    assert(out(1).getAs[Double]("cosine") === out(2).getAs[Double]("cosine"))
  }

  test("rrfFuse: hand-computed scores, missing-side zeros, id tie-break") {
    import spark.implicits._
    val a = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 4L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq(("q", 2L, 1), ("q", 3L, 2), ("q", 5L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b, "query_id", "doc_id", topK = 10)
      .orderBy(col("rank")).collect()
    // d2 appears in both lists (1/62 + 1/61); d1 leads its single list
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ===
      Seq(2L, 1L, 3L, 4L, 5L))
    assert(out.head.getAs[Double]("rrf_score") === 1.0 / 62 + 1.0 / 61)
    assert(out(1).getAs[Double]("rrf_score") === 1.0 / 61)
    assert(out(1).getAs[Any]("rank_b") === null) // absent side is null
    // d4 (rank 3 in A) and d5 (rank 3 in B) tie at 1/63 → smaller id first
    assert(out(3).getAs[Double]("rrf_score") ===
      out(4).getAs[Double]("rrf_score"))
    assert(out(3).getAs[Long]("doc_id") === 4L)
    assert(out.map(_.getAs[Int]("rank")).toSeq === (1 to 5))
  }

  test("rrfFuse fuses per query independently and honors topK") {
    import spark.implicits._
    val a = Seq(("q1", 1L, 1), ("q1", 2L, 2), ("q2", 3L, 1))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq(("q1", 2L, 1), ("q2", 1L, 1))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b, "query_id", "doc_id", topK = 1)
      .collect()
    // one survivor per query: q1 → d2 (both lists), q2 → d1/d3 tie → d1
    assert(out.length === 2)
    val byQ = out.map(r =>
      r.getAs[String]("query_id") -> r.getAs[Long]("doc_id")).toMap
    assert(byQ === Map("q1" -> 2L, "q2" -> 1L))
  }
}
