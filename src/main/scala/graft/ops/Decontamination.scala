package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-gram shingles with a benchmark/eval corpus, so they can be dropped
  * before training (the standard n-gram-overlap decontamination used for
  * LLM training sets).
  *
  * Scale design (100 TB corpus, benchmark of at most a few million
  * shingles): the benchmark side reduces to a distinct shingle set and is
  * **broadcast** — the corpus side is a narrow scan (shingling is a
  * codegen'd per-row kernel), a broadcast hash join that keeps only
  * matching shingles, and one aggregation shuffled on doc id that carries
  * matched shingles only. The corpus is never shuffled by shingle, and
  * nothing data-sized reaches the driver.
  */
object Decontamination {

  /** call_function on a graft_* expression, auto-registering in the
    * active session first (idempotent).
    */
  private def graftFn(name: String,
      args: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.fn(name, args: _*)

  /** Per-document contamination scores against `bench`: the number of
    * distinct `n`-gram shingles shared with any benchmark document, and
    * that count as a fraction of the document's distinct shingles. Only
    * documents with `n_overlap >= minOverlap` are returned (untouched
    * documents vanish in the broadcast join — on a real corpus almost
    * every document, so the aggregate is tiny).
    *
    * Real eval-set decontamination uses longer windows (8–13-gram); `n`
    * is a parameter because the synthetic test corpus is too short for
    * overlaps at that length.
    *
    * @return columns: `idCol`, n_shingles, n_overlap, overlap_frac
    */
  def contaminationScores(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      minOverlap: Int = 1): DataFrame =
    contaminationScoresWithShingles(corpus,
      benchShingles(bench, textCol, n), idCol, textCol, n, minOverlap)

  /** The benchmark's distinct shingle set — the steady-state asset of a
    * continuously-running decontamination gate: compute (and persist)
    * it once, pass it to [[contaminationScoresWithShingles]] for every
    * batch, so the eval set is never re-shingled per probe.
    */
  def benchShingles(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench
      .select(explode(Dedup.shingles(col(textCol), n)).as("__sh"))
      .distinct()

  /** Multi-suite decontamination in ONE corpus pass: shingle overlap
    * against EVERY benchmark suite at once, reported per (document,
    * suite) — the real pre-training shape (a corpus is screened against
    * MMLU and GSM8K and HumanEval together, not with one scan each).
    * The (suite, shingle) set is eval-sized and broadcasts; suite
    * attribution rides the same join that a single-suite gate already
    * pays, so k suites cost one scan, not k.
    *
    * @return `idCol, suite, n_shingles, n_overlap, overlap_frac` for
    *         pairs clearing `minOverlap`
    */
  def contaminationBySuite(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, suiteCol: String, n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    val suiteShingles = bench
      .select(col(suiteCol).as("suite"),
        explode(Dedup.shingles(col(textCol), n)).as("__sh"))
      .distinct()
    Dedup.spread(corpus)
      .select(col(idCol), Dedup.shingles(col(textCol), n).as("__shs"))
      .select(col(idCol), size(col("__shs")).cast("long").as("n_shingles"),
        explode(col("__shs")).as("__sh"))
      .join(broadcast(suiteShingles), Seq("__sh"))
      .groupBy(col(idCol), col("suite"))
      .agg(max(col("n_shingles")).as("n_shingles"),
        count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
      .withColumn("overlap_frac",
        col("n_overlap").cast("double") / col("n_shingles"))
  }

  /** Bloom-filter contamination screen — the Dolma-scale form of
    * [[contaminationScores]] for eval suites whose distinct shingle set
    * is too large to broadcast as strings: the shingles compress into a
    * ~12-bits-per-item Bloom filter (built by one distributed
    * `stat.bloomFilter` aggregation), and the corpus side becomes a
    * ZERO-shuffle narrow scan — no shingle explode reaches an exchange
    * and no per-doc groupBy, because each document counts its own
    * shingles against the broadcast filter in place.
    *
    * Guarantee direction: `mightContain` has NO false negatives, so
    * per-document `n_overlap` here is ≥ the exact overlap — a screen
    * that can only over-flag (drop a clean doc at rate ≈ fpp·shingles),
    * never let contamination through. Route screen-positives to the
    * exact [[contaminationScoresWithShingles]] for confirmation when
    * the keep decision is expensive. Deterministic: the filter's bit
    * array is an insertion-order-independent OR with fixed hash seeds.
    *
    * @return `idCol, n_shingles, n_overlap, overlap_frac` (the exact
    *         gate's schema, overcounted by at most the FP mass)
    */
  def contaminationScoresBloom(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8, minOverlap: Int = 1,
      expectedItems: Long = 1000000L, fpp: Double = 0.001): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bloom = benchShingles(bench, textCol, n)
      .stat.bloomFilter("__sh", expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    // the id rides through the typed mapPartitions as its STRING form
    // and is cast back to its original type on the way out — id-type
    // generic like the exact twin [[contaminationScores]] (a hard
    // cast("long") here silently nulled string/UUID ids). BINARY ids
    // round-trip via base64 — a raw binary→string cast mangles
    // non-UTF8 bytes, the same silent-corruption class.
    val idType = corpus.schema(idCol).dataType
    val isBinary = idType == org.apache.spark.sql.types.BinaryType
    val idOut =
      if (isBinary) base64(col(idCol)) else col(idCol).cast("string")
    def idBack(c: org.apache.spark.sql.Column) =
      if (isBinary) unbase64(c) else c.cast(idType)
    Dedup.spread(corpus)
      .select(idOut, Dedup.shingles(col(textCol), n))
      .as[(String, Seq[String])]
      .mapPartitions { it =>
        val f = bc.value
        it.map { case (id, shs) =>
          // null text decodes to a null Seq; the exact twin drops such
          // docs (explode(null) eliminates the row), so score 0 here —
          // the minOverlap filter below removes it identically
          val s = if (shs == null) Seq.empty[String] else shs
          (id, s.size.toLong, s.count(f.mightContainString).toLong)
        }
      }
      .toDF(idCol, "n_shingles", "n_overlap")
      .withColumn(idCol, idBack(col(idCol)))
      .where(col("n_overlap") >= minOverlap)
      .withColumn("overlap_frac",
        col("n_overlap").cast("double") / col("n_shingles"))
  }

  /** Verbatim leak check: documents containing any benchmark NEEDLE as
    * an exact substring — the strictest contamination form (an eval
    * answer string pasted into training text), which shingle overlap
    * can under-report when the needle is shorter than `n` tokens.
    * Needles shorter than `minChars` are ignored (single words would
    * flag everything). The needle set is eval-sized and broadcasts; the
    * scan side is one narrow `contains` pass per needle — no corpus
    * shuffle at any size.
    *
    * @return `idCol, needle` — one row per (document, matched needle)
    */
  def verbatimMatches(corpus: DataFrame, needles: DataFrame,
      idCol: String, textCol: String, needleCol: String,
      minChars: Int = 12): DataFrame = {
    val ns = needles
      .select(col(needleCol).cast("string").as("needle"))
      .where(length(col("needle")) >= minChars)
      .distinct()
    corpus.select(col(idCol), col(textCol))
      .join(broadcast(ns), col(textCol).contains(col("needle")))
      .select(col(idCol), col("needle"))
  }

  /** Aho-Corasick automaton over a fixed needle set: one linear pass
    * per text finds EVERY needle occurrence, instead of one scan per
    * needle. Goto/fail/output construction (Aho & Corasick 1975);
    * `matchedNeedles` returns the distinct needle indices found.
    */
  private[graft] final class AhoCorasick(needles: Array[String]) extends Serializable {
    // captured as a val so the needle ARRAY itself is construction-only
    // and never retained/serialized — callers that also hold the needles
    // (AcMatcher's UTF8 rebuild) would otherwise ship every string twice
    private val noNeedles = needles.isEmpty
    private val gotoMaps =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.HashMap.empty[Char, Int])
    private val outputs =
      scala.collection.mutable.ArrayBuffer(List.empty[Int])
    needles.zipWithIndex.foreach { case (n, i) =>
      var s = 0
      n.foreach { ch =>
        s = gotoMaps(s).getOrElseUpdate(ch, {
          gotoMaps += scala.collection.mutable.HashMap.empty[Char, Int]
          outputs += Nil
          gotoMaps.size - 1
        })
      }
      outputs(s) = i :: outputs(s)
    }
    private val fail = Array.fill(gotoMaps.size)(0)
    // BFS: child's fail = deepest proper suffix state; outputs inherit.
    // The queue is a construction-only local — as a field it would ride
    // every broadcast/plan serialization of the automaton as dead state.
    locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotoMaps(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      gotoMaps(s).foreach { case (ch, child) =>
        queue.enqueue(child)
        var f = fail(s)
        while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
        val cand = gotoMaps(f).getOrElse(ch, 0)
        fail(child) = if (cand == child) 0 else cand // depth-1 self guard
        outputs(child) = outputs(child) ++ outputs(fail(child))
      }
    }
    }

    def matchedNeedles(text: String): Iterator[Int] = {
      if (noNeedles) return Iterator.empty
      val seen = scala.collection.mutable.BitSet.empty
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !gotoMaps(s).contains(ch)) s = fail(s)
        s = gotoMaps(s).getOrElse(ch, 0)
        outputs(s).foreach(seen.add)
        i += 1
      }
      seen.iterator
    }

    /** Number of DISTINCT needles occurring in `text` — one linear
      * pass; equals `size(filter(needles, text.contains(_)))`.
      */
    def countMatches(text: String): Int = matchedNeedles(text).size
  }

  /** [[verbatimMatches]] at the many-needle scale: the needle set
    * compiles ONCE into a broadcast Aho-Corasick automaton and each
    * document is scanned in a single linear pass that reports every
    * matched needle — O(text + matches) per document instead of one
    * `contains` pass per needle, the shape that holds when the eval
    * suite contributes thousands of needles. Same output contract as
    * [[verbatimMatches]] (bit-identical — the equivalence is
    * oracle-checked), via the mapPartitions seam with the automaton
    * built per executor from the broadcast needle array.
    */
  def verbatimMatchesMulti(corpus: DataFrame, needles: DataFrame,
      idCol: String, textCol: String, needleCol: String,
      minChars: Int = 12): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val arr = needles
      .select(col(needleCol).cast("string"))
      .where(length(col(needleCol)) >= minChars)
      .distinct().as[String].collect().sorted // eval-sized, deterministic
    val bc = spark.sparkContext.broadcast(arr)
    // id-type generic like the exact twin: the id rides through the
    // typed mapPartitions as its STRING form (binary via base64) and is
    // cast back on the way out — a hard cast("long") here nulled
    // string/UUID ids and broke the documented bit-identical contract
    // with verbatimMatches (same class as contaminationScoresBloom's
    // fixed bug). Null text matches nothing, like `contains` on null.
    val idType = corpus.schema(idCol).dataType
    val isBinary = idType == org.apache.spark.sql.types.BinaryType
    val idOut =
      if (isBinary) base64(col(idCol)) else col(idCol).cast("string")
    def idBack(c: org.apache.spark.sql.Column) =
      if (isBinary) unbase64(c) else c.cast(idType)
    corpus.select(idOut, col(textCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val local = bc.value
        val ac = new AhoCorasick(local)
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else ac.matchedNeedles(text).map(i => (id, local(i)))
        }
      }
      .toDF(idCol, "needle")
      .withColumn(idCol, idBack(col(idCol)))
  }

  /** [[contaminationScores]] against a PRECOMPUTED (usually persisted)
    * benchmark shingle set — one column `__sh`, eval-set-sized, always
    * the broadcast side.
    */
  def contaminationScoresWithShingles(corpus: DataFrame,
      benchShingles: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minOverlap: Int = 1): DataFrame = {
    val corpusShingles = Dedup.spread(corpus)
      .select(col(idCol), Dedup.shingles(col(textCol), n).as("__shs"))
      .select(col(idCol), size(col("__shs")).cast("long").as("n_shingles"),
        explode(col("__shs")).as("__sh"))
    corpusShingles
      .join(broadcast(benchShingles), Seq("__sh"))
      .groupBy(col(idCol))
      // n_shingles is constant per doc; max() just carries it through
      .agg(max(col("n_shingles")).as("n_shingles"),
        count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
      .withColumn("overlap_frac",
        col("n_overlap").cast("double") / col("n_shingles"))
  }

  /** Train/test SPLIT LEAKAGE audit: split the corpus deterministically
    * by an md5 bucket on the id ([[Sampling.md5Bucket]] — layout- and
    * engine-independent), then score every test-split document by its
    * shingle overlap with the train split — the pre-training sanity
    * check that held-out data isn't (near-)verbatim inside the training
    * slice.
    *
    * Scale shape: unlike [[contaminationScores]] (eval set broadcasts),
    * HERE NEITHER SIDE BROADCASTS — the train split is most of the
    * corpus and the test split is a constant fraction of it. Both sides
    * reduce scan-side to shingle streams (kernel expressions), the
    * train side pre-aggregates to distinct shingles, and the match is a
    * shuffle equi-join on the shingle followed by a doc-keyed count.
    * Three data-proportional shuffles, nothing broadcast-bound,
    * nothing quadratic.
    *
    * @return test-side rows: `idCol, n_shingles, n_overlap,
    *         overlap_frac` (only documents with ≥ `minOverlap` matches)
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
      testFraction: Double = 0.1, salt: String = "split", n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    require(testFraction > 0 && testFraction < 1,
      s"testFraction out of range: $testFraction")
    val bucket = Sampling.md5Bucket(col(idCol), salt)
    val cut = (testFraction * 1000000L).toLong
    val test = df.where(bucket < cut)
    val train = df.where(bucket >= cut)
    // per-doc shingle sets are distinct by construction (Dedup.shingles),
    // and the train side collapses to distinct shingles before the join,
    // so count(1) after the join is the distinct-overlap count
    val testShingles = Dedup.spread(test)
      .select(col(idCol), Dedup.shingles(col(textCol), n).as("__shs"))
      .select(col(idCol), size(col("__shs")).cast("long").as("n_shingles"),
        explode(col("__shs")).as("__sh"))
    val trainShingles = Dedup.spread(train)
      .select(explode(Dedup.shingles(col(textCol), n)).as("__sh"))
      .distinct()
    testShingles
      .join(trainShingles, Seq("__sh"))
      .groupBy(col(idCol))
      .agg(max(col("n_shingles")).as("n_shingles"),
        count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
      .withColumn("overlap_frac",
        col("n_overlap").cast("double") / col("n_shingles"))
  }

  /** Span-level decontamination SURGERY: remove every eval needle
    * occurrence in place (each occurrence collapses to one space)
    * instead of dropping the document — the lossless alternative when a
    * long document contains one pasted eval item ([[verbatimMatches]]
    * finds them; this removes them).
    *
    * The needle set is eval-sized by contract and collapses to ONE
    * sorted plan-literal array (collected at build, like
    * [[verbatimMatchesMulti]]); the corpus side is a single narrow
    * scan. The hit gate is ONE Aho-Corasick pass per document
    * (`graft_ac_matches`, ≡ the per-needle `contains` model the
    * q106/q106b shared oracle proves bit-identical — O(text) instead
    * of O(needles × text)), and it returns the MATCHED needle subset in
    * the pinned order, so a matched document folds `replace` over only
    * the needles actually present in it — O(hits), not O(needle set)
    * (at sf1 the full-set fold compounded corpus × needle growth into
    * 11× query growth). Fold order is pinned — longest needle first,
    * then lexicographic — so nested/overlapping needles resolve
    * identically on any engine and partitioning.
    *
    * Semantics pin: needles are matched against the ORIGINAL text. A
    * needle absent from the original that becomes a substring only
    * AFTER an earlier (longer) needle's occurrences collapse to spaces
    * is NOT re-matched — redaction targets pasted eval spans, which
    * exist in the source document or not at all; matching against fold
    * intermediates would make a needle's fate depend on unrelated
    * needles in the set. The oracle SQL states the same rule
    * (`list_filter(needles, contains(text, ·))` before the fold).
    *
    * @return `idCol, n_hits` (distinct needles present pre-surgery),
    *         `clean_text, n_chars_removed`
    */
  def redactVerbatim(corpus: DataFrame, needles: DataFrame, idCol: String,
      textCol: String, needleCol: String, minChars: Int = 12): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // sort on the ENGINE bases, not Java's: length is code points
    // (Spark length() / DuckDB len(), not UTF-16 code units) and ties
    // break by UTF-8 byte order (Spark string comparison; UTF-8
    // preserves code-point order, where String.compareTo's UTF-16
    // units would rank astral chars below some BMP chars) — so the
    // fold order is byte-identical to the oracle's
    // `ORDER BY len DESC, needle` on any needle set
    val arr = needles
      .select(col(needleCol).cast("string").as("needle"))
      .where(length(col("needle")) >= minChars)
      .distinct().as[String].collect()
      .sortWith { (a, b) =>
        val (la, lb) = (a.codePointCount(0, a.length), b.codePointCount(0, b.length))
        if (la != lb) la > lb
        else java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      }
    val needleArr = typedLit(arr.toSeq)
    corpus.select(col(idCol), col(textCol))
      .select(col(idCol), col(textCol),
        // one AC pass yields the matched subset IN the pinned array
        // order (ascending automaton indices over the sorted literal);
        // a NULL text matches nothing — coalesce to the empty set so
        // n_hits is 0, not NULL (the contains-model behavior)
        coalesce(graftFn("graft_ac_matches", col(textCol), needleArr),
          typedLit(Seq.empty[String])).as("__matched"))
      // the fold — the expensive per-needle interpreted HOF — runs
      // over ONLY the matched subset: the unmatched majority folds the
      // empty array (identity), and a matched document pays O(its own
      // hits), never O(needle set)
      .select(col(idCol), col(textCol),
        size(col("__matched")).cast("long").as("n_hits"),
        when(size(col("__matched")) === 0, col(textCol))
          .otherwise(aggregate(col("__matched"), col(textCol),
            (acc, n) => replace(acc, n, lit(" ")))).as("clean_text"))
      .select(col(idCol), col("n_hits"), col("clean_text"),
        (length(col(textCol)) - length(col("clean_text"))).cast("long")
          .as("n_chars_removed"))
  }

  /** SEMANTIC decontamination — the embedding-space twin of the n-gram
    * gate: paraphrased eval leakage shares no 8-gram but still sits next
    * to the eval item in embedding space. For every corpus vector,
    * report its maximum cosine against the eval set, the nearest eval
    * id, and whether it clears `threshold` (the drop decision).
    *
    * Scale: the eval set is eval-sized and **broadcasts** ([[
    * contaminationScores]]'s asymmetry); the corpus is scanned ONCE and
    * the per-row aggregate carries one (cosine, eval_id) struct per
    * corpus row — nothing corpus-sized shuffles beyond the final
    * per-id max. For eval sets too large to broadcast, pre-bucket both
    * sides with [[graft.ops.Similarity.signLshBuckets]] and run the
    * band-key equi-join instead (the q74 shape); this brute-force form
    * is the exact baseline those paths are measured against.
    *
    * Ties (identical cosines) resolve to the SMALLEST eval id — the
    * max is over (cosine, -eval_id) structs, a total order, so the
    * result is deterministic on any partitioning.
    *
    * @return one row per corpus vector: `idCol, max_cosine,
    *         nearest_eval_id, contaminated`
    */
  def semanticContamination(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, evalIdCol: String,
      evalVecCol: String, threshold: Double): DataFrame = {
    // Degenerate (zero-norm) EVAL vectors are excluded up front: their
    // cosine is 0/0 = NaN against every corpus row, and Spark orders NaN
    // above all doubles — one silent failed-encoder eval row would win
    // every max and flag the ENTIRE corpus contaminated. A degenerate
    // CORPUS vector still surfaces as max_cosine = NaN (honest — it
    // cannot be measured) but never as contaminated = true.
    val q = broadcast(evalSet.select(col(evalIdCol).as("__eid"),
        col(evalVecCol).as("__evec"))
      .where(!isnan(Similarity.cosine(col("__evec"), col("__evec")))))
    Dedup.spread(corpus)
      .crossJoin(q)
      .select(col(idCol),
        struct(Similarity.cosine(col(vecCol), col("__evec")).as("__cos"),
          (-col("__eid")).as("__neg")).as("__s"))
      .groupBy(col(idCol))
      .agg(max(col("__s")).as("__m"))
      .select(col(idCol),
        col("__m.__cos").as("max_cosine"),
        (-col("__m.__neg")).as("nearest_eval_id"),
        (col("__m.__cos") >= threshold &&
          !isnan(col("__m.__cos"))).as("contaminated"))
  }
}
