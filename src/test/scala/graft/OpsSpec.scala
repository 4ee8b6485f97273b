package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextAnalysis}

class OpsSpec extends SparkSuite {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("jaccard on known arrays") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard($"x", $"y")).head().getDouble(0)
    assert(j === 2.0 / 4.0)
  }

  test("shingles: 3-grams of a 5-token doc, short docs empty") {
    import spark.implicits._
    val df = Seq("a b c d e", "a b").toDF("text")
    val sh = df.select(Dedup.shingles($"text", 3)).collect()
    assert(sh(0).getSeq[String](0).toSet === Set("a b c", "b c d", "c d e"))
    assert(sh(1).getSeq[String](0).isEmpty)
  }

  test("exactDedup keeps the lowest id per duplicate text") {
    import spark.implicits._
    val df = Seq((3L, "same"), (1L, "same"), (2L, "other")).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
  }

  test("minhash near-dups find exact duplicates and respect threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark query engine fast scan join"),
      (2L, "spark query engine fast scan join"), // dup of 1
      (3L, "completely different words entirely here now")).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 === 1.0)
  }

  test("minhash candidates are a superset of high-jaccard exact pairs on real docs") {
    val exact = Dedup.blockedJaccardPairs(docs, "doc_id", "text", "lang", 0.99)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.99)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the reference must be non-empty or the subset check is vacuous
    // (the fixture plants exact dup pairs, J = 1)
    assert(exact.nonEmpty)
    // jaccard ≈ 1 pairs collide in every band — LSH cannot miss them
    assert(exact.subsetOf(mh))
  }

  test("simhash: identical docs at distance 0, near docs at small distance") {
    import spark.implicits._
    val df = Seq((1L, "a", "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "a", "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "a", "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "lang", "text")
    val pairs = Dedup.simhashNearDups(df, "doc_id", "text", "lang", maxBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("clusterLabels resolves transitive chains; collapse keeps minima + unpaired") {
    import spark.implicits._
    // chain 1-2-3 and island 5-6; 9 is unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("idA", "idB")
    val labels = Dedup.clusterLabels(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))

    val df = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("doc_id")
    val kept = Dedup.collapseNearDups(df, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 5L, 9L))
  }

  test("driver union-find and distributed CC produce identical labels") {
    import spark.implicits._
    // chains, a cycle, a star, and singles-by-absence — unioned in an
    // order that exercises root merging both directions
    val rnd = new scala.util.Random(11)
    val edges = (Seq((7L, 3L), (3L, 9L), (9L, 7L)) ++ // cycle
      (1 to 60).map(i => (rnd.nextInt(40).toLong + 100, rnd.nextInt(40).toLong + 100)))
      .filter(e => e._1 != e._2)
    val pairs = edges.toDF("idA", "idB")
    val fast = Dedup.clusterLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = Dedup.clusterLabels(pairs, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === distributed)
    assert(fast(7L) === 3L && fast(9L) === 3L) // cycle labels to its min
  }

  test("clusterLabels handles string ids: lexicographic min labels, no long cast") {
    import spark.implicits._
    // non-numeric ids would NPE under a cast("long") fast path, and
    // numeric strings order lexicographically ("10" < "9", "007" ≠ "7");
    // both must flow through the distributed path's native least()
    val pairs = Seq(
      ("doc-b", "doc-a"), ("doc-b", "doc-c"),   // cluster min "doc-a"
      ("10", "9"), ("9", "007"))                // lexicographic min "007"
      .toDF("idA", "idB")
    val labels = Dedup.clusterLabels(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels("doc-a") === "doc-a" && labels("doc-b") === "doc-a" &&
      labels("doc-c") === "doc-a")
    assert(labels("007") === "007" && labels("9") === "007" &&
      labels("10") === "007")
    // ids survive byte-identical — no numeric round-trip
    assert(labels.keySet === Set("doc-a", "doc-b", "doc-c", "007", "9", "10"))
  }

  test("crossGroupNearDupMatrix counts cross-source links, normalized and grouped") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "srcA"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "srcB"), // dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta", "srcB"), // dup of 1 (same source as 2 → not counted)
      (4L, "one two three four five six seven eight nine", "srcC"),
      (5L, "one two three four five six seven eight nine", "srcA"), // dup of 4
      (6L, "totally unrelated words appearing nowhere else at all", "srcC"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.crossGroupNearDupMatrix(df, "doc_id", "text", "source",
        threshold = 0.95, numHashes = 16, bands = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // 1↔2, 1↔3 cross srcA/srcB (2 links); 2↔3 same-source → excluded;
    // 4↔5 crosses srcA/srcC; orientation always (min, max)
    assert(got === Set(("srcA", "srcB", 2L), ("srcA", "srcC", 1L)))
  }

  test("groupNoveltyRates: cross-linked docs counted once, rate exact") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "srcA"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "srcB"), // links to 1 and 3
      (3L, "alpha beta gamma delta epsilon zeta eta theta", "srcA"), // links to 2 (cross) and 1 (same)
      (4L, "totally unrelated words appearing nowhere else at all", "srcB"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.groupNoveltyRates(df, "doc_id", "text", "source",
        threshold = 0.95, numHashes = 16, bands = 4)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // srcA: 1 and 3 both cross-link to 2 → 2/2 linked, novelty 0
    assert(got("srcA") === ((2L, 2L, 0.0)))
    // srcB: 2 links, 4 is novel → 1/2 linked, novelty 0.5
    assert(got("srcB") === ((2L, 1L, 0.5)))
  }

  test("collapseNearDupsBy keeps the best-score member per cluster, ties to low id") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("idA", "idB")
    val df = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5), // cluster {1,2,3}: 2 wins on score
      (5L, 0.7), (6L, 0.7),            // cluster {5,6}: tie → lowest id 5
      (9L, 0.1))                       // unpaired: survives untouched
      .toDF("doc_id", "quality")
    val kept = Dedup.collapseNearDupsBy(df, "doc_id", pairs, "quality")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(kept === Set((2L, 0.9), (5L, 0.7), (9L, 0.1)))
  }

  test("banded simhash finds exact dups and agrees with the blocked variant") {
    import spark.implicits._
    val df = Seq((1L, "a", "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "a", "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "a", "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "lang", "text")
    // identical docs share every band — maxBits=0 must find them
    val banded = Dedup.simhashNearDupsBanded(df, "doc_id", "text", maxBits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(banded.toSet === Set((1L, 2L)))

    // on real docs: banded candidates at maxBits < bands are complete —
    // every blocked-exact pair (same lang ⊂ all pairs) must appear
    val exact = Dedup.simhashNearDups(docs, "doc_id", "text", "lang", maxBits = 3)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scale = Dedup.simhashNearDupsBanded(docs, "doc_id", "text", maxBits = 3)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty) // else the completeness check below is vacuous
    assert(exact.subsetOf(scale))
  }

  test("cosine matches hand-computed value") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f, 1.0f), Seq(1.0f, 1.0f, 0.0f))).toDF("a", "b")
    val c = df.select(Similarity.cosine($"a", $"b")).head().getDouble(0)
    assert(math.abs(c - 0.5) < 1e-12) // dot=1, norms=sqrt(2) each
  }

  test("brute-force top-k is ordered and excludes the query vector") {
    val emb = Tables.embeddings(spark, sfDir)
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 5).collect()
    assert(top.length === 5)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("ann top-k results are a subset of brute-force ranking universe") {
    val emb = Tables.embeddings(spark, sfDir)
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", 0L, 5, planes = 2)
      .collect()
    assert(ann.nonEmpty)
    // NOTE: with k=500 over a 500-row corpus, bf holds every non-query
    // id, so id-membership alone is unfalsifiable — the real pin is
    // that each ANN hit carries the TRUE cosine (independently
    // recomputed by the brute-force path) and the list is rank-ordered
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach(r => assert(math.abs(bf(r.getLong(0)) - r.getDouble(1)) < 1e-12))
    val sims = ann.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("bucketed cosine pairs are a verified subset of the exact pairs") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .select($"idA", $"idB", $"cosine")
    val bucketed = Similarity.cosineNearDupPairsBucketed(
      emb, "vec_id", "embedding", 0.3, planesPerBand = 2, bands = 2)
    // every bucketed pair is a true pair with the true cosine
    assert(bucketed.exceptAll(exact).isEmpty)
    assert(bucketed.count() > 0)
  }

  test("ivfNearDupPairs equals exact pairs restricted to co-cell membership") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val semantic = Similarity.ivfNearDupPairs(emb, "vec_id", "embedding",
      centroids, threshold = 0.3)
    // ground truth: exact pairs whose two sides share an IVF cell
    val cells = Similarity.ivfAssign(emb, "embedding", centroids)
      .select($"vec_id", $"centroid_id")
    val expected = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .join(cells.select($"vec_id".as("idA"), $"centroid_id".as("__ca")), Seq("idA"))
      .join(cells.select($"vec_id".as("idB"), $"centroid_id".as("__cb")), Seq("idB"))
      .where($"__ca" === $"__cb")
      .select($"idA", $"idB", $"cosine")
    val got = semantic.select($"idA", $"idB", $"cosine")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("assignmentDrift: 0 for identical releases, exactly 1 for disjoint cells") {
    import spark.implicits._
    val cents = Array(Array(1f, 0f), Array(0f, 1f))
    val nearX = Seq((1L, Seq(1f, 0.1f)), (2L, Seq(0.9f, 0.2f)))
      .toDF("vec_id", "embedding")
    val nearY = Seq((3L, Seq(0.1f, 1f)), (4L, Seq(0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val same = Similarity.assignmentDrift(nearX, nearX, "embedding", cents)
      .head()
    assert(same.getAs[Double]("tv") === 0.0)
    val disjoint = Similarity.assignmentDrift(nearX, nearY, "embedding", cents)
      .head()
    assert(disjoint.getAs[Double]("tv") === 1.0)
    assert(disjoint.getAs[Long]("n_a") === 2L &&
      disjoint.getAs[Long]("n_b") === 2L)
  }

  test("verbatimMatches flags exact substring leaks, ignores short needles") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the secret eval answer is forty two ok"),
      (2L, "prefix text the secret eval answer is forty two pasted here"),
      (3L, "nothing shared with the benchmark at all")).toDF("doc_id", "text")
    val needles = Seq("the secret eval answer is forty two", "ok")
      .toDF("needle")
    val got = graft.ops.Decontamination.verbatimMatches(
        docs, needles, "doc_id", "text", "needle", minChars = 12)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // long needle hits docs 1 and 2; the 2-char "ok" is below minChars
    assert(got.map(_._1).sorted.toSeq === Seq(1L, 2L))
    assert(got.forall(_._2.startsWith("the secret")))
  }

  test("distributionDrift: zero for identical groups, exact ½ for disjoint halves") {
    import spark.implicits._
    // two groups with identical text → each distribution equals the
    // corpus distribution → TV exactly 0
    val same = Seq(("g1", "a a b"), ("g2", "a a b")).toDF("src", "text")
    val tvSame = TextAnalysis.distributionDrift(same, "src", "text")
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Double]("tv")).toMap
    assert(tvSame("g1") === 0.0 && tvSame("g2") === 0.0)
    // disjoint vocabularies, equal sizes: each group holds exactly half
    // the corpus mass → TV = ½·(⅓+⅙+⅓+⅙) = 0.5, hand-computed
    val disjoint = Seq(("g1", "x x"), ("g2", "y y")).toDF("src", "text")
    val tvD = TextAnalysis.distributionDrift(disjoint, "src", "text")
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Double]("tv")).toMap
    assert(tvD("g1") === 0.5 && tvD("g2") === 0.5)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; bases agree") {
    import spark.implicits._
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val after = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val expected = Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added")
    Seq(true, false).foreach { basis =>
      val got = Dedup.snapshotDiff(before, after, "doc_id", "text",
          md5Basis = basis)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === expected, s"md5Basis=$basis")
    }
  }

  test("semDedup keeps the least-centroid-similar member per dup group") {
    import spark.implicits._
    // hand-built geometry: cell 0 holds dup group {1,2} (cosine ≈ 0.99995)
    // plus the unrelated 3; cell 1 holds singleton 4. v2 sits farther off
    // the c0 axis than v1, so the SemDeDup keep-rule must keep 2 and drop
    // 1 — the OPPOSITE of the lowest-id rule.
    val c0 = Array(1f, 0f)
    val c1 = Array(0f, 1f)
    val emb = Seq(
      (1L, Seq(1f, 0.01f)),
      (2L, Seq(1f, 0.02f)),
      (3L, Seq(0.5f, -0.5f)),
      (4L, Seq(0.01f, 1f))).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(emb, "vec_id", "embedding",
      Array(c0, c1), threshold = 0.9)
    assert(kept.select("vec_id").collect().map(_.getLong(0)).toSet
      === Set(2L, 3L, 4L))
    val byId = kept.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("centroid_id"), r.getAs[Double]("centroid_sim"))).toMap
    assert(byId(2L)._1 === 0 && byId(3L)._1 === 0 && byId(4L)._1 === 1)
    assert(byId(2L)._2 > 0.99 && byId(4L)._2 > 0.99)
  }

  test("semDedup partitions the corpus: one survivor per component, unpaired pass through") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val kept = Similarity.semDedup(emb, "vec_id", "embedding", centroids,
        threshold = 0.3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    val pairs = Similarity.ivfNearDupPairs(emb, "vec_id", "embedding",
      centroids, threshold = 0.3).select($"idA", $"idB")
    val labels = Dedup.clusterLabels(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val paired = labels.map(_._1).toSet
    val nComponents = labels.map(_._2).toSet.size
    assert(pairs.count() > 0)
    // unpaired rows all survive; paired rows yield exactly one per component
    assert((all -- paired).subsetOf(kept))
    assert(kept.size === (all.size - paired.size) + nComponents)
  }

  test("quantizedTopK degenerates to brute force at full rerank; candidates rank sanely") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count().toInt
    // rerank pool = whole corpus → exact re-rank of everything ≡ brute force
    val full = Similarity.quantizedTopK(emb, "vec_id", "embedding", 0L, 10,
        rerankFactor = n)
      .select($"vec_id", $"cosine")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .select($"vec_id", $"cosine")
    assert(full.collect().toSeq === exact.collect().toSeq)
    // default rerank: k rows, exact cosines, quantized scores near exact
    val approx = Similarity.quantizedTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect()
    assert(approx.length === 10)
    approx.foreach { r =>
      assert(math.abs(r.getAs[Double]("cosine_q") - r.getAs[Double]("cosine")) < 0.05)
    }
  }

  test("clusterLabels matches a local union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 50 + trial * 50
      val edges = Seq.fill(n * 2) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // local union-find with union-by-min: each root is its set's minimum
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> find(id.toInt).toLong).toMap
      val got = Dedup.clusterLabels(edges.toDF("idA", "idB")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial (n=$n, edges=${edges.size})")
    }
  }

  test("langId: marker argmax with deterministic first-listed tie-break") {
    import spark.implicits._
    val df = Seq("der und ist text", "the of and text", "nomarkers at all",
      null).toDF("text")
    val out = df.select(TextAnalysis.langId($"text")).collect().map(_.getString(0))
    assert(out(0) === "de")
    assert(out(1) === "en")
    assert(out(2) === "en") // all-zero scores → first listed
    assert(out(3) === null) // null text → null, not the last-listed lang
  }

  test("qualityScore: blank text scores 0.0, below repetitive spam; null stays null") {
    import spark.implicits._
    val df = Seq("", "   ", "buy buy buy buy buy buy buy buy", null)
      .toDF("text")
    val out = df.select(TextAnalysis.qualityScore($"text")).collect()
    assert(out(0).getDouble(0) === 0.0) // empty
    assert(out(1).getDouble(0) === 0.0) // whitespace-only
    // spam: diversity 1/8, stopwords 0, length ok → 0.0625+0+0.2
    assert(math.abs(out(2).getDouble(0) - 0.2625) < 1e-15)
    assert(out(0).getDouble(0) < out(2).getDouble(0)) // blank below spam
    assert(out(3).isNullAt(0))
  }

  test("quality metrics: token count, diversity, avg length") {
    import spark.implicits._
    val df = Seq("aa bb aa").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.distinctTokenRatio($"text"),
      TextAnalysis.avgTokenLength($"text")).head()
    assert(r.getInt(0) === 3)
    assert(math.abs(r.getDouble(1) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12)
  }

  test("redact scrubs emails, IPs, and long numbers; leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      "mail me at jo.doe+x@exa-mple.org now",
      "server 10.0.255.7 port",
      "call +14155550123 or 12345678901",
      "a clean sentence 42").toDF("text")
    val out = df.select(TextAnalysis.redact($"text")).as[String].collect()
    assert(out(0) === "mail me at <EMAIL> now")
    assert(out(1) === "server <IP> port")
    assert(out(2) === "call <NUM> or <NUM>")
    assert(out(3) === "a clean sentence 42")
  }

  test("rolling fingerprint is order-sensitive, md5 fingerprint is not") {
    import spark.implicits._
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val r = df.select(
      TextAnalysis.rollingFingerprint($"x") =!= TextAnalysis.rollingFingerprint($"y"),
      TextAnalysis.contentFingerprint($"x") =!= TextAnalysis.contentFingerprint($"y")).head()
    assert(r.getBoolean(0))
    assert(r.getBoolean(1))
  }
  test("gramStats: repetition counts on a known doc") {
    import spark.implicits._
    // 2-grams of "a b a b c": "a b"×2, "b a"×1, "b c"×1 → n=4, top=2, dup=2
    val df = Seq("a b a b c").toDF("text")
    val r = df.select(TextAnalysis.gramStats($"text", 2)).head().getSeq[Long](0)
    assert(r === Seq(4L, 2L, 2L))
    val frac = df.select(
      TextAnalysis.topGramFraction($"text", 2),
      TextAnalysis.dupGramFraction($"text", 2)).head()
    assert(frac.getDouble(0) === 0.5)
    assert(frac.getDouble(1) === 0.5)
  }

  test("chunkDedup removes later duplicate chunks and reassembles in order") {
    import spark.implicits._
    // k=2 chunks: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [x y]
    val df = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).getAs[String]("dedup_text") === "a b c d")
    assert(out(0).getAs[Long]("n_chunks") === 2L)
    assert(out(0).getAs[Long]("n_kept") === 2L)
    // doc 2 loses "a b" (seen in doc 1); doc 3 loses "x y" (doc 2) entirely
    assert(out(1).getAs[String]("dedup_text") === "x y")
    assert(out(1).getAs[Long]("n_kept") === 1L)
  }

  test("chunkDedup: within-doc repeats keep the first occurrence") {
    import spark.implicits._
    val df = Seq((7L, "a b a b c d")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 2).head()
    assert(out.getAs[String]("dedup_text") === "a b c d")
    assert(out.getAs[Long]("n_chunks") === 3L)
    assert(out.getAs[Long]("n_kept") === 2L)
  }

  test("contaminationScores finds the planted overlap and only it") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "p q r s t u"),          // shares 3-gram "p q r" etc. with bench
      (2L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val bench = Seq((100L, "p q r s extra words")).toDF("doc_id", "text")
    val out = graft.ops.Decontamination.contaminationScores(
      corpus, bench, "doc_id", "text", n = 3).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    // doc 1: 4 shingles, overlap = {"p q r","q r s"} → 2
    assert(out(0).getAs[Long]("n_shingles") === 4L)
    assert(out(0).getAs[Long]("n_overlap") === 2L)
    assert(out(0).getAs[Double]("overlap_frac") === 0.5)
  }

  test("splitLeakage: identical corpus leaks fully, unique corpus not at all") {
    import spark.implicits._
    // identical texts: every test-split doc shares every shingle with
    // the train split → full leakage regardless of which side each id
    // lands on (both splits are non-empty at fraction 0.5 over 40 ids)
    val same = (1L to 40L).map(i => (i, "s1 s2 s3 s4 s5 s6")).toDF("doc_id", "text")
    val leaked = graft.ops.Decontamination.splitLeakage(
      same, "doc_id", "text", testFraction = 0.5, n = 3).collect()
    assert(leaked.nonEmpty)
    leaked.foreach { r =>
      assert(r.getAs[Long]("n_overlap") === r.getAs[Long]("n_shingles"))
      assert(r.getAs[Double]("overlap_frac") === 1.0)
    }
    // globally unique texts: nothing leaks
    val uniq = (1L to 40L).map(i => (i, s"u${i}a u${i}b u${i}c u${i}d u${i}e"))
      .toDF("doc_id", "text")
    assert(graft.ops.Decontamination.splitLeakage(
      uniq, "doc_id", "text", testFraction = 0.5, n = 3).count() === 0L)
  }

  test("curate drops short, repetitive, contaminated and duplicate docs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),   // clean survivor
      (2L, "too short"),                         // fails minTokens
      (3L, "r r r r r r r r r r"),               // all-duplicate 2-grams
      (4L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"),    // contaminated vs bench
      (5L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))    // exact dup of 1
      .toDF("doc_id", "text")
    val bench = Seq((100L, "e1 e2 e3 other words here")).toDF("doc_id", "text")
    val out = graft.ops.Curation.curate(corpus, bench, "doc_id", "text",
      minTokens = 10, maxDupGramFraction = 0.5, contaminationN = 3)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L))
  }

  test("IVF: deterministic centroids, total cell assignment, sane recall") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    assert(cents.length === 8)
    // deterministic: same model twice
    val again = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    assert(cents.map(_.toSeq) === again.map(_.toSeq))

    val assigned = Similarity.ivfAssign(emb, "embedding", cents)
    assert(assigned.where($"centroid_id".isNull).count() === 0)
    assert(assigned.where($"centroid_id" < 0 || $"centroid_id" >= 8).count() === 0)
    assert(assigned.count() === emb.count())

    // probing every cell degenerates to exact brute force
    val all = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, cents,
      nprobe = 8).select($"vec_id")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .select($"vec_id")
    assert(all.collect().map(_.getLong(0)).toSeq ===
      exact.collect().map(_.getLong(0)).toSeq)

    // partial probe returns k rows ordered by cosine desc
    val approx = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, cents,
      nprobe = 2).collect()
    assert(approx.length === 10)
    val sims = approx.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("int8 quantization round-trip error is bounded by scale/2") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val rt = Similarity.dequantizeInt8(
      Similarity.quantizeInt8(emb, "embedding"))
    // the stored scale must BE max|x|/127, recomputed here independently:
    // bounding err only by the implementation's own scale column would
    // pass under arbitrary scale inflation (2x the scale -> 2x the error,
    // bound still "holds")
    val badScale = rt.select($"scale".cast("double").as("s"),
        (array_max(transform($"embedding", x => abs(x.cast("double"))))
          / 127.0).as("e"))
      .where(abs($"s" - $"e") > abs($"e") * 1e-6 + 1e-9)
      .count()
    assert(badScale === 0L)
    val bad = rt.select($"vec_id", $"scale",
        array_max(zip_with($"embedding", $"dequantized",
          (x, d) => abs(x.cast("double") - d.cast("double")))).as("err"))
      .where($"err" > $"scale".cast("double") / 2 + 1e-7)
      .count()
    assert(bad === 0L)
  }

  test("bruteForceTopKBatch matches single-query bruteForceTopK per query") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where($"vec_id".isin(0L, 7L))
    val batch = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 4)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(r => (-r.getDouble(2), r.getLong(1)))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    for (q <- Seq(0L, 7L)) {
      val single = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q) === single, s"query $q")
    }
  }

  test("annTopKBatch matches single-query annTopK per query") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where($"vec_id".isin(0L, 7L))
    val batch = Similarity.annTopKBatch(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 4, planes = 2)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(r => (-r.getDouble(2), r.getLong(1)))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    for (q <- Seq(0L, 7L)) {
      val single = Similarity.annTopK(emb, "vec_id", "embedding", q, 4,
          planes = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch.getOrElse(q, Nil) === single, s"query $q")
    }
  }

  test("ivfTopKBatch matches single-query ivfTopK per query") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val queries = emb.where($"vec_id".isin(0L, 7L))
    val batch = Similarity.ivfTopKBatch(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 4, centroids, nprobe = 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(r => (-r.getDouble(2), r.getLong(1)))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    for (q <- Seq(0L, 7L)) {
      val single = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 4,
          centroids, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch.getOrElse(q, Nil) === single, s"query $q")
    }
  }

  test("recallAtK: exact-vs-exact is 1.0; ANN recall is in (0, 1]") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where($"vec_id" % 10 === 0)
    val exact = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    val self = Similarity.recallAtK(exact, exact, "query_id", "vec_id")
      .collect()
    assert(self.nonEmpty && self.forall(_.getDouble(3) === 1.0))
    val ann = Similarity.annTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, planes = 2)
    val rec = Similarity.recallAtK(ann, exact, "query_id", "vec_id")
      .collect()
    // ground truth drives the join: every query reports, even bucket-empty ones
    assert(rec.length === self.length)
    assert(rec.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // 2 planes = 4 buckets: the bucket restriction must still find most
    // true neighbors on the clustered test vectors
    val mean = rec.map(_.getDouble(3)).sum / rec.length
    assert(mean > 0.3, s"mean ANN recall suspiciously low: $mean")
  }

  test("PQ: codebook shape, guards, and reconstruction error monotone in m") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 7, ksub = 4)
    } // 64 dims don't divide into 7 subspaces
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(emb.where($"vec_id" < 0), "vec_id", "embedding",
        m = 8, ksub = 4)
    } // empty corpus
    val coarse = Similarity.pqCodebooks(emb, "vec_id", "embedding", 1, 16)
    val fine = Similarity.pqCodebooks(emb, "vec_id", "embedding", 8, 16)
    assert(coarse.length === 1 && coarse(0).length === 16 &&
      coarse(0)(0).length === 64)
    assert(fine.length === 8 && fine.forall(_.forall(_.length === 8)))
    def meanErr(cbs: Array[Array[Array[Float]]]) =
      Similarity.pqReconstructionError(emb, "embedding", cbs)
        .head().getDouble(0)
    // same codewords, split into 8 independently-chosen subspaces:
    // strictly more expressive, so reconstruction must improve
    assert(meanErr(fine) < meanErr(coarse),
      s"fine=${meanErr(fine)} coarse=${meanErr(coarse)}")
  }

  test("trainPqCodebooks refines reconstruction without changing shape") {
    val emb = Tables.embeddings(spark, sfDir)
    val init = Similarity.pqCodebooks(emb, "vec_id", "embedding", 8, 8)
    val trained = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      8, 8, iters = 2)
    assert(trained.length === 8 && trained.forall(_.length === 8) &&
      trained.forall(_.forall(_.length === 8)))
    def err(cbs: Array[Array[Array[Float]]]) =
      Similarity.pqReconstructionError(emb, "embedding", cbs)
        .head().getDouble(0)
    // Lloyd's decreases the summed squared error each round; on the
    // hash-sample init over real vectors the improvement is large, so a
    // strict inequality on the mean is safe
    assert(err(trained) < err(init),
      s"trained=${err(trained)} init=${err(init)}")
  }

  test("sampled trainPqCodebooks refines reconstruction over the FULL corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    val init = Similarity.pqCodebooks(emb, "vec_id", "embedding", 8, 8)
    val trained = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      8, 8, iters = 2, sampleFraction = 0.5)
    // shape survives sampling (no ragged codebook from a thin sample)
    assert(trained.length === 8 && trained.forall(_.length === 8) &&
      trained.forall(_.forall(_.length === 8)))
    def err(cbs: Array[Array[Array[Float]]]) =
      Similarity.pqReconstructionError(emb, "embedding", cbs)
        .head().getDouble(0)
    // quality is judged on the full corpus, not the training sample: a
    // codebook is a statistical summary, so half the rows carry the
    // same subspace geometry and still beat the untrained hash seed
    assert(err(trained) < err(init),
      s"trained=${err(trained)} init=${err(init)}")
    // deterministic hash sample -> reproducible model
    val again = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      8, 8, iters = 2, sampleFraction = 0.5)
    assert(trained.map(_.map(_.toSeq).toSeq).toSeq ===
      again.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("pqAdcTopKBatch: k-bounded, self-excluded, recall tracks the IVF arm") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where($"vec_id" % 100 === 0)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", 8, 16)
    val ann = Similarity.pqAdcTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, cbs, centroids, nprobe = 4)
    val rows = ann.collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.nonEmpty && perQ.values.forall(_.length <= 5))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self hit")
    // candidates only from probed cells: every hit shares a cell with
    // one of its query's nprobe probes
    val exact = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
    val rec = Similarity.recallAtK(ann, exact, "query_id", "vec_id")
      .collect()
    assert(rec.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    val mean = rec.map(_.getDouble(3)).sum / rec.length
    // 8 codes of 16 hash-sampled codewords is a coarse quantizer, but
    // the exact re-rank of the ADC top-20 must still recover a solid
    // share of the true top-5 inside the 4-of-16 probed cells (measured
    // ~0.4 on the sf0.01 twin of this fixture via the DuckDB prototype)
    assert(mean > 0.2, s"mean IVFADC recall suspiciously low: $mean")
  }

  test("pqAdcTopKBatch degrades gracefully on empty query sets and null vectors") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", 8, 8)
    // zero queries → zero rows, no crash (probes/toDF on an empty
    // driver-side seq, empty broadcast join)
    val none = Similarity.pqAdcTopKBatch(emb, "vec_id", "embedding",
      emb.where($"vec_id" < 0), "vec_id", "embedding", k = 3, cbs,
      centroids, nprobe = 2)
    assert(none.count() === 0)
    // a null corpus vector gets null codes AND a null cell id, so it
    // silently drops from candidacy instead of crashing the fold
    val withNull = emb.limit(50).select($"vec_id", $"embedding")
      .union(Seq((-1L, null.asInstanceOf[Seq[Float]]))
        .toDF("vec_id", "embedding"))
    val got = Similarity.pqAdcTopKBatch(withNull, "vec_id", "embedding",
        emb.where($"vec_id" === 0), "vec_id", "embedding", k = 5, cbs,
        centroids, nprobe = 8)
      .collect()
    assert(got.nonEmpty)
    assert(!got.exists(_.getLong(1) === -1L), "null-vector row surfaced")
    // a ZERO-NORM corpus vector has no defined cosine: vnorm=0 would make
    // adc_cosine ±Inf/NaN, and both Spark and DuckDB sort NaN above every
    // real value in a descending window — unguarded, the degenerate
    // vector outranks every genuine candidate in BOTH stages. Pinned: it
    // is excluded from candidacy, and no NaN/Inf score ever surfaces.
    val withZero = emb.limit(50).select($"vec_id", $"embedding")
      .union(Seq((-2L, Seq.fill(64)(0f))).toDF("vec_id", "embedding"))
    val gz = Similarity.pqAdcTopKBatch(withZero, "vec_id", "embedding",
        emb.where($"vec_id" === 0), "vec_id", "embedding", k = 5, cbs,
        centroids, nprobe = 8)
      .collect()
    assert(gz.nonEmpty)
    assert(!gz.exists(_.getLong(1) === -2L), "zero-norm row surfaced")
    assert(gz.forall(r => java.lang.Double.isFinite(r.getDouble(2)) &&
      java.lang.Double.isFinite(r.getDouble(3))), gz.mkString("\n"))
    // a zero-norm QUERY contributes no probe rows (its ranking is 0/0
    // against everything): zero result rows for it, none for NaN reasons
    val zq = Seq((999999L, Seq.fill(64)(0f))).toDF("vec_id", "embedding")
    val gq = Similarity.pqAdcTopKBatch(emb, "vec_id", "embedding",
      zq, "vec_id", "embedding", k = 5, cbs, centroids, nprobe = 8)
    assert(gq.count() === 0)
  }

  test("stored-codes IVFADC serve matches inline on random corpora (parquet round-trip)") {
    import spark.implicits._
    // the LayoutsSpec fixture pins ONE shape (64-dim, bucketed table);
    // this trial loop varies dim/m/corpus under a plain parquet
    // round-trip — the claim is that pqAdcTopKBatchWithCodes is the
    // same arithmetic as the inline encode on ANY well-formed model,
    // with the zero-norm exclusion holding on both paths
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val m = Seq(2, 4)(rnd.nextInt(2))
      val dim = m * (1 + rnd.nextInt(3))
      val n = 60 + rnd.nextInt(40)
      val vecs = (0 until n).map(i =>
        (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
      val emb = (vecs :+ ((n + 1000L, Seq.fill(dim)(0f))))
        .toDF("vec_id", "embedding")
      val queries = emb.where($"vec_id" % 7 === 0 && $"vec_id" < n)
      val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 4)
      val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", m, 8)
      val dir = java.nio.file.Files.createTempDirectory("graft-pq-prop")
      Similarity.pqEncode(Similarity.ivfAssign(emb, "embedding", centroids),
          "embedding", cbs)
        .select($"vec_id", $"pq_code", $"vnorm", $"centroid_id")
        .write.mode("overwrite").parquet(dir.toString)
      val stored = spark.read.parquet(dir.toString)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val inline = Similarity.pqAdcTopKBatch(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 3, cbs, centroids, nprobe = 2)
      val viaStore = Similarity.pqAdcTopKBatchWithCodes(emb, stored,
        "vec_id", "embedding", queries, "vec_id", "embedding", k = 3,
        cbs, centroids, nprobe = 2)
      val (ri, rs) = (rows(inline), rows(viaStore))
      assert(rs === ri, s"trial $trial dim=$dim m=$m n=$n")
      assert(ri.nonEmpty, s"trial $trial produced no rows")
      assert(!ri.exists(_._2 == n + 1000L), "zero-norm row surfaced")
      import java.nio.file.Files
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }

  test("gopherReport computes the rule battery on hand-built documents") {
    import spark.implicits._
    val df = Seq(
      // 6 words, all alpha, "the"+"of" stopwords, no symbols → keep
      (1L, "the cat sat of the mat"),
      // symbol-heavy: 2 '#' + one '...' over 5 words ('#' is a word too)
      (2L, "ok # then # fine..."),
      // numeric words: alpha fraction 1/3 < 0.8
      (3L, "123 456 abc")).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        graft.ops.TextAnalysis.gopherReport($"text", minWords = 2,
          minMeanWordLen = 1.0, minDistinctStopwords = 2).as("g"))
      .orderBy($"doc_id")
      .select($"doc_id", $"g.*")
      .collect()
    val r1 = out(0)
    assert(r1.getLong(1) === 6L)                       // n_words
    assert(math.abs(r1.getDouble(2) - 17.0 / 6) < 1e-12) // mean word len
    assert(r1.getDouble(3) === 0.0)                    // symbol ratio
    assert(r1.getDouble(4) === 1.0)                    // alpha fraction
    assert(r1.getLong(5) === 2L && r1.getBoolean(6))   // the, of → keep
    val r2 = out(1)
    assert(r2.getLong(1) === 5L)
    assert(math.abs(r2.getDouble(3) - 3.0 / 5) < 1e-12)
    assert(!r2.getBoolean(6))
    val r3 = out(2)
    assert(math.abs(r3.getDouble(4) - 1.0 / 3) < 1e-12)
    assert(!r3.getBoolean(6))
  }

  test("intraDocChunkDedup matches a Scala reference on random token streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Seq("a", "b", "c", "d")
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(25) // incl. 0-token edge
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val k = 3
    def model(text: String): (Long, Long, String) = {
      val toks = text.trim.split(" +").toSeq // "" → Seq("")
      val chunks = toks.grouped(k).map(_.mkString(" ")).toSeq
      val kept = chunks.zipWithIndex
        .filter { case (c, i) => chunks.indexOf(c) == i }.map(_._1)
      (chunks.size.toLong, kept.size.toLong, kept.mkString(" "))
    }
    val got = graft.ops.Dedup
      .intraDocChunkDedup(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === model(text), s"doc $id: '$text'")
    }
  }

  test("gopherReport matches a Scala model on random documents") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Seq("the", "be", "cat", "dog", "a", "123", "#", "x...", "…", "longword")
    val docs = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def model(text: String) = {
      val toks = text.trim.split(" +").toSeq
      val n = toks.size
      val meanLen = text.replace(" ", "").length.toDouble / n
      val sym = (text.count(_ == '#') +
        ("""\.\.\.""".r.findAllIn(text).length) +
        text.count(_ == '…')).toDouble / n
      val alpha = toks.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toDouble / n
      val stop = toks.distinct
        .count(Set("the", "be", "to", "of", "and", "that", "have", "with"))
      (n.toLong, meanLen, sym, alpha, stop.toLong)
    }
    val got = spark.createDataFrame(docs).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.gopherReport(col("text")).as("g"))
      .select(col("doc_id"), col("g.*")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === model(text), s"doc $id: '$text'")
    }
  }

  test("diverseSample caps dense cells and keeps sparse cells whole") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val out = Similarity.diverseSample(emb, "vec_id", "embedding",
      numCentroids = 8, perCell = 10)
    val perCell = out.groupBy(col("centroid_id")).count()
      .collect().map(r => r.getLong(1))
    assert(perCell.nonEmpty, "empty sample satisfies any cap vacuously")
    assert(perCell.forall(_ <= 10), perCell.mkString(","))
    // the cap must actually BITE: 500 vectors over 8 cells means dense
    // cells exist, so at least one cell holds exactly perCell members
    // and the sample is a strict subset of the corpus
    assert(perCell.max === 10L, perCell.mkString(","))
    assert(out.count() < emb.count())
    // determinism: the same call selects the same ids
    val a = out.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val b = Similarity.diverseSample(emb, "vec_id", "embedding", 8, 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(a === b)
    // a cell with fewer members than the cap survives whole: cap above
    // the corpus size keeps everything
    val all = Similarity.diverseSample(emb, "vec_id", "embedding", 8, 100000)
    assert(all.count() === emb.count())
  }

  test("redactVerbatim removes needle spans longest-first, deterministically") {
    import spark.implicits._
    import graft.ops.Decontamination
    val needles = Seq("secret question body", "secret question")
      .toDF("needle")
    val docs = Seq(
      // the longer needle wins its span first; the shorter then has no match
      (1L, "intro secret question body outro"),
      // only the shorter needle present
      (2L, "intro secret question outro"),
      (3L, "untouched document text")).toDF("doc_id", "text")
    val out = Decontamination.redactVerbatim(docs, needles, "doc_id",
        "text", "needle", minChars = 5)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    assert(out(0) === ((1L, 2L, "intro   outro", 19L)))
    assert(out(1) === ((2L, 1L, "intro   outro", 14L)))
    assert(out(2) === ((3L, 0L, "untouched document text", 0L)))
    // empty needle set (nothing survives minChars): every doc passes
    // through untouched with n_hits 0 — the AC gate must not reject an
    // empty automaton
    val none = Decontamination.redactVerbatim(docs,
        Seq("shrt").toDF("needle"), "doc_id", "text", "needle",
        minChars = 10)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(none.toSeq === Seq((0L, 0L), (0L, 0L), (0L, 0L)))
  }

  test("redactVerbatim fold order matches the engine sort on non-BMP needles") {
    import spark.implicits._
    import graft.ops.Decontamination
    // STRADDLING needles: the astral needle is 10 code points but 19
    // UTF-16 units; the BMP needle is 17 code points / 17 units. The
    // engines' code-point order folds the BMP needle FIRST (17 > 10);
    // an ordering derived from Java's UTF-16 `length` would fold the
    // astral needle first (19 > 17) — and because the two occurrences
    // OVERLAP at the shared "Z", the two orders produce different
    // clean_text, so a regression here must fail this assertion (the
    // round-7 self-review class; a disjoint-needle doc could not
    // observe fold order at all).
    val astral = "𝔞" * 9 + "Z"         // 10 code points / 19 UTF-16 units
    val bmp    = "Zabcdefghijklmnop"   // 17 code points / 17 units
    val text   = s"w ${"𝔞" * 9}Zabcdefghijklmnop y" // needles overlap at Z
    val needles = Seq(astral, bmp).toDF("needle")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Decontamination.redactVerbatim(docs, needles, "doc_id",
        "text", "needle", minChars = 10)
      .collect().map(r => (r.getLong(1), r.getString(2))).head
    // model: BMP (17 cp) folds first, consuming the shared Z, so the
    // astral needle no longer matches; the wrong order leaves the BMP
    // tail intact instead
    val model = text.replace(bmp, " ").replace(astral, " ")
    assert(model !== text.replace(astral, " ").replace(bmp, " "),
      "needles must overlap for fold order to be observable")
    assert(got === ((2L, model)))
  }

  test("redactVerbatim matches needles against the ORIGINAL text only") {
    import spark.implicits._
    import graft.ops.Decontamination
    // the semantics pin (round 9): "a b" is NOT a substring of the
    // original text, but replacing "QQQ" with a space MATERIALIZES it
    // ("aQQQb" → "a b"). The fold runs over the original-text match set
    // only, so the materialized needle survives — a fold over the full
    // needle array (the pre-round-9 form) would redact it to " " and
    // fail here. Both needles are 3 chars; UTF-8 order folds "QQQ"
    // ('Q' < 'a') first, so the full-array fold would observably cascade.
    val docs = Seq((1L, "aQQQb")).toDF("doc_id", "text")
    val needles = Seq("QQQ", "a b").toDF("needle")
    val out = Decontamination.redactVerbatim(docs, needles, "doc_id",
        "text", "needle", minChars = 3)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).head
    assert(out === ((1L, "a b", 2L)))
  }

  test("embeddingQa counts dimension, zero-vector and unit-norm violations") {
    import spark.implicits._
    val df = Seq(
      (1L, 0, Array(1f, 0f, 0f)),          // unit, dim ok
      (2L, 0, Array(0f, 0f, 0f)),          // zero vector
      (3L, 0, Array(2f, 0f, 0f)),          // dim ok, not unit
      (4L, 1, Array(0.6f, 0.8f, 0f)),      // unit
      (5L, 1, Array(1f, 0f))               // wrong dimension (still unit)
    ).toDF("vec_id", "label", "embedding")
    val out = graft.ops.Similarity.embeddingQa(df, "embedding", "label",
        expectedDim = 3)
      .orderBy($"label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq((0, 3L, 3L, 1L, 1L), (1, 2L, 1L, 0L, 2L)))
  }

  test("prefixDupGroups reports only shared k-token ledes") {
    import spark.implicits._
    val df = Seq(
      (1L, "breaking news about x and more body"),
      (2L, "breaking news about x and other continuation"),
      (3L, "breaking news about y and more"), // differs within the prefix
      (4L, "completely different text here now")).toDF("doc_id", "text")
    val out = Dedup.prefixDupGroups(df, "doc_id", "text", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("breaking news about x and", 2L, 1L)))
  }

  test("boilerplateShingles flags template phrases per source only") {
    import spark.implicits._
    val df = Seq(
      (1L, "A", "foo bar x y"),
      (2L, "A", "foo bar z w"),
      (3L, "A", "foo bar q r"),
      (4L, "A", "nothing shared here"),
      // same phrase in another source, but below ITS fraction gate
      (5L, "B", "foo bar once"),
      (6L, "B", "unrelated text one"),
      (7L, "B", "unrelated text two")).toDF("doc_id", "source", "text")
    val out = Dedup.boilerplateShingles(df, "doc_id", "text", "source",
        n = 2, minFraction = 0.6)
      .orderBy($"source", $"shingle")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // A: "foo bar" in 3/4 docs clears 0.6; B's lone "foo bar" (1/3)
    // does not, while B's "unrelated text" (2/3) does — the gate is
    // per-source, so the same phrase passes in one source and not another
    assert(out.toSeq === Seq(
      ("A", "foo bar", 3L, 0.75),
      ("B", "unrelated text", 2L, 2.0 / 3)))
  }

  test("groupContentOverlap: exact shingle and fingerprint Jaccard per pair") {
    import spark.implicits._
    val df = Seq(
      (1L, "A", "x y z w"),  // shingles {x y z, y z w}
      (2L, "B", "x y z q"),  // shingles {x y z, y z q}
      (3L, "C", "a b c"),    // shingles {a b c}
      (4L, "A", "same text here"),
      (5L, "C", "same text here")).toDF("doc_id", "source", "text")
    val sh = Dedup.groupContentOverlap(df, "text", "source", Some(3))
      .orderBy($"source_a", $"source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // A = {x y z, y z w, same text here} (3), B = {x y z, y z q} (2),
    // C = {a b c, same text here} (2); A∩B = {x y z}, A∩C = {same text here}
    assert(sh.toSeq === Seq(
      ("A", "B", 1L, 3L, 2L, 1.0 / 4),
      ("A", "C", 1L, 3L, 2L, 1.0 / 4)))
    // whole-document fingerprints: only docs 4/5 share content
    val fp = Dedup.groupContentOverlap(df, "text", "source", None).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(fp.toSeq === Seq(("A", "C", 1L, 2L, 2L, 1.0 / 3)))
  }

  test("semanticContamination: max cosine, argmax tie-break, threshold flag") {
    import spark.implicits._
    import graft.ops.Decontamination
    // eval 100 = x-axis, eval 200 = y-axis; corpus 1 is a paraphrase of
    // eval 100 (same direction), corpus 2 sits at 45° (EQUAL cosine to
    // both evals → tie resolves to the smaller eval id), corpus 3 is
    // orthogonal-ish negative
    val evalSet = Seq(
      (100L, Array(1f, 0f)),
      (200L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(2f, 0f)),
      (2L, Array(3f, 3f)),
      (3L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val out = Decontamination.semanticContamination(corpus, evalSet,
        "vec_id", "embedding", "vec_id", "embedding", threshold = 0.9)
      .orderBy($"vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getBoolean(3)))
    assert(out(0)._1 === 1L && math.abs(out(0)._2 - 1.0) < 1e-12)
    assert(out(0)._3 === 100L && out(0)._4)
    // 45°: cos = 1/sqrt(2) to both — tie goes to eval 100, below 0.9
    assert(out(1)._3 === 100L)
    assert(math.abs(out(1)._2 - 1.0 / math.sqrt(2)) < 1e-12)
    assert(!out(1)._4)
    // (-1,0): cos −1 vs eval 100, 0 vs eval 200 → max 0 from eval 200
    assert(out(2)._2 === 0.0 && out(2)._3 === 200L && !out(2)._4)
  }

  test("containmentPairs: subset doc scores 1.0, partial overlap gated") {
    import spark.implicits._
    // doc 2's 3-gram set {a b c, b c d} ⊂ doc 1's; doc 3 shares exactly
    // one shingle with doc 1 (of its own 4 → containment 0.25 < 0.5);
    // doc 4 shares nothing
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d"),
      (3L, "d e f g h i"),
      (4L, "x y z w v")).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text",
        n = 3, minContainment = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.length === 1)
    val (ida, idb, na, nb, shared, cont) = out.head
    assert((ida, idb) === (1L, 2L))
    assert(na === 4 && nb === 2 && shared === 2 && cont === 1.0)
    // lowering the gate admits the 1-shared pair at 1/4
    val loose = Dedup.containmentPairs(df, "doc_id", "text",
        n = 3, minContainment = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
    assert(loose === Set((1L, 2L, 1.0), (1L, 3L, 0.25)))
  }

  test("containmentPairs finds low-jaccard contained quotes minhash misses") {
    import spark.implicits._
    // a long doc quoting a short one verbatim: Jaccard ≈ |A|/|B| is far
    // below any near-dup threshold, containment of the quote is 1.0
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val quote = (20 to 25).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, long), (2L, quote)).toDF("doc_id", "text")
    val mh = Dedup.minhashNearDups(df, "doc_id", "text", threshold = 0.9)
    assert(mh.count() === 0)
    val cp = Dedup.containmentPairs(df, "doc_id", "text",
      n = 3, minContainment = 0.9)
    val row = cp.head()
    assert((row.getLong(0), row.getLong(1), row.getDouble(5)) === (1L, 2L, 1.0))
  }

  test("contaminationBySuite attributes overlap to the right suite only") {
    import spark.implicits._
    import graft.ops.Decontamination
    val bench = Seq(
      ("mmlu", "alpha beta gamma delta"),
      ("gsm", "one two three four")).toDF("suite", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma epsilon zeta"), // leaks mmlu's 3-gram only
      (2L, "one two three five six"),        // leaks gsm only
      (3L, "clean text with nothing shared here")).toDF("doc_id", "text")
    val out = Decontamination.contaminationBySuite(corpus, bench,
        "doc_id", "text", "suite", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.toSet === Set((1L, "mmlu", 1L), (2L, "gsm", 1L)))
  }

  test("contaminationScoresBloom: never under-counts, ≡ exact at low fpp") {
    import graft.ops.Decontamination
    val corpus = docs.where(col("doc_id") % 97 =!= 0)
    val bench = docs.where(col("doc_id") % 97 === 0)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_overlap")).toMap
    val exact = toMap(Decontamination.contaminationScores(
      corpus, bench, "doc_id", "text", n = 3))
    assert(exact.nonEmpty)
    // fpp small enough that no false positive lands in this corpus →
    // the screen IS the exact gate
    val low = toMap(Decontamination.contaminationScoresBloom(
      corpus, bench, "doc_id", "text", n = 3))
    assert(low === exact)
    // adversarial fpp = 0.5: wild over-flagging allowed, but NEVER a
    // missed contaminated doc and never an under-count on a flagged one
    val stressed = toMap(Decontamination.contaminationScoresBloom(
      corpus, bench, "doc_id", "text", n = 3,
      expectedItems = 100L, fpp = 0.5))
    exact.foreach { case (id, n) =>
      assert(stressed.contains(id), s"doc $id lost by the screen")
      assert(stressed(id) >= n, s"doc $id under-counted")
    }
  }

  test("verbatimMatchesMulti is id-type generic and null-text safe, ≡ verbatimMatches") {
    import spark.implicits._
    import graft.ops.Decontamination
    // string/UUID ids + a null-text row: the exact twin's `contains`
    // yields unknown on null (row dropped); the AC path must match
    val corpus = Seq(
      ("uuid-aa", "the quick brown fox jumps over the lazy dog tonight"),
      ("uuid-bb", null),
      ("uuid-cc", "nothing from any benchmark appears here at all today"))
      .toDF("doc_id", "text")
    val needles = Seq("brown fox jumps over", "absent needle phrase")
      .toDF("needle")
    def got(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val exact = got(Decontamination.verbatimMatches(
      corpus, needles, "doc_id", "text", "needle"))
    val multi = got(Decontamination.verbatimMatchesMulti(
      corpus, needles, "doc_id", "text", "needle"))
    assert(exact === Set(("uuid-aa", "brown fox jumps over")))
    assert(multi === exact)
  }

  test("semanticContamination: a zero-norm eval vector cannot flag the corpus") {
    import spark.implicits._
    import graft.ops.Decontamination
    // eval 999 is all-zero (the silent failed-encoder case): its cosine
    // is NaN against everything and NaN sorts above all doubles — it
    // must be excluded or it wins every max and flags the whole corpus
    val evalSet = Seq(
      (100L, Array(1f, 0f)),
      (999L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(2f, 0f)),
      (2L, Array(0f, 5f)),
      (3L, Array(0f, 0f))). // degenerate CORPUS vector: never contaminated
      toDF("vec_id", "embedding")
    val out = Decontamination.semanticContamination(corpus, evalSet,
        "vec_id", "embedding", "vec_id", "embedding", threshold = 0.9)
      .orderBy($"vec_id").collect()
    assert(out(0).getDouble(1) === 1.0 && out(0).getLong(2) === 100L
      && out(0).getBoolean(3))
    assert(out(1).getDouble(1) === 0.0 && !out(1).getBoolean(3))
    assert(out(2).getDouble(1).isNaN && !out(2).getBoolean(3))
  }

  test("ivfTopKBatch is query-id-type generic (string ids survive)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8)
    val queries = emb.where($"vec_id".isin(0L, 7L))
      .select(concat(lit("q-"), $"vec_id").as("qid"), $"embedding")
    val got = Similarity.ivfTopKBatch(emb, "vec_id", "embedding",
        queries, "qid", "embedding", k = 4, centroids, nprobe = 3)
      .collect()
    assert(got.nonEmpty)
    assert(got.map(_.getString(0)).toSet === Set("q-0", "q-7"))
  }

  test("graft vector functions reject non-array inputs with a typed error, not a CCE") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(("x", Array(1f, 2f))).toDF("s", "v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_cosine(s, v)")).collect()
    }
    assert(e.getMessage.contains("array<float> or array<double>"),
      e.getMessage)
  }

  test("contaminationScoresBloom is id-type generic (string ids survive)") {
    import spark.implicits._
    import graft.ops.Decontamination
    // a hard cast("long") here used to silently null string/UUID ids
    val corpus = Seq(
      ("uuid-aa", "alpha beta gamma delta epsilon zeta"),
      ("uuid-bb", "totally unrelated words nothing shared here"))
      .toDF("doc_id", "text")
    val bench = Seq(("b1", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Decontamination.contaminationScoresBloom(
      corpus, bench, "doc_id", "text", n = 3).collect()
    assert(out.map(_.getAs[String]("doc_id")).toSet === Set("uuid-aa"))
    assert(out.head.getAs[Long]("n_overlap") === 4L)
  }

  test("bandingFor: meets the recall target, prefers low junk, matches closed form") {
    def collide(j: Double, r: Int, b: Int): Double =
      1.0 - math.pow(1.0 - math.pow(j, r), b)
    val (n, b, r, rec, junk) = Dedup.bandingFor(
      threshold = 0.95, targetRecall = 0.95, backgroundJ = 0.3,
      maxHashes = 64)
    assert(n === b * r && n <= 64)
    assert(rec === collide(0.95, r, b) && rec >= 0.95)
    assert(junk === collide(0.3, r, b))
    // exhaustive optimality: no admissible geometry has lower junk
    for (rr <- 1 to 64; bb <- 1 to 64 / rr
         if collide(0.95, rr, bb) >= 0.95) {
      assert(collide(0.3, rr, bb) >= junk ||
        (collide(0.3, rr, bb) == junk && rr * bb >= n))
    }
    // the round-3 lesson quantified: the advisor's junk rate is far
    // below the 8x2 geometry's ~53% at the same recall
    assert(junk < 0.05)
    assert(collide(0.3, 2, 8) > 0.5)
  }

  test("exactSubstrDedup removes shifted copies and self-repetition") {
    import spark.implicits._
    // doc 2 embeds doc 1's tokens at a SHIFTED alignment (chunk-aligned
    // dedup would miss it); doc 3 repeats its own 5-gram
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e f g h z"),
      (3L, "p q r s t u p q r s t")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrDedup(df, "doc_id", "text", k = 5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 is globally first: untouched
    assert(out(0) === ((1L, 8L, 0L, "a b c d e f g h")))
    // doc 2: windows over a..h repeat doc 1's → tokens a..h covered
    assert(out(1) === ((2L, 11L, 8L, "x y z")))
    // doc 3: "q r s t u"(pos1) survives; the repeat of "p q r s t" at
    // pos 6 covers tokens 6..10
    assert(out(2)._3 === 5L)
    assert(out(2)._4 === "p q r s t u")
  }

  test("exactSubstrDedup matches a Scala model on random documents") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vocab = Seq("a", "b", "c")
    val k = 4
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(14)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def model(id: Long, all: Seq[(Long, String)]): (Long, Long, String) = {
      def tk(s: String) = s.trim.split(" +").toSeq // "" → Seq("")
      val grams = all.flatMap { case (d, t) =>
        tk(t).sliding(k).filter(_.size == k).zipWithIndex
          .map { case (g, p) => (g.mkString(" "), d, p) }
      }
      val first = grams.groupBy(_._1).map { case (g, occ) =>
        g -> occ.map(o => (o._2, o._3)).min
      }
      val toks = tk(all.find(_._1 == id).get._2)
      val cov = toks.sliding(k).filter(_.size == k).zipWithIndex.flatMap {
        case (g, p) =>
          if (first(g.mkString(" ")) != ((id, p))) (p until p + k) else Nil
      }.toSet
      val kept = toks.zipWithIndex.collect { case (t, i) if !cov(i) => t }
      (toks.size.toLong, cov.size.toLong, kept.mkString(" "))
    }
    val got = Dedup.exactSubstrDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === model(id, docs), s"doc $id: '$text'")
    }
    // the xxhash64 production basis groups the same equal-window
    // classes (collisions negligible at test size) → identical results
    val fast = Dedup.exactSubstrDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", k, md5Basis = false)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(fast === got)
  }

  test("exactSubstrDedup maxGroup drops over-cap fingerprints whole, " +
      "accounted, never partially") {
    import spark.implicits._
    // "v1 v2 v3 v4 v5" is viral: verbatim in 6 docs (fingerprint group
    // of 6 > cap 5); "c1 c2 c3 c4 c5" is an honest copy in 2 docs
    // (group of 2 ≤ cap). Unique u<i> tails keep the docs distinct.
    val df = ((1 to 6).map(i => (i.toLong, s"v1 v2 v3 v4 v5 u$i")) ++
      Seq((7L, "c1 c2 c3 c4 c5 s7"), (8L, "c1 c2 c3 c4 c5 s8")))
      .toDF("doc_id", "text")
    graft.ops.CapMetrics.reset()
    val out = Dedup.exactSubstrDedup(df, "doc_id", "text", k = 5,
        maxGroup = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // over-cap viral group: dropped WHOLE — every copy survives
    // untouched, including copies 2..6 (a partial drop would have
    // removed some); the honest 2-doc copy still dedups normally
    (1 to 6).foreach { i =>
      assert(out(i.toLong) === ((0L, s"v1 v2 v3 v4 v5 u$i")))
    }
    assert(out(7L) === ((0L, "c1 c2 c3 c4 c5 s7")))
    assert(out(8L) === ((5L, "s8")))
    // the drop is accounted: 1 group, its 6 member window rows
    val (g, r) = graft.ops.CapMetrics.dropsFor("exact_substr_fp")
    assert(g === 1L && r === 6L)
    // cap ≥ group size ⇒ identical to the uncapped operator (the
    // q138/q138b oracle-scale contract: the default cap changes nothing)
    val capped = Dedup.exactSubstrDedup(df, "doc_id", "text", k = 5,
      maxGroup = 6).collect().map(_.toSeq).toSet
    val uncapped = Dedup.exactSubstrDedup(df, "doc_id", "text", k = 5,
      maxGroup = Int.MaxValue).collect().map(_.toSeq).toSet
    assert(capped === uncapped)
    assert(capped.exists(_(0) == 1L))
    // the r13 DEFAULT (finite cap riding the first-occurrence window)
    // is value-identical to the explicit uncapped opt-out whenever no
    // group exceeds it — the q138/q138b oracle-scale contract
    val default = Dedup.exactSubstrDedup(df, "doc_id", "text", k = 5)
      .collect().map(_.toSeq).toSet
    assert(default === uncapped)
  }

  test("dupShingleFraction: exact shared-shingle density, short docs absent") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"),   // shingles {abc, bcd}; abc shared with doc 2
      (2L, "a b c"),     // {abc} — fully shared
      (3L, "x y z w"),   // {xyz, yzw} — fully unique
      (4L, "a b")).toDF("doc_id", "text") // < 3 tokens → no row
    val out = Dedup.dupShingleFraction(df, "doc_id", "text", n = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 1L, 1L, 1.0),
      (3L, 2L, 0L, 0.0)))
  }

  test("containmentPairs matches a Scala set model on random documents") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Seq("a", "b", "c", "d", "e")
    val docs = (0 until 80).map { i =>
      val n = rnd.nextInt(12) // incl. sub-n-token docs
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def sgl(text: String): Set[String] = {
      val t = text.trim.split(" +").toSeq.filter(_.nonEmpty)
      t.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val model = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = sgl(ta); sb = sgl(tb) if sa.nonEmpty && sb.nonEmpty
      shared = (sa & sb).size
      cont = shared.toDouble / math.min(sa.size, sb.size)
      if cont >= 0.5
    } yield (ia, ib) -> ((sa.size, sb.size, shared, cont))).toMap
    val got = graft.ops.Dedup
      .containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, minContainment = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4).toInt, r.getDouble(5))))
      .toMap
    assert(got === model)
  }

  test("knnGraph edges are exactly the bucket-collision top-k (reference planes)") {
    import spark.implicits._
    // deterministic subset (limit() row choice is partition-order
    // dependent across the test's separate actions)
    val emb = Tables.embeddings(spark, sfDir).where($"vec_id" < 120)
    val k = 3
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k,
        planesPerBand = 4, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(g.nonEmpty)
    // rebuild the bucket-collision candidate set from the REFERENCE
    // plane construction and check every edge (a) collides in some
    // band, (b) carries the true cosine, (c) ranks correctly per id
    // band b of graft_lsh_bands(vec, 4, 2) uses global planes b*4..b*4+3
    val buckets = emb.select($"vec_id",
        Similarity.signLshBucketReference($"embedding", 4, 0).as("b0"),
        Similarity.signLshBucketReference($"embedding", 4, 4).as("b1"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val collide = (x: Long, y: Long) =>
      buckets(x)._1 == buckets(y)._1 || buckets(x)._2 == buckets(y)._2
    g.foreach { case (id, nb, c, _) =>
      assert(collide(id, nb), s"$id-$nb share no bucket")
      assert(math.abs(cos(vecs(id), vecs(nb)) - c) < 1e-9)
    }
    // per-id: result = top-k of ALL bucket-mates by (cosine desc, id)
    g.groupBy(_._1).foreach { case (id, rows) =>
      val mates = vecs.keys.filter(o => o != id && collide(id, o))
      val want = mates.toSeq
        .map(o => (o, cos(vecs(id), vecs(o))))
        .sortBy { case (o, c) => (-c, o) }.take(k).map(_._1)
      assert(rows.sortBy(_._4).map(_._2).toSeq === want, s"id $id")
    }
  }

  test("lshRecallAudit: exact duplicates give recall 1, counts consistent") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark query engine fast scan join"),
      (2L, "spark query engine fast scan join"),
      (3L, "completely different words entirely here now"),
      (4L, "another unrelated set of tokens again")).toDF("doc_id", "text")
    val row = Dedup.lshRecallAudit(df, "doc_id", "text", threshold = 0.95)
      .head()
    val (truth, cands, det) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // the only >= 0.95 pair is the identical one, and identical docs
    // collide in every band — LSH cannot miss them
    assert(truth === 1L && det === 1L)
    assert(det <= cands)
    assert(row.getDouble(3) === 1.0)
    assert(row.getDouble(4) === det.toDouble / cands)
  }

  test("lshRecallAudit on real docs: detected = truth ∩ candidates") {
    val row = Dedup.lshRecallAudit(docs, "doc_id", "text",
      threshold = 0.95, numHashes = 16, bands = 4).head()
    val (truth, cands, det) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(truth > 0)
    // det > 0 is the anti-zero pin: the fixture plants exact dup pairs
    // (J = 1), which collide in EVERY band — an LSH regression that
    // detects nothing would otherwise pass every inequality below
    assert(det > 0)
    assert(det <= truth && det <= cands)
    // recall here restates det/truth (computed in the same query), so
    // it is a consistency check, not an independent oracle
    assert(row.getDouble(3) === det.toDouble / truth)
  }

  test("langConfusion: declared-vs-predicted cells with exact shares") {
    import spark.implicits._
    val df = Seq(
      ("en", "the cat sat"),         // en markers → en
      ("en", "der hund und die"),    // de markers under an en label
      ("en", "the dog and the"),     // en
      ("de", "der und ist")).toDF("lang", "text")
    val out = graft.ops.TextAnalysis.langConfusion(df, "lang", "text")
      .orderBy($"lang", $"pred_lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("de", "de", 1L, 1.0),
      ("en", "de", 1L, 1.0 / 3),
      ("en", "en", 2L, 2.0 / 3)))
  }

  test("dimensionProfile flags dead and imbalanced dimensions") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0f, 1f, 100f)),
      (2L, Array(0f, -2f, 50f)),
      (3L, Array(0f, 3f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.dimensionProfile(emb, "embedding")
      .orderBy($"dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1, 3L, 3L, 0.0, 0.0),      // dead dimension: all zero
      (2, 3L, 0L, -2.0, 3.0),
      (3, 3L, 1L, 0.0, 100.0)))   // 50x the others' range
  }

  test("knnGraph: identical vectors are rank-1 neighbors, k respected") {
    import spark.implicits._
    val base = Array.tabulate(8)(i => math.cos(i * 0.7).toFloat)
    val near = base.zipWithIndex.map { case (v, i) =>
      v + (if (i == 0) 0.01f else 0f) }
    val vecs = Seq(
      (1L, base), (2L, base), (3L, near),
      (4L, base.map(-_))).toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 2,
        planesPerBand = 2, bands = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byId = g.groupBy(_._1)
    // identical vectors share every bucket; cosine ≈ 1 ranks first
    // (ties to the lower neighbor id; dot/(|a||b|) rounds within 1 ulp)
    val r1 = byId(1L).head
    assert((r1._1, r1._2, r1._4) === ((1L, 2L, 1)))
    assert(math.abs(r1._3 - 1.0) < 1e-12)
    val r2 = byId(2L).head
    assert((r2._1, r2._2, r2._4) === ((2L, 1L, 1)))
    assert(math.abs(r2._3 - 1.0) < 1e-12)
    // ranks are 1..k with no gaps, never exceeding k
    byId.values.foreach { rows =>
      assert(rows.map(_._4).sorted.sameElements(1 to rows.length))
      assert(rows.length <= 2)
    }
  }
}
