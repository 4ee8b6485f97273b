package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Hash sampling: deterministic, proportional, monotone, and exhaustive
  * splits — the properties seeded RNG sampling cannot give across
  * cluster layouts.
  */
class SamplingSpec extends SparkSuite {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("shuffleDeterministic: layout-invariant order, salts give distinct permutations") {
    val a = Sampling.shuffleDeterministic(docs.select("doc_id"), "doc_id", "e0")
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.shuffleDeterministic(
        docs.select("doc_id").repartition(7), "doc_id", "e0")
      .collect().map(_.getLong(0)).toSeq
    assert(a === b)                       // same salt → same epoch order, any layout
    assert(a.sorted !== a)                // actually permuted, not id order
    val c = Sampling.shuffleDeterministic(docs.select("doc_id"), "doc_id", "e1")
      .collect().map(_.getLong(0)).toSeq
    assert(c !== a)                       // fresh salt → fresh permutation
    assert(c.sorted === a.sorted)         // same membership
  }

  test("md5Bucket matches an independent MessageDigest recomputation") {
    import spark.implicits._
    // md5Bucket is the basis of hashSample/hashSplit/datasetRelease's
    // sample rule; every other test re-derives expectations THROUGH it,
    // so this is the one independent pin of the bucket space (1e6) and
    // the salt:key hash basis
    def expected(id: Long, salt: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000L
    }
    val keys = Seq(0L, 1L, 42L, 999999L, 123456789L)
    val got = keys.toDF("id")
      .select($"id", Sampling.md5Bucket($"id", "release").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach(k => assert(got(k) === expected(k, "release"), s"key $k"))
  }

  test("hashSample is deterministic and approximately proportional") {
    val s1 = Sampling.hashSample(docs, "doc_id", 0.3)
    // LAYOUT invariance is the named property (seeded-RNG sampling
    // can't give it): compare against a different partitioning, not a
    // byte-identical second plan, which a spark_partition_id()-keyed
    // implementation would also satisfy
    val s2 = Sampling.hashSample(docs.repartition(7), "doc_id", 0.3)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val n = docs.count().toDouble
    val k = s1.count().toDouble
    assert(math.abs(k / n - 0.3) < 0.1, s"got ${k / n}")
  }

  test("nested fractions are monotone subsets; salts decorrelate") {
    val small = Sampling.hashSample(docs, "doc_id", 0.1)
    val big = Sampling.hashSample(docs, "doc_id", 0.5)
    assert(small.exceptAll(big).isEmpty) // 10% ⊆ 50% at same salt
    val other = Sampling.hashSample(docs, "doc_id", 0.1, salt = 7)
    // different salt → a genuinely different (overlapping-by-chance) draw
    assert(other.exceptAll(small).count() > 0)
  }

  test("temperatureMix flattens shares toward p^alpha without upsampling") {
    import spark.implicits._
    // head group 800, tails 150 and 50: natural shares .8/.15/.05
    val df = ((1L to 800L).map(i => (i, "big")) ++
      (1001L to 1150L).map(i => (i, "mid")) ++
      (2001L to 2050L).map(i => (i, "small")))
      .toDF("id", "grp")
    val out = Sampling.temperatureMix(df, "grp", "id", alpha = 0.5)
    val got = out.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // downsample-only: no group exceeds its input, the binding group
    // (the one with max n/q ratio advantage — a tail) keeps everything
    assert(got("small") === 50L)
    assert(got("mid") <= 150L && got("big") <= 800L)
    // flattened: the head's share shrinks vs natural, the tail's grows
    val total = got.values.sum.toDouble
    assert(got("big") / total < 0.8)
    assert(got("small") / total > 0.05)
    // expected shares q_g ∝ sqrt(p_g); realized counts follow rate_g·n_g
    // within hash-sampling noise
    val q = Map("big" -> math.sqrt(0.8), "mid" -> math.sqrt(0.15),
      "small" -> math.sqrt(0.05))
    val qn = q.view.mapValues(_ / q.values.sum).toMap
    val s = Map("big" -> 800.0, "mid" -> 150.0, "small" -> 50.0)
    val scale = s.map { case (g, n) => n / qn(g) }.min
    s.keys.foreach { g =>
      val expect = math.min(1.0, qn(g) * scale / s(g)) * s(g)
      assert(math.abs(got(g) - expect) <= 0.15 * expect + 5,
        s"$g: got ${got(g)}, expect ~$expect")
    }
    // deterministic: identical membership on re-run
    assert(out.select("id").collect().map(_.getLong(0)).toSet ===
      Sampling.temperatureMix(df, "grp", "id", alpha = 0.5)
        .select("id").collect().map(_.getLong(0)).toSet)
  }

  test("hashSplit is disjoint, exhaustive, and roughly weighted") {
    import spark.implicits._
    val split = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1))
    assert(split.count() === docs.count())
    val counts = split.groupBy($"split").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set(0, 1, 2))
    val n = docs.count().toDouble
    assert(math.abs(counts(0) / n - 0.8) < 0.1)
    // same key always lands in the same split — ON ANY LAYOUT (a
    // partition-id-keyed split would pass a same-plan re-run)
    val again = Sampling.hashSplit(docs.repartition(7), "doc_id",
      Seq(0.8, 0.1, 0.1))
    val disagree = split.select($"doc_id", $"split")
      .join(again.select($"doc_id", $"split".as("s2")), "doc_id")
      .where($"split" =!= $"s2").count()
    assert(disagree === 0)
  }

  test("curriculumOrder: correct bands, md5 order within bands, layout-invariant") {
    import spark.implicits._
    val scored = Seq(
      (1L, 0.95), (2L, 0.91), (3L, 0.8), (4L, 0.75), (5L, 0.3), (6L, 0.9))
      .toDF("doc_id", "quality")
    val out = Sampling.curriculumOrder(scored, "doc_id", $"quality",
        cutoffs = Seq(0.9, 0.5), salt = "e0")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band")))
    assert(out.toMap === Map(1L -> 0, 2L -> 0, 6L -> 0, 3L -> 1, 4L -> 1, 5L -> 2))
    // emitted sequence is band-sorted, and each band internally follows
    // the deterministic shuffle (same salt on a different layout agrees)
    assert(out.map(_._2).toSeq === out.map(_._2).toSeq.sorted)
    // the WITHIN-band order is the salted md5 one, recomputed here
    // independently — an implementation that sorted bands by doc_id
    // passed every other assertion
    def saltedMd5(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"e0:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val band0 = out.filter(_._2 == 0).map(_._1).toSeq
    assert(band0 === Seq(1L, 2L, 6L).sortBy(id => (saltedMd5(id), id)),
      band0.toString)
    val again = Sampling.curriculumOrder(scored.repartition(5), "doc_id",
        $"quality", cutoffs = Seq(0.9, 0.5), salt = "e0")
      .collect().map(r => r.getAs[Long]("doc_id")).toSeq
    assert(again === out.map(_._1).toSeq)
  }

  test("importanceWeights: feature accounting and target-domain ordering") {
    import spark.implicits._
    // target model trained on the "alpha beta" dialect: the doc written
    // in it must out-weigh the disjoint-vocabulary doc
    val raw = Seq(
      (1L, "alpha beta alpha"),
      (2L, "zeta eta theta")).toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val w = Sampling.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // 3 tokens → 3 unigram + 2 bigram features, occurrence-counted
    assert(w(1L).getAs[Long]("n_features") === 5L)
    assert(w(2L).getAs[Long]("n_features") === 5L)
    assert(w(1L).getAs[Double]("logw") > w(2L).getAs[Double]("logw"))
    // doc 2 shares nothing with the target model (no hash collision at
    // B=10000 for 5 vs 4 features is overwhelmingly likely — and
    // target_hits pins it exactly either way)
    assert(w(2L).getAs[java.math.BigDecimal]("target_hits").longValueExact === 0L)
    assert(w(1L).getAs[java.math.BigDecimal]("target_hits").longValueExact > 0L)
  }

  test("importanceTake tilts the selection toward the target domain") {
    import spark.implicits._
    val en = docs.where($"lang" === "en")
    val top = Sampling.importanceTake(docs, en, "doc_id", "text", k = 50)
    assert(top.count() === 50)
    val enIds = en.select("doc_id").collect().map(_.getLong(0)).toSet
    val topEn = top.select("doc_id").collect().map(_.getLong(0))
      .count(enIds.contains)
    val baseRate = enIds.size.toDouble / docs.count()
    // the English share of the selection must beat the corpus base rate
    assert(topEn.toDouble / 50 > baseRate + 0.05,
      s"selected $topEn/50 en docs vs base rate $baseRate")
    // and the robust form: mean importance weight of English docs beats
    // the rest (the model was fit on exactly that slice)
    val mw = Sampling.importanceWeights(docs, en, "doc_id", "text")
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy(($"lang" === "en").as("is_en"))
      .agg(avg($"logw").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(mw(true) > mw(false),
      s"mean logw en=${mw(true)} rest=${mw(false)}")
  }

  test("importanceTakeRanked ranks exactly importanceTake's selection order") {
    import spark.implicits._
    val en = docs.where($"lang" === "en")
    val viaTake = Sampling.importanceTake(docs, en, "doc_id", "text", k = 20)
      .orderBy($"logw_sum".desc, $"doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val ranked = Sampling.importanceTakeRanked(docs, en, "doc_id", "text",
      k = 20)
    assert(ranked.columns.toSeq ===
      Seq("rank", "doc_id", "n_features", "target_hits", "raw_hits"))
    val byRank = ranked.orderBy($"rank").collect()
    assert(byRank.map(_.getInt(0)).toSeq === (1 to 20))
    assert(byRank.map(_.getLong(1)).toSeq === viaTake)
  }

  test("graft_ngram_buckets kernel equals the built-in md5 expression chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the exact chain hashedNgramBuckets shipped before r15 — the
    // oracle-checkable definition the kernel must reproduce bit-for-bit
    def chain(textCol: String, buckets: Int) = {
      val t = graft.ops.TextAnalysis.tokens(col(textCol))
      val n1 = greatest(size(t) - 1, lit(0))
      val bi = zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
        (a, b) => concat(lit("b:"), a, lit(" "), b))
      val feats = concat(transform(t, x => concat(lit("u:"), x)), bi)
      transform(feats, f =>
        pmod(conv(substring(md5(encode(f, "UTF-8")), 1, 15), 16, 10)
          .cast("long"), lit(buckets.toLong)))
    }
    // corpus texts + edge shapes (empty string -> one "" token and no
    // bigram; single token; repeated tokens; unicode)
    val edge = Seq("", "one", "a a a", "héllo wörld méh").toDF("text")
      .withColumn("doc_id", lit(-1L))
    val all = docs.select($"doc_id", $"text")
      .unionByName(edge.select($"doc_id", $"text"))
    val cmp = all.select(
        Sampling.hashedNgramBuckets("text", 10000).as("kern"),
        chain("text", 10000).as("chain"))
      .where(not($"kern" <=> $"chain"))
    assert(cmp.count() === 0L)
  }
}
