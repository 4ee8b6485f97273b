package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.ops.{Dedup, TextAnalysis}

/** Custom codegen expressions (graft.functions): each must be
  * bit-identical to the interpreted higher-order-function formulation it
  * replaced, across eval paths and edge shapes.
  */
class FunctionsSpec extends SparkSuite {

  private def emb = Tables.embeddings(spark, sfDir)

  test("graft_dot / graft_norm / graft_cosine match the aggregate(zip_with) folds") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // the replaced formulations, inlined as the ground truth
    def oldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def oldNorm(a: org.apache.spark.sql.Column) =
      sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

    val pairs = emb.limit(40).select($"vec_id", $"embedding".as("a"))
      .crossJoin(emb.limit(40).select($"embedding".as("b")))
    val bad = pairs.select(
        call_function("graft_dot", $"a", $"b").as("nd"),
        oldDot($"a", $"b").as("od"),
        call_function("graft_norm", $"a").as("nn"),
        oldNorm($"a").as("on"),
        call_function("graft_cosine", $"a", $"b").as("nc"),
        (oldDot($"a", $"b") / (oldNorm($"a") * oldNorm($"b"))).as("oc"))
      // null-safe <=> throughout this suite: with =!=, a kernel
      // regressing to all-NULL output made every comparison NULL, the
      // rows vanished from the filter, and "bit-identical" passed
      .where(!($"nd" <=> $"od") || !($"nn" <=> $"on") || !($"nc" <=> $"oc"))
      .count()
    assert(bad === 0)
  }

  test("graft_minhash matches min over xxhash64(token, k) exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val toks = Tables.documents(spark, sfDir).limit(50)
      .select($"doc_id", Dedup.tokenSet($"text").as("t"))
    val k = 8
    val old = transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform($"t", x => xxhash64(x, s))))
    val bad = toks.select(
        Dedup.minhashSignature($"t", k).as("nw"), old.as("od"))
      .where(!($"nw" <=> $"od")).count()
    assert(bad === 0)
  }

  test("graft_simhash64 is the bit-majority of token hashes") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 3 tokens: majority per bit across their xxhash64 values
    val df = Seq(Seq("alpha", "beta", "gamma")).toDF("t")
    val expected = df.select(
      transform($"t", x => xxhash64(x)).as("hs")).select(
      aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) => {
        val votes = aggregate($"hs", lit(0),
          (v, h) => v + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1)
            .otherwise(-1))
        acc + when(votes > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
      }).as("s")).as[Long].head()
    val got = df.select(Dedup.simhash64($"t").as("s")).as[Long].head()
    assert(got === expected)
  }

  test("null inputs propagate as null; empty arrays are defined") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(3.0f, 4.0f)))).toDF("a", "b")
    val rows = df.select(
      call_function("graft_dot", $"a", $"b").as("d"),
      call_function("graft_norm", $"a").as("n")).collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))

    val empty = Seq(Seq.empty[String]).toDF("t")
      .select(Dedup.simhash64($"t").as("s"),
        Dedup.minhashSignature($"t", 4).as("m")).collect().head
    assert(empty.getLong(0) === 0L)
    assert(empty.getSeq[Long](1) === Seq.fill(4)(Long.MaxValue))
  }

  test("graft_jaccard matches size(intersect)/size(union) on set inputs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir).limit(60)
      .select($"doc_id", Dedup.tokenSet($"text").as("t"))
    val pairs = d.select($"t".as("a"))
      .crossJoin(d.select($"t".as("b")))
    val bad = pairs.select(
        Dedup.jaccard($"a", $"b").as("nw"),
        (size(array_intersect($"a", $"b")).cast("double")
          / size(array_union($"a", $"b"))).as("od"))
      .where(!($"nw" <=> $"od")).count()
    assert(bad === 0)
    // disjoint and empty edges
    val edge = Seq(
      (Seq("x", "y"), Seq("a", "b")),
      (Seq("x"), Seq.empty[String])).toDF("a", "b")
      .select(Dedup.jaccard($"a", $"b").as("j")).as[Double].collect()
    assert(edge === Array(0.0, 0.0))
  }

  test("graft_shingles matches distinct slice+concat shingling") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sfDir)
      .select(TextAnalysis.tokens($"text").as("t"))
    val n = 3
    val old = when(size($"t") >= n,
      array_distinct(transform(sequence(lit(1), size($"t") - (n - 1)),
        i => concat_ws(" ", slice($"t", i, lit(n))))))
      .otherwise(array().cast("array<string>"))
    val bad = d.select(
        call_function("graft_shingles", $"t", lit(n)).as("nw"), old.as("od"))
      .where(!($"nw" <=> $"od")).count()
    assert(bad === 0)
    // shorter than n → empty
    val short = Seq(Seq("a", "b")).toDF("t")
      .select(call_function("graft_shingles", $"t", lit(3)).as("s"))
      .collect().head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("graft_lsh_bucket matches the md5-HOF reference formulation bit-for-bit") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val bad = emb.select(
        call_function("graft_lsh_bucket", $"embedding", lit(6)).as("nw"),
        graft.ops.Similarity.signLshBucketReference($"embedding", 6).as("od"))
      .where(!($"nw" <=> $"od")).count()
    assert(bad === 0)
  }

  test("graft_lsh_bands: every band key matches the per-band reference") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val pp = 4
    val bands = 3
    val withBands = emb.limit(200).select($"embedding",
      call_function("graft_lsh_bands", $"embedding", lit(pp), lit(bands)).as("ks"))
    (0 until bands).foreach { b =>
      val bad = withBands.select(
          element_at($"ks", b + 1).as("nw"),
          graft.ops.Similarity.signLshBucketReference($"embedding", pp, b * pp).as("od"))
        .where(!($"nw" <=> $"od")).count()
      assert(bad === 0, s"band $b mismatch")
    }
    // single band degenerates to the bucket expression
    val one = emb.limit(50).select(
        element_at(call_function("graft_lsh_bands", $"embedding", lit(5), lit(1)), 1).as("a"),
        call_function("graft_lsh_bucket", $"embedding", lit(5)).as("b"))
      .where(!($"a" <=> $"b")).count()
    assert(one === 0)
  }

  test("graft_bpe_apply matches the driver-side sequential merge reference") {
    import spark.implicits._
    import graft.ops.Vocab
    GraftFunctions.register(spark)
    // a merge table with chained and overlapping shapes: later merges
    // consume earlier merge outputs; (a,a) exercises non-overlap rules
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
      ("a", "a"), ("t", "h"), ("th", "e"))
    val words = Seq("newest", "lowest", "low", "aaaa", "aaab", "the",
      "thethe", "x", "", "estest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val kernel = docs.select(
        Vocab.segmentTokens(graft.ops.TextAnalysis.tokens($"text"), merges)
          .as("segs"))
      .head().getSeq[String](0)
    val reference = words.filter(_.nonEmpty)
      .flatMap(w => Vocab.bpeSegment(w, merges))
    assert(kernel === reference)
    // the lowest-rank-first loop really compresses: "aaaa" → ["aa","aa"]
    assert(Vocab.bpeSegment("aaaa", merges) === Seq("aa", "aa"))
  }

  test("graft_cosine_q matches cosine over the dequantized HOF reference bit-for-bit") {
    import spark.implicits._
    import graft.ops.Similarity
    GraftFunctions.register(spark)
    val qz = Similarity.quantizeInt8(emb.limit(50), "embedding")
    val query = emb.where($"vec_id" === 0).select($"embedding".as("__q"))
    // reference: dequantize via interpreted HOF, then the proven cosine kernel
    val deq = transform($"qvec", b => b.cast("double") * $"scale".cast("double"))
    val bad = qz.crossJoin(broadcast(query))
      .select(
        Similarity.quantizedCosine($"qvec", $"scale", $"__q").as("fused"),
        Similarity.cosine(deq, $"__q".cast("array<double>")).as("ref"))
      .where(!($"fused" <=> $"ref"))
      .count()
    assert(bad === 0)
  }

  test("graft_minhash_md5 matches min over conv(md5(j:token)) exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val toks = Tables.documents(spark, sfDir).limit(50)
      .select($"doc_id", Dedup.tokenSet($"text").as("t"))
    val k = 6
    val old = transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform($"t", x =>
        conv(substring(md5(encode(concat(j.cast("string"), lit(":"), x), "UTF-8")), 1, 15),
          16, 10).cast("long"))))
    val bad = toks.select(
        call_function("graft_minhash_md5", $"t", lit(k)).as("nw"), old.as("od"))
      .where(!($"nw" <=> $"od")).count()
    assert(bad === 0)
  }

  test("graft_simhash_md5 is the bit-majority of md5 token hashes") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 64-bit md5 token hash rebuilt from two 32-bit conv halves (conv of
    // 16 hex chars would overflow signed long); shiftleft wraps exactly
    val df = Tables.documents(spark, sfDir).limit(30)
      .select(Dedup.tokenSet($"text").as("t"))
    val hashes = transform($"t", x => {
      val hex = md5(encode(x, "UTF-8"))
      shiftleft(conv(substring(hex, 1, 8), 16, 10).cast("long"), 32)
        .bitwiseOR(conv(substring(hex, 9, 8), 16, 10).cast("long"))
    })
    val expected = aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) => {
      val votes = aggregate(hashes, lit(0),
        (v, h) => v + when(call_function("shiftrightunsigned", h, b)
          .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      acc + when(votes > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
    })
    val bad = df.select(
        call_function("graft_simhash_md5", $"t").as("nw"), expected.as("od"))
      .where(!($"nw" <=> $"od")).count()
    assert(bad === 0)
  }

  test("graft_ac_count matches the per-needle contains model on real docs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // needles drawn from the corpus itself so hits actually occur
    val needles = docs.where($"doc_id" % 11 === 0)
      .select(substring($"text", 10, 40).as("n"))
      .where(length($"n") >= 20)
      .distinct().as[String].collect().sorted
    val needleArr = typedLit(needles.toSeq)
    val bad = docs.select(
        call_function("graft_ac_count", $"text", needleArr).as("ac"),
        size(filter(needleArr, n => $"text".contains(n))).as("model"))
      .where(!($"ac" <=> $"model")).count()
    assert(bad === 0)
    // and hits exist, so the equivalence is not vacuous
    val hits = docs.select(
      call_function("graft_ac_count", $"text", needleArr).as("ac"))
      .where($"ac" > 0).count()
    assert(hits > 0)
  }

  test("graft_ac_matches ≡ filter(needles, contains) in array order on real docs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val needles = docs.where($"doc_id" % 11 === 0)
      .select(substring($"text", 10, 40).as("n"))
      .where(length($"n") >= 20)
      .distinct().as[String].collect().sorted
    val needleArr = typedLit(needles.toSeq)
    // exact ARRAY equality (not set equality): the contract is the
    // matched subset in needle-array order — the redaction fold's
    // pinned order depends on it
    val bad = docs.select(
        call_function("graft_ac_matches", $"text", needleArr).as("ac"),
        filter(needleArr, n => $"text".contains(n)).as("model"))
      .where(!($"ac" <=> $"model")).count()
    assert(bad === 0)
    val hits = docs.select(
        call_function("graft_ac_matches", $"text", needleArr).as("ac"))
      .where(size($"ac") > 0).count()
    assert(hits > 0)
  }

  test("graft_pq_encode matches the per-subspace L2-argmin HOF reference") {
    import spark.implicits._
    import graft.ops.Similarity
    GraftFunctions.register(spark)
    val (m, ksub, dsub) = (8, 16, 8)
    val cbs = Similarity.pqCodebooks(emb, "vec_id", "embedding", m, ksub)
    assert(cbs.length === m && cbs.forall(_.length === ksub) &&
      cbs.forall(_.forall(_.length === dsub)))
    val cbsLit = typedLit(cbs.map(_.map(_.toSeq).toSeq).toSeq)
    // interpreted ground truth: per subspace, sqrt of the sequential
    // squared-diff fold per codeword, argmin via first-position-of-min
    // (ties to the LOWER code, like the kernel)
    def ref(v: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(m - 1)), j => {
        val sub = slice(v, j * dsub + 1, lit(dsub))
        val dists = transform(element_at(cbsLit, j + 1), cw =>
          sqrt(aggregate(
            zip_with(sub, cw, (x, y) =>
              (x.cast("double") - y.cast("double")) *
                (x.cast("double") - y.cast("double"))),
            lit(0.0), (acc, e) => acc + e)))
        (array_position(dists, array_min(dists)) - 1).cast("int")
      })
    val bad = emb.select(
        call_function("graft_pq_encode", $"embedding", cbsLit).as("nw"),
        ref($"embedding").as("od"))
      .where(!($"nw" <=> $"od")).count()
    assert(bad === 0)
    // null in → null out; the codes column never exceeds its codebook
    val row = spark.range(1)
      .select(call_function("graft_pq_encode",
        lit(null).cast("array<float>"), cbsLit).as("c"))
      .head()
    assert(row.isNullAt(0))
    val maxCode = emb
      .select(array_max(call_function("graft_pq_encode", $"embedding", cbsLit))
        .as("mx")).agg(max($"mx")).head().getInt(0)
    assert(maxCode < ksub)
  }

  test("size prefilter does not change blockedJaccardPairs results") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val got = Dedup.blockedJaccardPairs(docs, "doc_id", "text", "lang", 0.95)
    // unfiltered ground truth, computed inline
    val t = docs.select($"lang", $"doc_id", Dedup.tokenSet($"text").as("toks"))
    val a = t.select($"lang", $"doc_id".as("idA"), $"toks".as("ta"))
    val b = t.select($"lang", $"doc_id".as("idB"), $"toks".as("tb"))
    val exp = a.join(b, Seq("lang")).where($"idA" < $"idB")
      .select($"idA", $"idB", Dedup.jaccard($"ta", $"tb").as("jaccard"))
      .where($"jaccard" >= 0.95)
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }
}
