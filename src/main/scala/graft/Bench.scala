package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query executes to completion through the `noop` sink (full plan
  * runs, every row materialized — unlike count(), which lets Catalyst
  * prune work the query would really do). Warmup: every table is
  * touched, then each query runs once at the smallest scale factor so
  * codegen compilation and JIT warm on identical generated code before
  * the timed target-scale run.
  */
object Bench {

  /** 3-decimal timing format: 74+ queries must fit in the driver's 4 KiB
    * stdout tail capture WITH the scale object (9-decimal doubles
    * overflowed it twice; millisecond precision is already below local
    * JVM noise).
    */
  private[graft] def fmt(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      .underlying.stripTrailingZeros.toPlainString

  private def escape(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Structural JSON-object sanity for a string about to be spliced
    * verbatim into the bench line: starts with `{`, every brace/bracket
    * outside string literals balances, strings close, depth returns to
    * zero exactly at the end. Not a full parser (no dependency allowed)
    * but rejects every truncation/concatenation corruption mode.
    */
  private[graft] def jsonObjectish(s: String): Boolean = {
    if (!s.startsWith("{")) return false
    var depth = 0; var inStr = false; var esc = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1; if (depth == 0 && i != s.length - 1) return false
        case _ => ()
      }
      if (depth < 0) return false
      i += 1
    }
    depth == 0 && !inStr
  }

  /** Machine-epoch probe: a fixed synthetic workload timed each run, so
    * cross-round comparisons can tell "the code got slower" from "the
    * HOST got slower" — round 9 adjudicated r8's one claimed regression
    * (q74) as exactly that: the same commit re-run months^W rounds later
    * read 1.6× its recorded time on an identical plan. `st_sec` is a
    * single-thread multiply-rotate mix over a fixed count; `mt_sec`
    * runs one such mix per available core simultaneously (scheduler +
    * SMT pressure, the regime bench queries actually run in). The mixed
    * value is folded into the JSON (`h`) so the loop cannot be
    * dead-code-eliminated. Compare runs via the st ratio
    * (`check_bench.py compare` prints it when both lines carry it).
    */
  private def mix(iters: Long, seed: Long): Long = {
    var h = seed ^ 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) {
      h = java.lang.Long.rotateLeft(h ^ (i * 0xff51afd7ed558ccdL), 31) *
        0x4cf5ad432745937fL
      i += 1
    }
    h
  }

  /** Cheap single-thread load stamp (~15 ms unloaded) taken at every
    * pass boundary: NOT the cross-round epoch calibration (that is
    * [[machineProbe]], 100× longer) but a time-LOCAL sample — if the
    * host was loaded while a pass started, its stamp reads high, and
    * `check_bench.py anomaly` cross-references elevated stamps with
    * the per-pass query times. The result is folded into a volatile
    * sink so the loop can't be dead-code-eliminated.
    */
  @volatile private var probeSink = 0L
  private def loadProbe(): Double = {
    val t0 = System.nanoTime()
    probeSink ^= mix(10000000L, t0)
    (System.nanoTime() - t0) / 1e9
  }

  private def machineProbe(): String = {
    mix(5000000L, 1) // JIT warm
    val t0 = System.nanoTime()
    val h1 = mix(100000000L, 2)
    val st = (System.nanoTime() - t0) / 1e9
    val n = Runtime.getRuntime.availableProcessors()
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val threads = (0 until n).map { k =>
      new Thread(() => { acc.addAndGet(mix(100000000L, k + 3)); () })
    }
    val t1 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val mt = (System.nanoTime() - t1) / 1e9
    s""","machine":{"st_sec":${fmt(st)},"mt_sec":${fmt(mt)},"threads":$n,"h":${(h1 ^ acc.get()) & 0xffff}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")

    Tables.names.foreach(n => Tables.load(spark, sfDir, n).write.format("noop")
      .mode("overwrite").save())

    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    val doWarmup = new java.io.File(warmupDir).isDirectory && warmupDir != sfDir
    // dev loop: SPARK_GRAFT_BENCH_FILTER=q52,q67 times only matching
    // queries (substring match); unset = the full driver protocol
    val filters = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filters.isEmpty || filters.exists(n.contains) }
    if (doWarmup) ordered.foreach { case (_, fn) =>
      // warmup failures are ignored here but re-surface in the timed loop
      try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => }
    }

    // best (min) across timed runs per query: local-JVM interference
    // (GC, JIT, a neighboring stage's spill) is strictly additive, so
    // the minimum is the contention-robust estimate of a query's real
    // cost — round 3's median still let a 93-query sweep inflate
    // q65/q66 ~2–3× over their isolated timings (phantom regressions).
    //
    // SUITE-LEVEL INTERLEAVING (round 10): iterations used to run
    // back-to-back per query, so a minutes-long external load spike
    // poisoned EVERY iteration of a contiguous alphabetical block and
    // min-of-3 couldn't filter it (r9: the official record read 208 s
    // for a 117 s engine — q43→q49 ran 8–70× slow in all three
    // consecutive iterations while the once-per-line machine probe,
    // running later, read healthy). Now the FULL suite runs N times and
    // the per-query min is taken ACROSS passes: a time-local spike
    // intersects at most one pass of any query, so the min survives.
    // Each pass boundary is stamped with a cheap load probe and the
    // durable line carries the raw per-pass matrix ("passes") so
    // `check_bench.py anomaly` can flag contiguous-block load windows
    // explicitly instead of them surfacing as phantom regressions.
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // a failed run is NEVER timed as a near-instant success (which would
    // LOWER the total on a regression): it reports -1 and lands in errors
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val raw = scala.collection.mutable.LinkedHashMap(
      ordered.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    val passProbes = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Test hook for the anomaly-detection demonstration (default off):
    // SPARK_GRAFT_SPIKE_PASS=k starts 2×cores busy-spin threads for the
    // whole of pass k — an emulated external load window, perfectly
    // aligned with a pass so the demo is reproducible. The demo's claim
    // is that the reported min is UNAFFECTED and the anomaly is flagged.
    val spikePass = sys.env.get("SPARK_GRAFT_SPIKE_PASS").map(_.toInt)
    // JIT-warm the probe loop before the first stamp: an interpreted/
    // tier-1 first call read ~1.5× the steady state and false-flagged
    // pass 0 as load-suspect in the r10 runA/runB records
    probeSink ^= mix(20000000L, 1)
    for (pass <- 1 to iterations) {
      val burn = new java.util.concurrent.atomic.AtomicBoolean(
        spikePass.contains(pass))
      // 8× cores of busy-spin ≈ the heavy end of a real external window
      // (r9's measured 8–70×): the scheduler gives the bench ~1/9 CPU
      val burners =
        if (!burn.get()) Seq.empty
        else (0 until 8 * Runtime.getRuntime.availableProcessors()).map { k =>
          val t = new Thread(() => {
            var h = k.toLong
            while (burn.get()) h = mix(1000000L, h)
            probeSink ^= h
          })
          t.setDaemon(true); t.start(); t
        }
      // stamp AFTER the hook fires: the stamp samples whatever load the
      // pass actually starts under, emulated or real
      passProbes += loadProbe()
      ordered.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val t =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } catch {
            case scala.util.control.NonFatal(e) =>
              errors.getOrElseUpdate(name,
                Option(e.getMessage).getOrElse(e.getClass.getName).take(160))
              -1.0
          } finally {
            // Library operators deliberately leave small persisted RDDs
            // (CC labels, packing pins) for the ContextCleaner; across a
            // 3×N-query sweep in ONE JVM those accumulate into memory
            // pressure that inflates queries late in lexicographic order
            // (r6: q71 read 6.8 s in the sweep vs 4.6 s focused with an
            // identical plan). Releasing them OUTSIDE the timed window
            // makes each iteration's measurement independent.
            spark.sharedState.cacheManager.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
          }
        raw(name) = raw(name) :+ t
      }
      burn.set(false)
      burners.foreach(_.join(2000))
    }
    passProbes += loadProbe() // closing stamp brackets the last pass
    val results = ordered.map { case (name, _) =>
      val ts = raw(name).filter(_ >= 0).sorted
      (name, if (ts.isEmpty) -1.0 else ts.head, ts)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // per-query [min, median, max] of the iterations: the noise floor a
    // round-over-round diff needs to tell "regressed" from "jittery"
    // (r7 finding: q93/q81 moved >30% with no code cause and the
    // comparison couldn't adjudicate). Full line / durable file only —
    // the driver-parsed compact summary stays small.
    val spreadJson =
      if (iterations < 2) ""
      else results.collect { case (k, _, ts) if ts.nonEmpty =>
        // true median: average the two middles on even counts —
        // ts(size/2) alone is the UPPER middle, which at iters=2
        // degenerates to the max masquerading as a center statistic
        val med =
          if (ts.size % 2 == 1) ts(ts.size / 2)
          else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
        "\"" + k + s"\":[${fmt(ts.head)},${fmt(med)},${fmt(ts.last)}]"
      }.mkString(""","spread":{""", ",", "}")
    // raw per-pass matrix IN PASS ORDER (a failed run is -1) + the pass
    // boundary load stamps: what `check_bench.py anomaly` reads to flag
    // a contiguous alphabetical block running slow in one pass — the
    // transient-host-load signature. Durable full line only.
    val passesJson =
      if (iterations < 2) ""
      else raw.map { case (k, ts) =>
        "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
      }.mkString(""","passes":{""", ",", "}")
    val probesJson =
      s""","pass_probes":[${passProbes.map(fmt).mkString(",")}]"""
    val errJson = errors
      .map { case (q, m) => s"""{"query":"${escape(q)}","error":"${escape(m)}"}""" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val scaleJson = scaleProfile(spark, sfDir)
    val procJson = processorProfile(spark, sfDir)
    // the probe runs AFTER every timed section — queries AND the
    // scale/processor profiles — so its all-core burn cannot
    // heat/throttle into anything it is supposed to calibrate
    val machineJson = machineProbe()
    // bucket/cell cap drops accumulated across the whole bench run
    // (queries + scale profile): a silent cap would read as "covered
    // everything" — here every dropped group/row count is in the JSON
    val capJson = {
      val d = graft.ops.CapMetrics.drops.filter { case (_, (g, r)) => g > 0 || r > 0 }
      if (d.isEmpty) ""
      else d.toSeq.sortBy(_._1).map { case (tag, (g, r)) =>
        s""""${escape(tag)}":{"groups":$g,"rows":$r}"""
      }.mkString(""","cap_drops":{""", ",", "}")
    }
    // RECORDED sf1 evidence (round-8 scale validation): the full-suite
    // sf1 run is ~10× the per-round bench budget, so it runs once per
    // round out-of-band (ScaleData + Bench at testdata/sf1, summarized
    // by tools/check_bench.py growth) and its committed summary rides
    // the live line verbatim, clearly labeled as a recording — the
    // generating commit and method are inside the file.
    val sf1Json = {
      val p = java.nio.file.Path.of("bench_history/sf1_summary.json")
      if (java.nio.file.Files.isRegularFile(p)) {
        val s = java.nio.file.Files.readString(p).trim
        // splice only if structurally valid JSON (balanced braces/
        // brackets outside strings, closed strings): a truncated or
        // hand-edited file would otherwise corrupt the whole machine-
        // parsed bench line — the one contract every tool json.load()s
        if (s.length <= 600 && jsonObjectish(s)) s""","sf1_recorded":$s"""
        else ""
      } else ""
    }
    // "agg"/"iters" label the per-query statistic (min-of-N since round
    // 4; rounds ≤3 reported median-of-3; "interleaved" since round 10:
    // min across suite-level passes, not back-to-back runs) so
    // cross-round comparisons can see the methodology, not read it as
    // an engine speedup
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","agg":"min","iters":$iterations,"interleaved":true,"queries":$qs$spreadJson$passesJson$probesJson,"sf":"$sfDir","errors":$errJson$machineJson$scaleJson$procJson$capJson$sf1Json}"""
    // durable copy (the driver's stdout tail capture is lossy); stdout
    // line stays the contract and is printed LAST
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try java.nio.file.Files.write(java.nio.file.Path.of(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => }
    // The driver records only the last ~2,000 BYTES of stdout (measured:
    // rounds 1-3 all show parsed:null — the full 93-query line is ~2.9 KB
    // and arrives head-truncated). The full line above goes to the durable
    // file and to stdout for humans; the line the driver actually parses
    // is this compact summary, printed LAST and sized ≤1,800 bytes so it
    // survives the tail capture alongside sbt's [success] banner.
    def compact(topN: Int): String = {
      val slow = results.filter(_._2 >= 0).sortBy(-_._2).take(topN)
        .map { case (k, v, _) => "\"" + escape(k) + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val errNames = errors.keys.take(8)
        .map(n => "\"" + escape(n) + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","agg":"min","iters":$iterations,"sf":"$sfDir","n_queries":${results.size},"n_errors":${errors.size},"errors":$errNames,"slowest":$slow,"full":"${escape(outPath)}"}"""
    }
    val summary = (10 to 0 by -2).iterator.map(compact)
      .find(_.length <= 1800).getOrElse(compact(0))
    spark.stop()
    println(line)
    println(summary)
  }

  /** End-to-end enrichment-processor run at the bench scale factor —
    * the S5/T4/K6 surface (url list → slice → fetch with retry →
    * shards + dead letter + cursor) that q45–q47 oracle at sf0.01 but
    * nothing previously timed at scale. The SyntheticFetcher derives
    * outcomes from md5(url) (≈1/256 of urls dead-letter after retries,
    * ≈1/16 retry once with the 50 ms-capped backoff), so the measured
    * number is the pipeline machinery — slicing, mapPartitions fetch
    * loop, observed counters, shard/dead-letter/cursor writes — not
    * network latency. The reference's scrape-bound envelope is
    * <30 s/record; this reports records/sec for the same shape.
    * Disable with SPARK_GRAFT_PROC_BENCH=0.
    */
  private def processorProfile(spark: SparkSession, sfDir: String): String = {
    if (sys.env.getOrElse("SPARK_GRAFT_PROC_BENCH", "1") == "0") return ""
    if (!new java.io.File(s"$sfDir/documents.parquet").exists()) return ""
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-proc").toString
    try {
      // the url list is a driver-built JSON array: bench fixture, not a
      // data path (the processor re-reads it distributed per batch)
      val ids = Tables.documents(spark, sfDir)
        .select("doc_id").collect().map(_.getLong(0))
      val json = ids.map(id => s"""{"url": "http://synth/$id"}""")
        .mkString("[", ",\n", "]")
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"$dir/urls.json"), json)
      val t0 = System.nanoTime()
      val cur = graft.pipeline.Pipelines.processAll(spark, s"$dir/urls.json",
        s"$dir/out", () => new graft.enrich.SyntheticFetcher(),
        batchSize = 2000, cursorPath = s"$dir/cursor.txt",
        totalTarget = ids.length.toLong,
        // the profile measures pipeline machinery (rec/s), not the
        // reference's 1 s origin-politeness sleeps — now that backoffMs
        // is honored (it was silently capped at 50 ms before round 8),
        // keep the bench's retry sleeps out of the measurement
        enrichConfig = graft.enrich.Enricher.Config(backoffMs = 1))
      val sec = (System.nanoTime() - t0) / 1e9
      val rps = if (sec > 0) cur.totalProcessed / sec else -1.0
      s""","processor":{"records":${cur.totalProcessed},"dead":${cur.skippedCount},"failed_attempts":${cur.errorCount},"sec":${fmt(sec)},"rec_per_sec":${fmt(rps)}}"""
    } catch { case scala.util.control.NonFatal(_) =>
      s""","processor":{"records":-1,"sec":-1}"""
    } finally {
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(Path.of(dir)).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case scala.util.control.NonFatal(_) => }
    }
  }

  /** Scale guardrail: replicate documents/embeddings `R`× (deterministic
    * id offsets; per-replica text marker; circularly-shifted vectors,
    * except every 50th vector which stays identical across replicas —
    * planted duplicate cliques, the mass-duplication shape near-dup
    * detection exists for) and time the quadratic ground-truth pair
    * detectors HEAD-TO-HEAD against their bucketed/banded scale paths on
    * the same corpus. Cosine detectors run at the dedup-regime threshold
    * (0.95) — at loose thresholds (the q50 correctness setting) sign-LSH
    * needs coarse bands for recall and stops being the cheap path; the
    * 100 TB question is the tight-threshold one. The measured ratio —
    * exact grows ~R², banded ~R·dup-density — rides in the bench JSON as
    * a "scale" object. Disable with SPARK_GRAFT_SCALE_BENCH=0; replicas
    * via SPARK_GRAFT_SCALE_REPLICAS (default 20).
    *
    * Reading the numbers: on a 32-core single node the quadratic
    * detectors stay competitive up to ~10⁴ rows because a broadcast
    * nested-loop over codegen'd kernels has near-zero per-pair overhead;
    * the banded paths pay fixed stage/shuffle latency but grow with the
    * data (times the duplicate density, which R× replication itself
    * inflates: every replica pair duplicates the marked docs), not with
    * its square — the growth column, not the absolute time, is what
    * extrapolates to a 10⁸-row shard on a cluster.
    */
  private def scaleProfile(spark: SparkSession, sfDir: String): String = {
    if (sys.env.getOrElse("SPARK_GRAFT_SCALE_BENCH", "1") == "0") return ""
    if (!new java.io.File(s"$sfDir/documents.parquet").exists()) return ""
    import org.apache.spark.sql.functions._
    val r = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPLICAS", "20").toInt
    // dev loop: SPARK_GRAFT_SCALE_FILTER=minhash,streaming times only
    // matching cases (substring, like SPARK_GRAFT_BENCH_FILTER); the
    // driver's per-round run leaves it unset and times everything
    val caseFilters = sys.env.get("SPARK_GRAFT_SCALE_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    def caseWanted(name: String): Boolean =
      caseFilters.isEmpty || caseFilters.exists(name.contains)

    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val docsN = (0 until r).map { k =>
      // 5 replica-distinct marker tokens push cross-replica Jaccard to
      // ~0.86 (< the 0.95 detection threshold); every 50th doc keeps its
      // base text — planted exact-duplicate cliques, like the vectors
      val marked =
        if (k == 0) col("text")
        else concat(col("text"), lit((1 to 5).map(i => s" graftr${k}m$i").mkString))
      docs.select(
        (col("doc_id") + lit(k * 100000000L)).as("doc_id"),
        when(col("doc_id") % 50 === 0, col("text")).otherwise(marked).as("text"),
        col("lang"))
    }.reduce(_ unionByName _)
    val embN = (0 until r).map { k =>
      val s = (k * 7) % 64 // 7 invertible mod 64: all 20 shifts distinct
      val shifted =
        if (s == 0) col("embedding")
        else concat(slice(col("embedding"), s + 1, 64 - s),
          slice(col("embedding"), 1, s))
      emb.select(
        (col("vec_id") + lit(k * 100000000L)).as("vec_id"),
        // every 50th vector is identical in all replicas: planted
        // duplicate cliques for the tight-threshold detectors to find
        when(col("vec_id") % 50 === 0, col("embedding"))
          .otherwise(shifted).as("embedding"))
    }.reduce(_ unionByName _)
    // materialize so the timed plans scan parquet, like every other query
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-scale").toString
    docsN.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    embN.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")

    import graft.ops.{Dedup, Similarity}
    import org.apache.spark.sql.DataFrame
    type Case = (DataFrame, DataFrame) => DataFrame
    val cases: Seq[(String, Case)] = Seq(
      "exact_cosine_pairs" ->
        ((_, ev) => Similarity.cosineNearDupPairs(ev, "vec_id", "embedding", 0.95)),
      "bucketed_cosine_pairs" ->
        ((_, ev) => Similarity.cosineNearDupPairsBucketed(ev, "vec_id", "embedding",
          0.95, planesPerBand = 16, bands = 8)),
      "blocked_jaccard_pairs" ->
        ((dv, _) => Dedup.blockedJaccardPairs(dv, "doc_id", "text", "lang", 0.95)),
      "minhash_pairs" ->
        ((dv, _) => Dedup.minhashNearDups(dv, "doc_id", "text", 0.95)),
      "simhash_banded_pairs" ->
        ((dv, _) => Dedup.simhashNearDupsBanded(dv, "doc_id", "text", maxBits = 3)),
      // ingest shape, INLINE path: a FIXED batch (the base corpus)
      // probes the growing replicated corpus, rebuilding the corpus band
      // keys on every probe — the corpus-proportional term the stored-key
      // twin below removes. Round 4 measured 18.5× growth at 20×; after
      // round 5's distinct-candidate verification (kernels once per
      // candidate doc, never per corpus row) and 16/4 banding the inline
      // growth has measured ~1.3–4.6× across runs vs ~0.9–1.8×
      // stored-key — the steady-state corpus-independence claim, as
      // numbers. Timings are min-ACROSS-PASSES since round 11 (the
      // suite interleaves; see the pass loop below) — rounds 6–10 took
      // min-of-SPARK_GRAFT_SCALE_ITERS back-to-back, which a load
      // window spanning one case's iterations could still poison:
      // single-shot timings swung up to ~3.5× between runs on
      // JIT/GC/page-cache warmth, and the growth RATIOS themselves
      // spread ~2–7× between a focused run and a run following the
      // full query sweep (r6 measured minhash_pairs at 1.4×
      // focused/min-of-3 and 9.7× in-sweep BEFORE the per-case cache
      // release below; 5.5× after). Compare ranges across rounds, not
      // single numbers.
      // 16/4 banding (r=4), not the loose-threshold 16/8 default: at a
      // 0.95 threshold r=2 floods verification with J≈0.3 junk
      // candidates (the SCALE.md band-geometry rule; q67 measured −57%)
      "incremental_neardup_probe" ->
        ((dv, _) => Dedup.incrementalNearDups(docs, dv, "doc_id", "text",
          0.95, numHashes = 16, bands = 4)),
      // rewrite-based dedup: one fingerprint shuffle + dup-coverage
      // explode. The replicated corpus duplicates every base window
      // ~R×, so the covered-token mass is output-proportional — growth
      // ~R is the honest linear answer, vs the pair detectors' R·dup²
      "exact_substr_dedup" ->
        ((dv, _) => Dedup.exactSubstrDedup(dv, "doc_id", "text", k = 20)),
      // the xxhash64 production basis (q138b): same plan, ~8× cheaper
      // per-position fingerprint kernel and 8-byte shuffle keys
      "exact_substr_dedup_xxh64" ->
        ((dv, _) => Dedup.exactSubstrDedup(dv, "doc_id", "text", k = 20,
          md5Basis = false)),
      // the fan-out guardrail, measured on the worst shape this
      // fixture can plant: replicas share every base-text window (the
      // appended markers only perturb tail windows), so fingerprint
      // groups are ~R-sized and maxGroup = 10 drops nearly all of them
      // — since r13 the group count rides the first-occurrence window
      // itself (same WindowExec), so the capped rewrite pays the gram
      // scan + window but neither the hot groups' dup spans nor the
      // covered-span expansion. Pass condition: growth ≈ R (linear in
      // corpus, the rewrite's floor) vs the uncapped twins'
      // dup-mass-inflated 24–42×, with the drops accounted under
      // cap_drops (exact_substr_fp).
      "exact_substr_dedup_capped" ->
        ((dv, _) => Dedup.exactSubstrDedup(dv, "doc_id", "text", k = 20,
          md5Basis = false, maxGroup = 10)))
    // a failed case reports -1, never a bogus partial timing; the cause
    // goes to stderr (never the JSON line) so a -1 is diagnosable from
    // the run log instead of silently reading as "case broken, unknown"
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench-scale] case failed: $e")
        -1.0
      } finally {
        // same hygiene as the headline loop: operators leave small
        // persisted RDDs (CC labels, pins) for the ContextCleaner, and
        // across the scale cases those accumulate into memory pressure
        // that lands on whichever case runs later — measured: the SAME
        // minhash probe read 9.7x growth inside a full 141-query sweep
        // and 1.4x focused, with the x20 leg absorbing the difference.
        // Clearing OUTSIDE the timed window keeps each timing
        // independent of sweep position.
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    // Interleaved min-across-passes (round 11 — the headline loop's
    // round-10 treatment applied here): the old per-case min-of-N ran
    // its N timings back-to-back, so a minutes-long external load
    // window poisoned every iteration of one case while its neighbors
    // read clean (r10's minhash_pairs read 14.4 s in-sweep vs 4.1 s in
    // an isolated same-code re-run and needed a manual adjudication).
    // Now the FULL case suite runs SPARK_GRAFT_SCALE_ITERS times
    // (default 3 since r15 — the r13/r14 verdicts' de-noising task:
    // min-of-2 left same-record x1 passes disagreeing 15×, e.g.
    // exact_substr_dedup_xxh64 [22.77, 1.497] in BENCH_r14; a third
    // pass costs one more case-suite sweep and gives the min a
    // JIT/page-cache-warm majority) — both legs of every case once per
    // pass — with a cheap load stamp at each pass boundary; the per-leg
    // min is taken ACROSS passes and the raw per-pass matrices + stamps
    // ride the scale object for `check_bench.py anomaly` (which covers
    // the scale block since round 11).
    val scaleIters = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "3").toInt)

    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def bucketed(table: String, keys: DataFrame): DataFrame = {
      graft.io.Layouts.writeBucketed(keys, table, "band", parts, "key")
      spark.table(table)
    }
    def dropTable(t: String): Unit =
      try spark.sql(s"DROP TABLE IF EXISTS $t")
      catch { case scala.util.control.NonFatal(_) => }

    /** One scale case: `setup` once (the UNTIMED ingest a production
      * deployment amortizes — bucketed key tables), one timed run per
      * (leg, pass), `teardown` once. Failures report -1 with the cause
      * on stderr, like the headline loop.
      */
    case class SCase(name: String, setup: () => Unit,
        run1: Int => Double, runR: Int => Double,
        teardown: () => Unit = () => ())
    def simple(name: String, fn: Case): SCase =
      SCase(name, () => (), _ => time(fn(docs, emb)), _ => time(fn(d, e)))

    // STORED-KEY steady state: the corpus band-key table is built once
    // in setup() and persisted bucketed by both join keys (the
    // zero-exchange layout), so the timed probe pays only batch-side
    // hashing + the co-bucketed join + candidate verification. Its
    // growth vs corpus size is the "corpus work independent of corpus
    // size" claim as a measurement, next to the inline probe's.
    def keyed(name: String, keys1: => DataFrame, keysR: => DataFrame,
        probe: (DataFrame, DataFrame) => DataFrame,
        corpus1: DataFrame, corpusR: DataFrame): SCase = {
      val tbl1 = s"graft_scale_${name}_1"
      val tblR = s"graft_scale_${name}_r"
      SCase(name,
        setup = () => { bucketed(tbl1, keys1); bucketed(tblR, keysR); () },
        run1 = _ => time(probe(spark.table(tbl1), corpus1)),
        runR = _ => time(probe(spark.table(tblR), corpusR)),
        teardown = () => { dropTable(tbl1); dropTable(tblR) })
    }
    val keyedText = keyed("incremental_neardup_probe_keyed",
      Dedup.corpusBandKeys(docs, "doc_id", "text", numHashes = 16, bands = 4),
      Dedup.corpusBandKeys(d, "doc_id", "text", numHashes = 16, bands = 4),
      (keys, corpus) => Dedup.incrementalNearDupsWithKeys(
        docs, keys, corpus, "doc_id", "text", 0.95,
        numHashes = 16, bands = 4),
      docs, d)
    val keyedVec = keyed("incremental_cosine_probe_keyed",
      Similarity.corpusLshKeys(emb, "vec_id", "embedding",
        planesPerBand = 16, bands = 8),
      Similarity.corpusLshKeys(e, "vec_id", "embedding",
        planesPerBand = 16, bands = 8),
      (keys, corpus) => Similarity.incrementalCosineNearDupsWithKeys(
        emb, keys, corpus, "vec_id", "embedding", 0.95,
        planesPerBand = 16, bands = 8),
      emb, e)

    // Streaming ingest steady state: drain a FIXED micro-batched input
    // (the base corpus, id-shifted) through ingestNearDupKeyed against a
    // pre-seeded 1× vs R× corpus whose key table already exists — the
    // claimed per-batch-work-independent-of-corpus-size shape, measured.
    // AvailableNow trigger; the sink appends to scratch copies only.
    // Each (leg, pass) re-seeds its own scratch corpus/keys/checkpoint
    // (fresh tag), so a reused checkpoint can't turn a repeat into a
    // no-op.
    def streamRun(tag: String, corpus: DataFrame): Double = {
      val base = s"$dir/stream_$tag"
      try {
        corpus.select(col("doc_id"), col("text"))
          .write.mode("overwrite").parquet(s"$base/corpus")
        Dedup.corpusBandKeys(
            spark.read.parquet(s"$base/corpus"), "doc_id", "text",
            numHashes = 16, bands = 4)
          .write.mode("overwrite").parquet(s"$base/keys")
        // streamed ids must be disjoint from EVERY replica's id space:
        // replica k shifts by k*100000000, so an offset of 9e8 collided
        // with replica k=9 in the R× run (duplicate doc_ids appended to
        // the scratch corpus) while the 1× run had none — an asymmetry
        // in the measured growth. 1e10 clears any replica count ≤ 100.
        docs.select((col("doc_id") + lit(10000000000L)).as("doc_id"),
            col("text"))
          .repartition(32).write.mode("overwrite").parquet(s"$base/in")
        val schema = spark.read.parquet(s"$base/in").schema
        val t0 = System.nanoTime()
        graft.streaming.EventStreams.ingestNearDupKeyed(spark, schema,
            s"$base/in", s"$base/corpus", s"$base/keys", s"$base/chk",
            "doc_id", "text", threshold = 0.95, numHashes = 16, bands = 4)
          .awaitTermination()
        (System.nanoTime() - t0) / 1e9
      } catch { case scala.util.control.NonFatal(ex) =>
        System.err.println(s"[bench-scale] streaming_ingest_keyed failed: $ex")
        -1.0
      }
    }
    val streamCase = SCase("streaming_ingest_keyed", () => (),
      pass => streamRun(s"1_$pass", docs),
      pass => streamRun(s"r_$pass", d))

    // Sampled k-means training at a FIXED row budget: the x1 leg samples
    // half the base corpus; the xR leg samples the SAME number of rows
    // out of the replicated one (fraction 0.5/R). Growth ~1 is the claim
    // behind trainIvfCentroids(sampleFraction): Lloyd's rounds scan a
    // constant-size persisted sample, so training cost is ~flat in
    // corpus size — only the one narrow sampling filter grows with it.
    def trainOnce(embDf: DataFrame, frac: Double): Double = {
      val t0 = System.nanoTime()
      try {
        Similarity.trainIvfCentroids(embDf, "vec_id", "embedding",
          numCentroids = 16, iters = 2, sampleFraction = frac)
        (System.nanoTime() - t0) / 1e9
      } catch { case scala.util.control.NonFatal(ex) =>
        System.err.println(s"[bench-scale] ivf_train_sampled failed: $ex")
        -1.0
      }
    }
    val trainCase = SCase("ivf_train_sampled", () => (),
      _ => trainOnce(emb, 0.5), _ => trainOnce(e, 0.5 / r))

    val active = (cases.map { case (n, fn) => simple(n, fn) } ++
        Seq(keyedText, keyedVec, streamCase, trainCase))
      .filter(c => caseWanted(c.name))
    val setupFailed = scala.collection.mutable.Set.empty[String]
    active.foreach { c =>
      try c.setup() catch { case scala.util.control.NonFatal(ex) =>
        System.err.println(s"[bench-scale] setup failed for ${c.name}: $ex")
        setupFailed += c.name
      }
    }
    val pass1 = scala.collection.mutable.LinkedHashMap(
      active.map(c => c.name -> Vector.empty[Double]): _*)
    val passR = scala.collection.mutable.LinkedHashMap(
      active.map(c => c.name -> Vector.empty[Double]): _*)
    val scaleProbes = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (pass <- 1 to scaleIters) {
      scaleProbes += loadProbe()
      active.foreach { c =>
        def guarded(f: Int => Double): Double =
          if (setupFailed(c.name)) -1.0
          else try f(pass) catch { case scala.util.control.NonFatal(ex) =>
            System.err.println(s"[bench-scale] ${c.name} failed: $ex")
            -1.0
          }
        pass1(c.name) :+= guarded(c.run1)
        passR(c.name) :+= guarded(c.runR)
      }
    }
    scaleProbes += loadProbe() // closing stamp brackets the last pass
    active.foreach(c => try c.teardown()
      catch { case scala.util.control.NonFatal(_) => () })
    def minPos(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ > 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    val qs = active.map { c =>
      val (t1s, trs) = (pass1(c.name), passR(c.name))
      val (t1, tr) = (minPos(t1s), minPos(trs))
      val growth = if (t1 > 0 && tr > 0) tr / t1 else -1.0
      val passes =
        if (scaleIters < 2) ""
        else s""","x1_passes":[${t1s.map(fmt).mkString(",")}],"xr_passes":[${trs.map(fmt).mkString(",")}]"""
      s""""${c.name}":{"x1":${fmt(t1)},"x$r":${fmt(tr)},"growth":${fmt(growth)}$passes}"""
    }.mkString("{", ",", "}")
    // count the materialized parquet (footer metadata), not the
    // replica-construction plans — docsN/embN would re-run the full
    // 20-way union projections just to count rows
    val nDocs = d.count()
    val nVecs = e.count()
    // the replicated corpus is scratch data — don't leave it in /tmp
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(dir)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case scala.util.control.NonFatal(_) => }
    s""","scale":{"replicas":$r,"docs":$nDocs,"vecs":$nVecs,"agg":"min","iters":$scaleIters,"interleaved":true,"scale_probes":[${scaleProbes.map(fmt).mkString(",")}],"queries":$qs}"""
  }
}
