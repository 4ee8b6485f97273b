package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Tight JIT-compiled loops behind the custom expressions in this package.
  * Called both from interpreted eval and from whole-stage-generated code
  * (via Scala's static forwarders), so a plan using these stays inside one
  * codegen stage while the per-row work runs at primitive-array speed —
  * unlike Catalyst higher-order functions (transform/aggregate), which
  * interpret their lambda per element.
  *
  * Numeric contract: all folds accumulate left-to-right in Double, the
  * same operation sequence as the `aggregate(zip_with(...))` formulation
  * they replace — results are bit-identical (required for oracle parity).
  */
object Kernels {

  private final val HashSeed = 42L // xxhash64's fixed seed in Spark

  /** Σ a_i·b_i over float arrays (sequential double fold). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Σ a_i·b_i over double arrays. */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** √(Σ x²) over a float array. */
  def normF(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** √(Σ x²) over a double array. */
  def normD(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  /** dot/(|a|·|b|) over float arrays in one pass. Per-accumulator op
    * sequence identical to dotF/normF run separately.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** MinHash signature over a string array: sig[j] = min over tokens of
    * the `xxhash64(token, j)` chain (string hashed once with seed 42,
    * then the index mixed in via hashInt — the exact value Spark's
    * built-in xxhash64 produces for those two arguments). One string hash
    * per token, then k cheap int-mixes — no per-element lambda
    * interpretation and no allocation beyond the signature.
    */
  def minhash(tokens: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val base = XXH64.hashUTF8String(tokens.getUTF8String(i), HashSeed)
        var j = 0
        while (j < k) {
          val h = XXH64.hashInt(j, base)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Jaccard set similarity of two string arrays — exactly
    * size(array_intersect(a,b)) / size(array_union(a,b)) for ARBITRARY
    * inputs (duplicates collapse, a null element is one set member, as
    * in Spark's set operations), with hash probes instead of two
    * allocated result arrays. 0/0 → NaN, matching double division.
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](na * 2)
    var nullA = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) nullA = true else setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](nb * 2)
    var nullB = false
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) nullB = true else setB.add(b.getUTF8String(i))
      i += 1
    }
    var inter = 0
    val itB = setB.iterator()
    while (itB.hasNext) if (setA.contains(itB.next())) inter += 1
    if (nullA && nullB) inter += 1
    val distinctA = setA.size + (if (nullA) 1 else 0)
    val distinctB = setB.size + (if (nullB) 1 else 0)
    val union = distinctA + distinctB - inter
    inter.toDouble / union
  }

  /** Distinct word n-gram shingles of a token array, first-occurrence
    * order, space-joined; empty when the document has fewer than n
    * tokens. Same element set as
    * array_distinct(transform(sequence(...), i => concat_ws(" ", slice(toks, i, n)))).
    */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val total = tokens.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= total - n) {
      var j = 0
      while (j < n) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Tokens whose 0-based index is NOT in `covered`, original order —
    * the ExactSubstr rebuild. One boolean mask sized to the token count
    * (covered indices out of range are ignored), so the rebuild is
    * O(n_tokens + n_covered) per document; the `filter(toks, (t, i) =>
    * !array_contains(cov, i))` HOF it replaces rescanned the covered
    * array per token — O(n·m), quadratic on a heavily-duplicated doc
    * where covered ≈ n.
    */
  def dropIndices(tokens: ArrayData, covered: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val m = covered.numElements()
    // Aliasing contract: the result (and the retained UTF8Strings) may
    // point into the input's buffer — the SAME contract as Spark's own
    // split()/substring()/array HOFs, whose outputs alias until the next
    // row is produced. Consumers that buffer rows copy (UnsafeProjection
    // does), so a defensive per-element clone() here would only protect
    // callers already broken with every Spark string function; a 5-iter
    // A/B at sf0.1 could not distinguish clone from alias on q138
    // (shuffle-dominated), so the alias is chosen on idiom, keeping the
    // rebuild allocation-proportional to SURVIVING tokens only.
    if (m == 0) return tokens
    val drop = new Array[Boolean](n)
    var i = 0
    while (i < m) {
      if (!covered.isNullAt(i)) {
        val ix = covered.getInt(i)
        if (ix >= 0 && ix < n) drop(ix) = true
      }
      i += 1
    }
    val out = new java.util.ArrayList[AnyRef](n)
    i = 0
    while (i < n) {
      // null slots pass through as null (DropIndices.dataType propagates
      // the input's containsNull; getUTF8String on a null slot of an
      // UnsafeArrayData is undefined). Retained strings alias the input
      // buffer — see the contract note above.
      if (!drop(i))
        out.add(if (tokens.isNullAt(i)) null else tokens.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Word n-gram repetition statistics in one pass (the Gopher/C4-family
    * repetition signals): returns [n_grams, top_count, dup_count] where
    * n_grams = total n-gram occurrences (len − n + 1), top_count = the
    * occurrence count of the most frequent n-gram, dup_count = total
    * occurrences belonging to n-grams that occur more than once. A
    * per-row open hash of the gram strings — equivalent to
    * explode + groupBy(gram) + re-aggregate, but narrow: no shuffle, no
    * per-element lambda interpretation.
    */
  def gramStats(tokens: ArrayData, n: Int): ArrayData = {
    val total = tokens.numElements()
    val cnt = total - n + 1
    if (cnt <= 0) return new GenericArrayData(Array(0L, 0L, 0L))
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    val counts =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Int]](cnt * 2)
    var i = 0
    while (i < cnt) {
      var j = 0
      while (j < n) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      val gram = org.apache.spark.unsafe.types.UTF8String.concatWs(space, window: _*)
      val c = counts.get(gram)
      if (c == null) counts.put(gram, Array(1)) else c(0) += 1
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericArrayData(Array(cnt.toLong, top, dup))
  }

  /** Sorted distinct xxh64 hashes of a string array — the compact set
    * representation for repeated similarity comparisons. Hashing each
    * token once per document (instead of once per pair) turns pairwise
    * Jaccard into an allocation-free merge of two sorted long arrays.
    */
  def sortedTokenHashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val hs = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        hs(m) = XXH64.hashUTF8String(tokens.getUTF8String(i), HashSeed)
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(hs, 0, m)
    // drop duplicate hashes so the array is a set
    var out = 0
    i = 0
    while (i < m) {
      if (out == 0 || hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  /** Jaccard of two sorted distinct long arrays (set semantics) via a
    * two-pointer merge: zero allocation, O(|A|+|B|) long compares.
    */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return Double.NaN
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Index of the centroid (rows of `centroids`, a 2-D float array) with
    * the highest cosine similarity to `vec`; ties break to the lower
    * index. One fused pass per centroid, no allocation.
    */
  def nearestCentroid(vec: ArrayData, centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    val n = vec.numElements()
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val m = math.min(n, cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val x = vec.getFloat(i).toDouble
        val y = cent(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** Product-quantization encode (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): split `vec` into
    * `codebooks.length` contiguous subvectors (subspace j's width =
    * `codebooks(j)(0).length`) and emit, per subspace, the index of the
    * L2-nearest codeword — a dim-float vector becomes m small ints, the
    * compressed-at-rest ANN layout. Distance per codeword is the same
    * sequential double fold DuckDB's `list_distance(DOUBLE[], DOUBLE[])`
    * computes (Σ(x−y)² left to right, then sqrt — verified bit-identical
    * empirically), so code assignment is oracle-checkable; ties break to
    * the lower code. One fused pass per codeword, no allocation beyond
    * the m-int result.
    */
  def pqEncode(vec: ArrayData, codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    val codes = new Array[Int](m)
    val n = vec.numElements()
    var off = 0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = if (cb.nonEmpty) cb(0).length else 0
      val lim = math.max(0, math.min(dsub, n - off))
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var acc = 0.0
        var i = 0
        while (i < lim) {
          val d = vec.getFloat(off + i).toDouble - cw(i).toDouble
          acc += d * d
          i += 1
        }
        // codewords reaching past the vector compare their tail against
        // implicit zeros, so short vectors still encode deterministically
        while (i < dsub) { val y = cw(i).toDouble; acc += y * y; i += 1 }
        val dist = math.sqrt(acc)
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(j) = best
      off += dsub
      j += 1
    }
    new GenericArrayData(codes)
  }

  // -------------------------------------------------- md5-basis kernels
  //
  // Cross-engine-reproducible variants: every hash is md5 of a short
  // ASCII-framed string, parsed from the leading hex digits — DuckDB can
  // compute the identical value (('0x' || substr(md5(s),1,15))::BIGINT),
  // so LSH bucket assignment itself becomes oracle-checkable. The xxh64
  // kernels above remain the fast default where the oracle only needs the
  // VERIFIED output (exact jaccard / cosine), not the bucketing.

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of an md5 digest, big-endian — the canonical
    * cross-engine framing (the unsigned value of the hex string's first
    * 16 chars). THE one copy of this fold: every md5-basis kernel and
    * the multimodal stub decoder route through it.
    */
  private[graft] def longFromDigest(h: Array[Byte]): Long =
    ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
      ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)

  private def md5Long64(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    longFromDigest(d.digest(bytes))
  }

  /** First 15 hex chars of md5(s) as a non-negative long in [0, 2^60) —
    * exactly `('0x' || substr(md5(s), 1, 15))::BIGINT` in DuckDB.
    */
  def md5Hash60(s: String): Long =
    md5Long64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >>> 4

  /** md5 digest (16 raw bytes) of a byte payload — the byte-level view of
    * the same hex string DuckDB's `md5` returns (digest byte i = hex
    * chars 2i+1..2i+2).
    */
  def md5Digest(bytes: Array[Byte]): Array[Byte] = {
    val d = md5Local.get()
    d.reset()
    d.digest(bytes)
  }

  /** Deterministic hyperplane matrix [plane][dim]: component (g, i) =
    * md5Hash60("plane:g:i") / 2^59 - 1 ∈ [-1, 1). Derived once per
    * (planes, dim) and cached — per-row cost is pure multiply-adds, the
    * md5s amortize to zero. No stored model, reproducible on any cluster
    * AND in the DuckDB oracle.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def planeMatrix(planes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((planes, dim), { key =>
      Array.tabulate(key._1, key._2) { (g, i) =>
        md5Hash60(s"plane:$g:$i").toDouble / (1L << 59).toDouble - 1.0
      }
    })

  /** Sign-LSH band keys over a float vector: `bands` keys, key b's bit p
    * is the sign of the projection onto global hyperplane b·planesPerBand
    * + p. All bands in one fused pass (one vector copy + planes×dim
    * multiply-adds); each projection folds left-to-right in Double, the
    * sequence DuckDB's list_dot_product uses.
    */
  def lshBandsF(vec: ArrayData, planesPerBand: Int, bands: Int): ArrayData = {
    val n = vec.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) { xs(i) = vec.getFloat(i).toDouble; i += 1 }
    new GenericArrayData(lshKeys(xs, planesPerBand, bands))
  }

  def lshBandsD(vec: ArrayData, planesPerBand: Int, bands: Int): ArrayData = {
    val n = vec.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) { xs(i) = vec.getDouble(i); i += 1 }
    new GenericArrayData(lshKeys(xs, planesPerBand, bands))
  }

  private def lshKeys(xs: Array[Double], planesPerBand: Int, bands: Int): Array[Long] = {
    val total = planesPerBand * bands
    val m = planeMatrix(total, xs.length)
    val keys = new Array[Long](bands)
    var g = 0
    while (g < total) {
      val row = m(g)
      var acc = 0.0
      var i = 0
      while (i < xs.length) { acc += xs(i) * row(i); i += 1 }
      if (acc > 0) keys(g / planesPerBand) |= 1L << (g % planesPerBand)
      g += 1
    }
    keys
  }

  /** Single sign-LSH bucket id in [0, 2^planes) — [[lshKeys]] with one band. */
  def lshBucketF(vec: ArrayData, planes: Int): Long =
    lshBandsF(vec, planes, 1).getLong(0)

  def lshBucketD(vec: ArrayData, planes: Int): Long =
    lshBandsD(vec, planes, 1).getLong(0)

  /** 64-bit SimHash with md5 token hashes (first 16 hex chars of
    * md5(token), big-endian) — bit-vote semantics identical to
    * [[simhash64]]; DuckDB reproduces the token hash as
    * `('0x' || substr(md5(tok),1,16))::UBIGINT`.
    */
  def simhashMd5(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Long64(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Per-k cached "j:" prefixes for [[minhashMd5]] — the digest streams
    * prefix bytes then token bytes, avoiding a string concat + re-encode
    * per (token, j) pair.
    */
  private val minhashPrefixCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()

  /** MinHash signature with md5 hashes: sig[j] = min over tokens of
    * md5Hash60(j + ":" + token) — DuckDB-reproducible
    * (min(('0x' || substr(md5(j || ':' || tok),1,15))::BIGINT) per j).
    * Empty inputs yield Long.MaxValue rows, as [[minhash]] does.
    */
  private val uPrefix = "u:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val bPrefix = "b:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val spaceByte = " ".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** DSIR hashed n-gram feature buckets over a token array: the unigram
    * feature `u:<tok>` per token plus the bigram feature `b:<a> <b>` per
    * adjacent pair, each hashed to
    * `('0x' || substr(md5(feat), 1, 15))::BIGINT % buckets` — value-
    * identical (unigrams first, then bigrams) to the built-in chain
    * `pmod(conv(substring(md5(encode(f, "UTF-8")), 1, 15), 16, 10), b)`
    * it replaces, but with the digest fed incrementally (prefix bytes,
    * token bytes, separator): no feature-string concat, no 32-char hex
    * encode, no substring, no radix re-parse. The built-in chain's 5
    * short-lived allocations per feature made the 32-thread sf1 bench
    * GC-bound on the DSIR queries (q100 21.1 s at 32 cores vs 7.2 s at
    * 8 — an inverted core ratio; r15). Null tokens (never produced by
    * split, handled for parity) keep the old null-feature semantics.
    */
  def ngramBuckets(tokens: ArrayData, buckets: Int): ArrayData = {
    val n = tokens.numElements()
    val m = n + math.max(n - 1, 0)
    val d = md5Local.get()
    var hasNull = false
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) hasNull = true
      else tokBytes(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    def uni(i: Int): Long = {
      d.reset(); d.update(uPrefix); d.update(tokBytes(i))
      (longFromDigest(d.digest()) >>> 4) % buckets
    }
    def bi(j: Int): Long = {
      d.reset(); d.update(bPrefix); d.update(tokBytes(j))
      d.update(spaceByte); d.update(tokBytes(j + 1))
      (longFromDigest(d.digest()) >>> 4) % buckets
    }
    if (!hasNull) {
      val out = new Array[Long](m)
      i = 0
      while (i < n) { out(i) = uni(i); i += 1 }
      var j = 0
      while (j < n - 1) { out(n + j) = bi(j); j += 1 }
      new GenericArrayData(out)
    } else {
      // parity slow path: a null token makes its features null, exactly
      // like concat/md5 over a null element in the expression chain
      val out = new Array[Any](m)
      i = 0
      while (i < n) {
        out(i) = if (tokBytes(i) == null) null else uni(i)
        i += 1
      }
      var j = 0
      while (j < n - 1) {
        out(n + j) =
          if (tokBytes(j) == null || tokBytes(j + 1) == null) null
          else bi(j)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  def minhashMd5(tokens: ArrayData, k: Int): ArrayData = {
    val prefixes = minhashPrefixCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(j =>
        s"$j:".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val d = md5Local.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val tokBytes = tokens.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          d.reset()
          d.update(prefixes(j))
          d.update(tokBytes)
          val v = longFromDigest(d.digest()) >>> 4
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over a string array: bit b of the result is the
    * majority vote of bit b across xxh64(token, 42).
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(i), HashSeed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Cosine of an int8-quantized vector (codes × scale) against a float
    * query — dequantize fused into the fold, per-index operation
    * sequence identical to cosineD over the dequantized doubles (oracle
    * parity: DuckDB's list_cosine_similarity over `x * scale` lists).
    */
  def cosineQF(codes: ArrayData, scale: Double, q: ArrayData): Double = {
    val n = math.min(codes.numElements(), q.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val a = codes.getByte(i) * scale
      val b = q.getFloat(i).toDouble
      dot += a * b
      na += a * a
      nb += b * b
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** cosineQF for a double query vector. */
  def cosineQD(codes: ArrayData, scale: Double, q: ArrayData): Double = {
    val n = math.min(codes.numElements(), q.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val a = codes.getByte(i) * scale
      val b = q.getDouble(i)
      dot += a * b
      na += a * a
      nb += b * b
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Compiled BPE merge table: (left, right) → learned rank, applied with
  * the standard lowest-rank-first loop. Built once at plan time by the
  * `graft_bpe_apply` expression and shipped into generated code as a
  * reference object — the NearestCentroid "tiny model as plan literal"
  * pattern, so corpus-side tokenization is scan-local with zero per-row
  * model cost beyond the hash lookups. (Top-level public class: codegen
  * references it by name.)
  */
final class BpeModel(merges: Array[Array[String]]) extends Serializable {

  private val ranks = new java.util.HashMap[String, Integer](merges.length * 2)
  locally {
    var i = 0
    while (i < merges.length) {
      // NUL (\u0000) never appears in whitespace-split tokens → unambiguous key
      ranks.put(merges(i)(0) + "\u0000" + merges(i)(1), Integer.valueOf(i))
      i += 1
    }
  }

  private def rank(a: String, b: String): Int = {
    val r = ranks.get(a + "\u0000" + b)
    if (r == null) Int.MaxValue else r.intValue()
  }

  /** Segment one word from characters: repeatedly merge every occurrence
    * of the lowest-rank adjacent pair (leftmost-first within a pass)
    * until no learned pair remains. Identical result to applying the
    * merges sequentially in learned order — a merge can never create a
    * pair of LOWER rank (both members of an earlier pair already existed
    * when that pair was learned) — but runs in O(pairs present), not
    * O(table size), passes per word.
    */
  def segmentWord(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    var sym = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) { sym += String.valueOf(w.charAt(i)); i += 1 }
    var done = sym.length < 2
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < sym.length - 1) {
        val r = rank(sym(j), sym(j + 1))
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val a = merges(best)(0)
        val b = merges(best)(1)
        val next = new scala.collection.mutable.ArrayBuffer[String](sym.length)
        var k = 0
        while (k < sym.length) {
          if (k + 1 < sym.length && sym(k) == a && sym(k + 1) == b) {
            next += a + b
            k += 2
          } else {
            next += sym(k)
            k += 1
          }
        }
        sym = next
        if (sym.length < 2) done = true
      }
    }
    sym
  }

  /** Flattened segmentation of every word in a string array (null words
    * skipped) — the corpus-side tokenize-with-learned-vocab operation.
    */
  def segmentAll(tokens: ArrayData): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val segs = segmentWord(tokens.getUTF8String(i).toString)
        var j = 0
        while (j < segs.length) {
          out += org.apache.spark.unsafe.types.UTF8String.fromString(segs(j))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
