package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot per-row loops of similarity
  * search and near-dup detection.
  *
  * Why not `aggregate(zip_with(...))`: Catalyst higher-order functions
  * interpret their lambda once per array element, which made the pairwise
  * stages of q26–q28/q31 the benchmark bottleneck. These expressions emit
  * a single static call into [[Kernels]] from generated code, so the
  * surrounding plan stays in one whole-stage-codegen span and the inner
  * loop runs as JIT-compiled primitive code (~50× less overhead/row).
  */
private[functions] trait ArrayOfNumericCheck { self: Expression =>
  protected def vectorInputs: Seq[Expression]

  protected def elementType: DataType =
    vectorInputs.head.dataType.asInstanceOf[ArrayType].elementType

  protected def isFloat: Boolean = elementType == FloatType

  def checkVectorTypes(): TypeCheckResult = {
    val ok = vectorInputs.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    // `same` only when `ok` — on a non-array input the cast below would
    // throw a raw ClassCastException during analysis instead of
    // returning the formatted TypeCheckFailure
    val same = ok &&
      vectorInputs.map(_.dataType.asInstanceOf[ArrayType].elementType)
        .distinct.sizeIs == 1
    if (ok && same) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> args of one element type, " +
        s"got ${vectorInputs.map(_.dataType.simpleString).mkString(", ")}")
  }
}

/** dot(a, b): Σ aᵢ·bᵢ as a left-to-right Double fold. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ArrayOfNumericCheck {
  override protected def vectorInputs: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult = checkVectorTypes()
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private lazy val kernel = if (isFloat) "dotF" else "dotD"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (isFloat) Kernels.dotF(x, y) else Kernels.dotD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.Kernels.$kernel($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

/** norm(a): √(Σ aᵢ²). */
case class VectorNorm(child: Expression)
    extends UnaryExpression with ArrayOfNumericCheck {
  override protected def vectorInputs: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = checkVectorTypes()
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  private lazy val kernel = if (isFloat) "normF" else "normD"
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (isFloat) Kernels.normF(x) else Kernels.normD(x)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.$kernel($a)")
  override protected def withNewChildInternal(c: Expression): VectorNorm =
    copy(child = c)
}

/** cosine(a, b): dot/(|a|·|b|) in one pass; bit-identical to computing the
  * three folds separately (each accumulator keeps its own sequence).
  */
case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression with ArrayOfNumericCheck {
  override protected def vectorInputs: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult = checkVectorTypes()
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  private lazy val kernel = if (isFloat) "cosineF" else "cosineD"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (isFloat) Kernels.cosineF(x, y) else Kernels.cosineD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.Kernels.$kernel($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorCosine =
    copy(left = l, right = r)
}

/** minhash(tokens, k): k-element MinHash signature of a string array. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<string> and k > 0")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any =
    Kernels.minhash(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.minhash($a, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** shingles(tokens, n): distinct word n-grams of a string array. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<string> and n > 0")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any =
    Kernels.shingles(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.shingles($a, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** gram_stats(tokens, n): [n_grams, top_count, dup_count] — n-gram
  * repetition statistics (Gopher/C4-family quality signals) in one
  * narrow pass; see [[Kernels.gramStats]].
  */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<string> and n > 0")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_stats"

  override def nullSafeEval(a: Any): Any =
    Kernels.gramStats(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.gramStats($a, $n)")
  override protected def withNewChildInternal(c: Expression): GramStats =
    copy(child = c)
}

/** token_hashes(tokens): sorted distinct xxh64 set of a string array. */
case class SortedTokenHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<string>")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override def nullSafeEval(a: Any): Any =
    Kernels.sortedTokenHashes(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.sortedTokenHashes($a)")
  override protected def withNewChildInternal(c: Expression): SortedTokenHashes =
    copy(child = c)
}

/** jaccard_sorted(a, b): Jaccard of two sorted distinct long arrays. */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
      case _ => TypeCheckFailure(s"$prettyName requires two array<long> args")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaccardSorted(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.Kernels.jaccardSorted($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
}

/** jaccard(a, b): |A∩B|/|A∪B| of two distinct-element string arrays. */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckSuccess
      case _ => TypeCheckFailure(s"$prettyName requires two array<string> args")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaccard(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.Kernels.jaccard($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** simhash64(tokens): 64-bit SimHash of a string array. */
case class SimHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<string>")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(a: Any): Any =
    Kernels.simhash64(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.simhash64($a)")
  override protected def withNewChildInternal(c: Expression): SimHash =
    copy(child = c)
}

/** lsh_bucket(vec, planes): sign-LSH bucket id in [0, 2^planes) from the
  * md5-derived hyperplane matrix — one fused pass over the vector instead
  * of an interpreted `aggregate(zip_with(...))` per plane.
  */
case class LshBucket(child: Expression, planes: Int)
    extends UnaryExpression with ArrayOfNumericCheck {
  override protected def vectorInputs: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (planes < 1 || planes > 62)
      TypeCheckFailure(s"$prettyName requires 1 <= planes <= 62")
    else checkVectorTypes()
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  private lazy val kernel = if (isFloat) "lshBucketF" else "lshBucketD"
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (isFloat) Kernels.lshBucketF(x, planes) else Kernels.lshBucketD(x, planes)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.$kernel($a, $planes)")
  override protected def withNewChildInternal(c: Expression): LshBucket =
    copy(child = c)
}

/** lsh_bands(vec, planesPerBand, bands): one sign-LSH key per band, all
  * bands computed in a single fused pass (multi-band OR-ing for recall,
  * as in MinHash banding).
  */
case class LshBands(child: Expression, planesPerBand: Int, bands: Int)
    extends UnaryExpression with ArrayOfNumericCheck {
  override protected def vectorInputs: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (planesPerBand < 1 || planesPerBand > 62 || bands < 1)
      TypeCheckFailure(s"$prettyName requires 1 <= planesPerBand <= 62 and bands >= 1")
    else checkVectorTypes()
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands"

  private lazy val kernel = if (isFloat) "lshBandsF" else "lshBandsD"
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (isFloat) Kernels.lshBandsF(x, planesPerBand, bands)
    else Kernels.lshBandsD(x, planesPerBand, bands)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.Kernels.$kernel($a, $planesPerBand, $bands)")
  override protected def withNewChildInternal(c: Expression): LshBands =
    copy(child = c)
}

/** simhash_md5(tokens): 64-bit SimHash on md5 token hashes — the
  * cross-engine-checkable twin of [[SimHash]].
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<string>")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_md5"

  override def nullSafeEval(a: Any): Any =
    Kernels.simhashMd5(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.simhashMd5($a)")
  override protected def withNewChildInternal(c: Expression): SimHashMd5 =
    copy(child = c)
}

/** minhash_md5(tokens, k): MinHash signature on md5 hashes — the
  * cross-engine-checkable twin of [[MinHashSignature]].
  */
case class MinHashMd5(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<string> and k > 0")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_md5"

  override def nullSafeEval(a: Any): Any =
    Kernels.minhashMd5(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.minhashMd5($a, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashMd5 =
    copy(child = c)
}

/** ngram_buckets(tokens, buckets): DSIR hashed n-gram feature buckets —
  * unigram + adjacent-bigram features of a token array, each mapped to
  * `('0x' || substr(md5(feat), 1, 15))::BIGINT % buckets`. The zero-
  * allocation kernel twin of the built-in
  * pmod(conv(substring(md5(...))), ...) chain (see
  * [[Kernels.ngramBuckets]]); value-identical, oracle-checkable.
  */
case class NgramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if buckets > 0 => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<string> and buckets > 0")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_ngram_buckets"

  override def nullSafeEval(a: Any): Any =
    Kernels.ngramBuckets(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.Kernels.ngramBuckets($a, $buckets)")
  override protected def withNewChildInternal(c: Expression): NgramBuckets =
    copy(child = c)
}

/** nearest_centroid(vec, centroids-literal): index of the most-cosine-
  * similar row of a small 2-D float-array model. The model arrives as a
  * foldable literal (typedLit), is unpacked once at plan time, and rides
  * into generated code as a referenced object — the scan-side "broadcast
  * a tiny model into an expression" pattern used by the IVF index.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centroids.nonEmpty => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<float> and ≥1 centroid")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(a: Any): Any =
    Kernels.nearestCentroid(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.nearestCentroid($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

/** pq_encode(vec, codebooks-literal): product-quantization codes of a
  * float vector — one L2-argmin codeword index per contiguous subspace.
  * The 3-D codebook model (m subspaces × ksub codewords × dsub floats)
  * arrives as a foldable literal, is unpacked once at plan time, and
  * rides into generated code as a referenced object — the same
  * "tiny model as plan literal" pattern as [[NearestCentroid]], one
  * level deeper. See [[Kernels.pqEncode]] for the oracle-reproducible
  * distance discipline.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if codebooks.nonEmpty && codebooks.forall(_.nonEmpty) => TypeCheckSuccess
    case _ => TypeCheckFailure(
      s"$prettyName requires array<float> and ≥1 codeword in every subspace")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(a: Any): Any =
    Kernels.pqEncode(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.pqEncode($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** cosine_q(codes, scale, query): cosine of an int8-quantized vector
  * (array<tinyint> codes × per-vector scale) against a float/double
  * query, with dequantization fused into the fold — quantized candidate
  * ranking reads the 4×-smaller codes table and never materializes
  * dequantized arrays. Per-index operation sequence matches cosineD
  * over the dequantized doubles, so the DuckDB oracle reproduces every
  * bit via `list_cosine_similarity(list_transform(codes, x -> x*scale),
  * query)`.
  */
case class QuantizedCosine(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(ByteType, _), DoubleType,
            ArrayType(FloatType | DoubleType, _)) => TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"$prettyName requires (array<tinyint>, double, array<float|double>), got " +
          Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_q"

  private lazy val kernel =
    third.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "cosineQF"
      case _ => "cosineQD"
    }
  override def nullSafeEval(c: Any, s: Any, q: Any): Any = {
    val codes = c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val query = q.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val scale = s.asInstanceOf[Double]
    if (kernel == "cosineQF") Kernels.cosineQF(codes, scale, query)
    else Kernels.cosineQD(codes, scale, query)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (c, s, q) => s"${ev.value} = graft.functions.Kernels.$kernel($c, $s, $q);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): QuantizedCosine = copy(first = f, second = s, third = t)
}

/** bpe_apply(tokens, merges-literal): flattened BPE segmentation of every
  * word in a string array, driven by a learned merge table that arrives
  * as a foldable literal and rides into generated code as a compiled
  * [[BpeModel]] — corpus-side tokenization with the learned vocabulary,
  * scan-local (the IVF "tiny model in the expression" pattern).
  */
case class BpeApply(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires array<string>")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_apply"

  @transient private lazy val model = new BpeModel(merges)
  override def nullSafeEval(a: Any): Any =
    model.segmentAll(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model, classOf[BpeModel].getName)
    defineCodeGen(ctx, ev, a => s"$ref.segmentAll($a)")
  }
  override protected def withNewChildInternal(c: Expression): BpeApply =
    copy(child = c)
}

/** ac_count(text): number of DISTINCT needles from a fixed set occurring
  * in `text` — one linear Aho-Corasick pass, ≡ `size(filter(needles,
  * n => contains(text, n)))` which rescans the text once per needle.
  * The automaton compiles once at plan build and ships with the plan
  * (the BpeApply model pattern).
  */
case class AcCountMatches(child: Expression, needles: Array[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires a string column")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ac_count"

  @transient private lazy val ac =
    new graft.ops.Decontamination.AhoCorasick(needles)
  override def nullSafeEval(a: Any): Any = ac.countMatches(a.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac,
      classOf[graft.ops.Decontamination.AhoCorasick].getName)
    defineCodeGen(ctx, ev, a => s"$ref.countMatches($a.toString())")
  }
  override protected def withNewChildInternal(c: Expression): AcCountMatches =
    copy(child = c)
}

/** The serializable automaton + needle-array pair [[AcMatchedNeedles]]
  * references from generated code: one Aho-Corasick pass returns the
  * matched needles THEMSELVES (as UTF8String, in needle-array order —
  * [[graft.ops.Decontamination.AhoCorasick.matchedNeedles]] iterates an
  * ascending index BitSet), so a downstream fold touches only the
  * needles present in the document instead of the whole set.
  */
private[functions] final class AcMatcher(needles: Array[String])
    extends Serializable {
  private val ac = new graft.ops.Decontamination.AhoCorasick(needles)
  // rebuilt per executor after deserialization; UTF8String is not
  // serialization-stable across Spark versions, String is
  @transient private lazy val utf8 =
    needles.map(org.apache.spark.unsafe.types.UTF8String.fromString)
  def matchedArray(text: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = ac.matchedNeedles(text).map(utf8(_): Any).toArray
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** ac_matches(text): the needles from a fixed set occurring in `text`,
  * in needle-ARRAY order — the match-set twin of [[AcCountMatches]]
  * (same single linear automaton pass), for callers that go on to do
  * per-matched-needle work (the redaction fold) and must not pay
  * O(full needle set) on every matched document.
  */
case class AcMatchedNeedles(child: Expression, needles: Array[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckSuccess
    case _ => TypeCheckFailure(s"$prettyName requires a string column")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ac_matches"

  @transient private lazy val matcher = new AcMatcher(needles)
  override def nullSafeEval(a: Any): Any = matcher.matchedArray(a.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acMatcher", matcher,
      classOf[AcMatcher].getName)
    defineCodeGen(ctx, ev, a => s"$ref.matchedArray($a.toString())")
  }
  override protected def withNewChildInternal(c: Expression): AcMatchedNeedles =
    copy(child = c)
}

/** drop_indices(tokens, covered): tokens whose 0-based index is not in
  * `covered`, original order — the ExactSubstr text rebuild, O(n + m)
  * via a per-row boolean mask (see [[Kernels.dropIndices]]).
  */
case class DropIndices(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType,
    containsNull = left.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "graft_drop_indices"

  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dropIndices(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.Kernels.dropIndices($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DropIndices =
    copy(left = l, right = r)
}

/** Registration for the custom expressions: [[GraftFunctions.register]]
  * for an existing session, or `spark.sql.extensions=graft.functions.
  * GraftExtensions` at session build.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringPairsArg(e: Expression): Array[Array[String]] = e match {
    case l @ Literal(_, ArrayType(ArrayType(StringType, _), _)) =>
      l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(ArrayType(StringType))
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(StringType).map(_.toString))
    case other => throw new IllegalArgumentException(
      s"merges must be an array<array<string>> literal (typedLit), got $other")
  }

  private def stringsArg(e: Expression, what: String): Array[String] = e match {
    case l @ Literal(_, ArrayType(StringType, _)) =>
      l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(StringType).map(_.toString)
    case other => throw new IllegalArgumentException(
      s"$what must be an array<string> literal (typedLit), got $other")
  }

  private def codebooksArg(e: Expression): Array[Array[Array[Float]]] = e match {
    case l @ Literal(_, ArrayType(ArrayType(ArrayType(FloatType, _), _), _)) =>
      l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(ArrayType(ArrayType(FloatType)))
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(ArrayType(FloatType))
          .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toFloatArray()))
    case other => throw new IllegalArgumentException(
      s"codebooks must be an array<array<array<float>>> literal (typedLit), got $other")
  }

  private def centroidsArg(e: Expression): Array[Array[Float]] = e match {
    case l @ Literal(_, ArrayType(ArrayType(FloatType, _), _)) =>
      l.value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(ArrayType(FloatType))
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray())
    case other => throw new IllegalArgumentException(
      s"centroids must be an array<array<float>> literal (typedLit), got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (args => VectorDot(args(0), args(1))),
    "graft_norm" -> (args => VectorNorm(args(0))),
    "graft_cosine" -> (args => VectorCosine(args(0), args(1))),
    "graft_minhash" -> (args => MinHashSignature(args(0), intArg(args(1), "numHashes"))),
    "graft_simhash64" -> (args => SimHash(args(0))),
    "graft_jaccard" -> (args => JaccardSim(args(0), args(1))),
    "graft_shingles" -> (args => WordShingles(args(0), intArg(args(1), "n"))),
    "graft_token_hashes" -> (args => SortedTokenHashes(args(0))),
    "graft_gram_stats" -> (args => GramStats(args(0), intArg(args(1), "n"))),
    "graft_lsh_bucket" -> (args => LshBucket(args(0), intArg(args(1), "planes"))),
    "graft_lsh_bands" -> (args => LshBands(args(0),
      intArg(args(1), "planesPerBand"), intArg(args(2), "bands"))),
    "graft_simhash_md5" -> (args => SimHashMd5(args(0))),
    "graft_minhash_md5" -> (args => MinHashMd5(args(0), intArg(args(1), "numHashes"))),
    "graft_ngram_buckets" -> (args => NgramBuckets(args(0), intArg(args(1), "buckets"))),
    "graft_jaccard_sorted" -> (args => JaccardSorted(args(0), args(1))),
    "graft_nearest_centroid" -> (args => NearestCentroid(args(0), centroidsArg(args(1)))),
    "graft_bpe_apply" -> (args => BpeApply(args(0), stringPairsArg(args(1)))),
    "graft_drop_indices" -> (args => DropIndices(args(0), args(1))),
    "graft_ac_count" -> (args => AcCountMatches(args(0),
      stringsArg(args(1), "needles"))),
    "graft_ac_matches" -> (args => AcMatchedNeedles(args(0),
      stringsArg(args(1), "needles"))),
    "graft_cosine_q" -> (args => QuantizedCosine(args(0), args(1), args(2))),
    "graft_pq_encode" -> (args => PqEncode(args(0), codebooksArg(args(1)))))

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent per-session registration (temp functions). */
  def register(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) {
      builders.foreach { case (name, builder) =>
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(name, builder, "built-in")
      }
    }

  /** Register into the thread's active session AND the default session —
    * called by every ops helper that emits a `graft_*` call, so
    * Column-only APIs work on any session without an explicit setup
    * step. Both sessions matter: inside a streaming `foreachBatch` the
    * thread's active session is the stream's CLONE, while frames built
    * from the caller's handle (`spark.read.parquet(...)`) resolve
    * against the base (default) session — registering only the active
    * one left such mixed-session plans with UNRESOLVED_ROUTINE when the
    * ingest was the session's first graft op (caught by the isolated
    * StreamingSpec keyed-ingest run; ordering masked it in-suite).
    */
  def ensureRegistered(): Unit = {
    SparkSession.getActiveSession.foreach(register)
    SparkSession.getDefaultSession.foreach(register)
  }

  /** `call_function` on a `graft_*` expression, auto-registering in the
    * active session first (idempotent) — the one shared wrapper every
    * op module's private `graftFn` delegates to.
    */
  def fn(name: String,
      args: org.apache.spark.sql.Column*): org.apache.spark.sql.Column = {
    ensureRegistered()
    org.apache.spark.sql.functions.call_function(name, args: _*)
  }
}

/** `SparkSessionExtensions` hook so the functions exist in every session
  * of a cluster configured with
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteJaccard)
  }
}
