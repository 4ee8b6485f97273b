package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design notes (100 TB target):
  *  - exact dedup is a single hash-shuffle on the fingerprint — the
  *    cheapest possible plan; Spark's AQE handles skewed fingerprints.
  *  - MinHash-LSH shuffles once on (band, bandKey); candidate
  *    verification joins only within buckets. Degenerate buckets (mass
  *    duplication of one document) grow quadratically — cap them with
  *    [[lshCandidates]]' `maxBucket` before pairing.
  *  - everything is built-in expressions (codegen'd); signatures are
  *    computed scan-side so the shuffle carries only (id, keys).
  */
object Dedup {

  /** Whitespace-token set of a document (order-insensitive). */
  def tokenSet(text: Column): Column = array_distinct(TextAnalysis.tokens(text))

  /** Distinct n-gram (word shingle) set; empty when the doc is shorter
    * than `n` tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two pre-deduplicated string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  // ------------------------------------------------------------ exact dedup

  /** Keep one row per distinct `text` (lowest `idCol` wins — deterministic,
    * unlike dropDuplicates whose survivor depends on partition order).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  // --------------------------------------------------------------- MinHash

  /** MinHash signature: element k = min over tokens of xxhash64(token, k).
    * One pass over the tokens per document, no shuffle.
    */
  def minhashSignature(tokenArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      k => array_min(transform(tokenArr, t => xxhash64(t, k))))

  /** LSH band keys: the signature split into `bands` bands of
    * `numHashes / bands` rows, each band hashed to one 64-bit key.
    */
  def bandKeys(signature: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rows + 1, lit(rows))))
  }

  /** Candidate near-duplicate pairs from MinHash-LSH banding.
    *
    * @param df        input with an id column and a text column
    * @param maxBucket safety cap: buckets larger than this are dropped
    *                  (mass-duplicate clusters explode quadratically; at
    *                  100 TB they must be handled by exact dedup first)
    * @return (idA, idB) with idA < idB, distinct
    */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    val sig = minhashSignature(tokenSet(col(textCol)), numHashes)
    val keyed = df.select(col(idCol).as("__id"),
        posexplode(bandKeys(sig, numHashes, bands)).as(Seq("band", "key")))
    val capped = keyed
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col("band"), col("key"))))
      .where(col("__n") <= maxBucket)
      .drop("__n")
    val l = capped.select(col("band"), col("key"), col("__id").as("idA"))
    val r = capped.select(col("band"), col("key"), col("__id").as("idB"))
    l.join(r, Seq("band", "key"))
      .where(col("idA") < col("idB"))
      .select("idA", "idB")
      .distinct()
  }

  /** MinHash-LSH near-duplicate pairs, verified with exact Jaccard on the
    * token sets so the output is deterministic given the banding config.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 64, bands: Int = 4): DataFrame = {
    val cands = lshCandidates(df, idCol, textCol, numHashes, bands)
    val toks = df.select(col(idCol).as("__tid"), tokenSet(col(textCol)).as("__toks"))
    cands
      .join(toks.withColumnRenamed("__tid", "idA").withColumnRenamed("__toks", "__ta"), Seq("idA"))
      .join(toks.withColumnRenamed("__tid", "idB").withColumnRenamed("__toks", "__tb"), Seq("idB"))
      .select(col("idA"), col("idB"), jaccard(col("__ta"), col("__tb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact blocked near-dup: all pairs within a blocking key above a
    * Jaccard threshold. Quadratic within blocks — the oracle-checkable
    * ground truth for [[minhashNearDups]]; use only with selective blocks.
    */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val t = df.select(col(blockCol).as("__blk"), col(idCol).as("__id"),
      tokenSet(col(textCol)).as("__toks"))
    val a = t.select(col("__blk"), col("__id").as("idA"), col("__toks").as("__ta"))
    val b = t.select(col("__blk"), col("__id").as("idB"), col("__toks").as("__tb"))
    a.join(b, Seq("__blk"))
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), jaccard(col("__ta"), col("__tb")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash over the token set: bit b of the fingerprint is the
    * majority vote of bit b across xxhash64(token). Near-identical docs
    * differ in few bits (compare with [[hammingDistance]]).
    */
  def simhash64(tokenArr: Column): Column = {
    val hashes = transform(tokenArr, t => xxhash64(t))
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) => {
      val votes = aggregate(hashes, lit(0),
        (v, h) => v + when(call_function("shiftright", h, b)
          .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      acc + when(votes > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
    })
  }

  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within `blockCol` blocks at ≤ `maxBits`
    * differing bits.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, maxBits: Int): DataFrame = {
    val t = df.select(col(blockCol).as("__blk"), col(idCol).as("__id"),
      simhash64(tokenSet(col(textCol))).as("__sh"))
    val a = t.select(col("__blk"), col("__id").as("idA"), col("__sh").as("__sa"))
    val b = t.select(col("__blk"), col("__id").as("idB"), col("__sh").as("__sb"))
    a.join(b, Seq("__blk"))
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        hammingDistance(col("__sa"), col("__sb")).as("hamming"))
      .where(col("hamming") <= maxBits)
  }
}
