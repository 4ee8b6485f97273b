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

  test("hashSample is deterministic and approximately proportional") {
    val s1 = Sampling.hashSample(docs, "doc_id", 0.3)
    val s2 = Sampling.hashSample(docs, "doc_id", 0.3)
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

  test("hashSplit is disjoint, exhaustive, and roughly weighted") {
    import spark.implicits._
    val split = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1))
    assert(split.count() === docs.count())
    val counts = split.groupBy($"split").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set(0, 1, 2))
    val n = docs.count().toDouble
    assert(math.abs(counts(0) / n - 0.8) < 0.1)
    // same key always lands in the same split
    val again = Sampling.hashSplit(docs, "doc_id", Seq(0.8, 0.1, 0.1))
    val disagree = split.select($"doc_id", $"split")
      .join(again.select($"doc_id", $"split".as("s2")), "doc_id")
      .where($"split" =!= $"s2").count()
    assert(disagree === 0)
  }
}
