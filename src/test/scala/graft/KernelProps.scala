package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.functions.Kernels
import graft.model.MediaSchema
import graft.pipeline.Pipelines

/** Property tests over the pure kernels and pure planning functions — no
  * Spark session, so hundreds of generated cases run in milliseconds.
  */
object KernelProps extends Properties("graft") {

  private def strArr(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  private val token: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val tokenSeq: Gen[List[String]] = Gen.listOf(token)

  property("jaccard ∈ [0,1] and jaccard(A,A)=1 for nonempty sets") =
    forAll(tokenSeq) { xs =>
      val set = xs.distinct
      val j = Kernels.jaccard(strArr(set), strArr(set))
      if (set.isEmpty) j.isNaN else j == 1.0
    }

  property("jaccard matches the Set-algebra model") =
    forAll(tokenSeq, tokenSeq) { (xs, ys) =>
      val (a, b) = (xs.distinct, ys.distinct)
      (a.nonEmpty || b.nonEmpty) ==> {
        val expected = a.toSet.intersect(b.toSet).size.toDouble /
          a.toSet.union(b.toSet).size
        Kernels.jaccard(strArr(a), strArr(b)) == expected
      }
    }

  property("jaccardSorted over token hashes equals string jaccard (collision-free inputs)") =
    forAll(tokenSeq, tokenSeq) { (xs, ys) =>
      val (a, b) = (xs.distinct, ys.distinct)
      (a.nonEmpty || b.nonEmpty) ==> {
        val ha = Kernels.sortedTokenHashes(strArr(a))
        val hb = Kernels.sortedTokenHashes(strArr(b))
        // HARD assertion, not a `==>` guard: a guard would silently
        // DISCARD exactly the inputs where sortedTokenHashes drops or
        // merges tokens (the bug this property exists to catch). A real
        // 64-bit xxh64 collision on generated short tokens is ~n²/2⁶⁵ —
        // effectively impossible, so size equality is the expectation.
        ha.numElements() == a.size && hb.numElements() == b.size &&
          Kernels.jaccardSorted(ha, hb) == Kernels.jaccard(strArr(a), strArr(b))
      }
    }

  property("dropIndices matches the filter-by-index model") =
    forAll(tokenSeq, Gen.listOf(Gen.choose(-2, 30))) { (xs, cov) =>
      val got = Kernels.dropIndices(strArr(xs),
        new GenericArrayData(cov.toArray[Any]))
      val expected = xs.zipWithIndex.collect {
        case (t, i) if !cov.contains(i) => t
      }
      (0 until got.numElements()).map(got.getUTF8String(_).toString) ==
        expected
    }

  private def strArrNullable(xs: Seq[Option[String]]): GenericArrayData =
    new GenericArrayData(
      xs.map(_.map(UTF8String.fromString).orNull).toArray[Any])

  property("dropIndices passes null element slots through unchanged") =
    forAll(Gen.listOf(Gen.option(token)), Gen.listOf(Gen.choose(-2, 30))) {
      (xs, cov) =>
        val got = Kernels.dropIndices(strArrNullable(xs),
          new GenericArrayData(cov.toArray[Any]))
        val expected = xs.zipWithIndex.collect {
          case (t, i) if !cov.contains(i) => t
        }
        (0 until got.numElements()).map(i =>
          if (got.isNullAt(i)) None
          else Some(got.getUTF8String(i).toString)) == expected
    }

  property("dropIndices with no covered indices preserves the input values") =
    // value check only — the result MAY alias the input (the same
    // contract as split()/substring(); see the kernel's
    // aliasing-contract note)
    forAll(tokenSeq) { xs =>
      val got = Kernels.dropIndices(strArr(xs),
        new GenericArrayData(Array.empty[Any]))
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == xs
    }

  property("jsonObjectish accepts what json emitters produce, rejects truncations") = {
    val good = Seq(
      """{}""",
      """{"a":1,"b":[1,2,{"c":"x"}]}""",
      """{"s":"br{ce \" and ] inside","n":-1.5}""")
    val bad = Seq(
      "", "[1]", """{"a":1""", """{"a":1}}""", """{"a":1}{"b":2}""",
      """{"a":"unterminated}""", """{"a":1} trailing""")
    Prop(good.forall(Bench.jsonObjectish) && !bad.exists(Bench.jsonObjectish)) :| {
      // every valid prefix-truncation of a real summary must be rejected
      val line = """{"sf":"testdata/sf1","total_sec":372.55,"queries":162}"""
      s"truncations: ${(1 until line.length).count(i => Bench.jsonObjectish(line.take(i)))}"
    } && Prop {
      // every strict prefix, INCLUDING the one missing only the final
      // '}' (a hardcoded `1 until 53` on the 54-char line skipped it)
      val line = """{"sf":"testdata/sf1","total_sec":372.55,"queries":162}"""
      (1 until line.length).forall(i => !Bench.jsonObjectish(line.take(i)))
    }
  }

  property("gramStats matches the groupBy-count model") =
    forAll(tokenSeq, Gen.choose(1, 4)) { (xs, n) =>
      val out = Kernels.gramStats(strArr(xs), n)
      val grams = xs.sliding(n).filter(_.size == n).map(_.mkString(" ")).toList
      val counts = grams.groupBy(identity).map(_._2.size)
      out.getLong(0) == grams.size.toLong &&
        out.getLong(1) == (if (counts.isEmpty) 0L else counts.max.toLong) &&
        out.getLong(2) == counts.filter(_ > 1).sum.toLong
    }

  property("minhash of a union is the elementwise min of the signatures") =
    forAll(tokenSeq, tokenSeq) { (xs, ys) =>
      val k = 16
      val sa = Kernels.minhash(strArr(xs), k)
      val sb = Kernels.minhash(strArr(ys), k)
      val su = Kernels.minhash(strArr(xs ++ ys), k)
      (0 until k).forall(i =>
        su.getLong(i) == math.min(sa.getLong(i), sb.getLong(i)))
    }

  property("simhash of one token is that token's xxh64") =
    forAll(token) { t =>
      Kernels.simhash64(strArr(Seq(t))) ==
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(UTF8String.fromString(t), 42L)
    }

  property("shingle count is len-n+1 for distinct tokens, 0 when too short") =
    forAll(tokenSeq.map(_.distinct), Gen.choose(1, 5)) { (toks, n) =>
      val count = Kernels.shingles(strArr(toks), n).numElements()
      // EXACT equality: with distinct tokens every window starts with a
      // distinct token, so no two windows can repeat and the kernel's
      // dedup must keep all of them (a `<=` bound passed even on an
      // implementation returning zero shingles)
      if (toks.size < n) count == 0
      else count == toks.size - n + 1
    }

  property("normalizeFieldName is idempotent and emits no spaces/parens") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '(', ')', '_')))
        .map(_.mkString)) { s =>
      val once = MediaSchema.normalizeFieldName(s)
      MediaSchema.normalizeFieldName(once) == once &&
        !once.exists(c => c == ' ' || c == '(' || c == ')') &&
        once == once.toLowerCase
    }

  property("coordinator plan partitions [0,total) exactly") =
    forAll(Gen.choose(1L, 1000000L), Gen.choose(1, 32)) { (total, nseg) =>
      (total >= nseg) ==> {
        val p = Pipelines.plan(total, nseg, avgSecondsPerRecord = 1.0)
        val segs = p.segments
        segs.head._1 == 0L && segs.last._2 == total &&
          segs.sliding(2).forall {
            case Seq(a, b) => a._2 == b._1 // contiguous, no gap/overlap
            case _ => true
          } && segs.forall { case (s, e, _) => e > s }
      }
    }

  private val smallWord: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  /** Tables a trainer can actually emit: each pair's members already
    * exist when it is learned, and every pair produces a DISTINCT new
    * symbol. (Without output-distinctness the min-rank loop and the
    * sequential reference legitimately diverge: a later merge can
    * recreate an earlier pair's member string, making the earlier rank
    * applicable again — a corner a frequency trainer cannot produce,
    * since both routes to one string never both win a round.)
    */
  private val learnedTable: Gen[List[(String, String)]] =
    Gen.chooseNum(0, 6).flatMap { n =>
      def step(k: Int, avail: Vector[String], produced: Set[String],
          acc: List[(String, String)]): Gen[List[(String, String)]] =
        if (k == 0) Gen.const(acc.reverse)
        else Gen.zip(Gen.oneOf(avail), Gen.oneOf(avail)).flatMap { case (a, b) =>
          val out = a + b
          if (produced(out)) step(k - 1, avail, produced, acc)
          else step(k - 1, avail :+ out, produced + out, (a, b) :: acc)
        }
      step(n, Vector("a", "b", "c"), Set.empty, Nil)
    }

  property("BPE segmentation is lossless and kernel ≡ sequential reference") =
    forAll(smallWord, learnedTable) { (w, merges) =>
      val model = new graft.functions.BpeModel(
        merges.map { case (a, b) => Array(a, b) }.toArray)
      val viaModel = model.segmentWord(w).toList
      val viaRef = graft.ops.Vocab.bpeSegment(w, merges).toList
      // lossless: the concatenated segments rebuild the word exactly
      viaModel.mkString == w && viaModel == viaRef
    }

  private val pathSeg: Gen[String] = Gen.frequency(
    6 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
    2 -> Gen.const(".."),
    1 -> Gen.const("."),
    1 -> Gen.const(""))
  private val entryName: Gen[String] = for {
    abs <- Gen.frequency(8 -> Gen.const(""), 1 -> Gen.const("/"),
      1 -> Gen.const("C:"))
    segs <- Gen.nonEmptyListOf(pathSeg)
    sep <- Gen.oneOf("/", "\\")
  } yield abs + segs.mkString(sep)

  property("sanitizeEntry never lets any entry escape or keep traversal parts") =
    forAll(entryName) { entry =>
      scala.util.Try(graft.io.Staging.sanitizeEntry(entry)) match {
        // accepted names are relative, normalized, and non-empty: no
        // drive/root anchor, no '.'/'..'/empty segments anywhere
        case scala.util.Success(p) =>
          val segs = p.split("/").toList
          p.nonEmpty && !p.startsWith("/") && !p.matches("^[A-Za-z]:.*") &&
            segs.nonEmpty &&
            segs.forall(s => s.nonEmpty && s != "." && s != "..")
        // rejections must be the sanitizer's own refusal, nothing else
        case scala.util.Failure(e) => e.isInstanceOf[IllegalArgumentException]
      }
    }

  property("Misra-Gries bounds hold for any stream, capacity, and split") =
    forAll(
      Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")),
      Gen.choose(1, 6),
      Gen.choose(1, 5)) { (stream, m, nSplits) =>
      val mg = new graft.ops.Sketches.MisraGries[String](m, identity)
      // arbitrary partitioning: reduce each slice, then merge the states
      val slices = stream.grouped(math.max(1, stream.size / nSplits)).toList
      val merged = slices
        .map(s => s.foldLeft(mg.zero)(mg.reduce))
        .foldLeft(mg.zero)(mg.merge)
      val est = mg.finish(merged).toMap
      val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val n = stream.size.toLong
      val bound = n / (m + 1)
      val sizeOk = est.size <= m
      // estimates lower-bound truth by at most N/(m+1)
      val errOk = est.forall { case (t, e) =>
        e <= truth(t) && truth(t) - e <= bound
      }
      // guaranteed presence: every token with frequency > N/(m+1) appears
      val presenceOk = truth.forall { case (t, c) =>
        c <= bound || est.contains(t)
      }
      sizeOk && errOk && presenceOk
    }

  property("Aho-Corasick finds exactly the contains-model needle set") =
    forAll(
      Gen.listOf(Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)),
      Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)) { (needles, text) =>
      val arr = needles.distinct.toArray
      val ac = new graft.ops.Decontamination.AhoCorasick(arr)
      val got = ac.matchedNeedles(text).map(arr(_)).toSet
      val expected = arr.filter(text.contains(_)).toSet
      got == expected
    }

  // frameStats is pinned against the REAL Column implementation in
  // MultimodalSpec ("frameStats matches the scalar model over a swept
  // domain") — a ScalaCheck mirror here asserted arithmetic about its
  // own local copy, which no implementation change could fail.
}
