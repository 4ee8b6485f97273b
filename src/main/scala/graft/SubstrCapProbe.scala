package graft

import org.apache.spark.sql.functions._

/** Capped-vs-uncapped cost of [[graft.ops.Dedup.exactSubstrDedup]]
  * (round-13 task 3's "done" measurement): the r12 cap shipped opt-in
  * because its `cappedByCount` machinery (a second gram-stream pass:
  * count-agg + anti-join) measured +85% on the sf0.1 rewrite; r13
  * rides the group count on the first-occurrence window itself (one
  * WindowExec evaluates both functions), which should make the
  * default-on cap ~free. This main times the rewrite at one sfDir in
  * three arms — uncapped opt-out, default cap, r12's two-pass shape
  * via a tight explicit cap is NOT reproduced (the code is gone);
  * instead the third arm is the md5 oracle basis as a reference point
  * — interleaved min-of-N with a warmup pass, actions forcing the
  * full rebuild (sum of clean_text lengths — count() alone would let
  * the optimizer prune the rebuild column).
  *
  * Usage: runMain graft.SubstrCapProbe [sfDir=/root/testdata/sf0.1]
  *          [iters=3] [k=20]
  */
object SubstrCapProbe {

  def main(args: Array[String]): Unit = {
    def argOr(i: Int, d: String) = if (args.length > i) args(i) else d
    val sfDir = argOr(0, "/root/testdata/sf0.1")
    val iters = argOr(1, "3").toInt
    val k = argOr(2, "20").toInt
    val spark = GraftSession.local("graft-substr-cap-probe")
    import graft.ops.Dedup

    val docs = Tables.documents(spark, sfDir)
    def run(maxGroup: Int, md5: Boolean): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val r = Dedup.exactSubstrDedup(docs, "doc_id", "text", k = k,
          md5Basis = md5, maxGroup = maxGroup)
        .agg(sum(length(col("clean_text"))), sum(col("n_removed")))
        .head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
    }
    val arms = Seq(
      "uncapped_xxh64" -> (() => run(Int.MaxValue, md5 = false)),
      "default_cap_xxh64" ->
        (() => run(Dedup.DefaultExactSubstrMaxGroup, md5 = false)),
      "default_cap_md5" ->
        (() => run(Dedup.DefaultExactSubstrMaxGroup, md5 = true)))
    arms.foreach { case (_, f) => f() } // warmup, discarded
    val acc = scala.collection.mutable.LinkedHashMap[String,
      List[(Double, Long, Long)]]()
    for (_ <- 1 to iters; (tag, f) <- arms) {
      acc(tag) = acc.getOrElse(tag, Nil) :+ f()
    }
    import Bench.fmt
    val results = acc.map { case (tag, rs) =>
      // the rebuilt-output digests must agree across arms when the cap
      // never binds — the measurement may not change the answer
      s""""$tag":{"min_sec":${fmt(rs.map(_._1).min)},"clean_chars":${rs.head._2},"n_removed":${rs.head._3},"passes":[${rs.map(r => fmt(r._1)).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val xs = acc.toSeq
    require(xs.forall(_._2.forall(r => r._2 == xs.head._2.head._2 &&
      r._3 == xs.head._2.head._3)),
      "arms disagree on rebuild output — cap bound at probe scale")
    spark.stop()
    val delta = acc("default_cap_xxh64").map(_._1).min /
      acc("uncapped_xxh64").map(_._1).min - 1.0
    println(s"""{"probe":"substr_cap","sf":"$sfDir","k":$k,"iters":$iters,"default_max_group":${Dedup.DefaultExactSubstrMaxGroup},"capped_over_uncapped_delta":${fmt(delta)},"arms":$results}""")
  }
}
