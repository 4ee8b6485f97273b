package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal binary-column plumbing: stub decode contract, frame
  * sampling algebra, and agreement between the materializing and O(1)
  * accounting paths.
  */
class MultimodalSpec extends SparkSuite {

  private def assets = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(
      $"doc_id".as("asset_id"),
      when($"doc_id" % 2 === 0, "image").otherwise("audio").as("kind"),
      encode($"text", "UTF-8").as("payload"))
  }

  test("decode emits one MediaFeatures row per asset with the fixed schema") {
    val decoded = Multimodal.decode(assets)
    assert(decoded.columns.toSeq ===
      Seq("asset_id", "kind", "byte_len", "width", "height", "channels", "feature"))
    assert(decoded.count() === assets.count())
    val row = decoded.where(col("asset_id") === 0).collect().head
    assert(row.getSeq[Float](row.fieldIndex("feature")).length === 16)
    assert(row.getAs[Long]("byte_len") > 0)
    // deterministic: second run produces identical features
    val again = Multimodal.decode(assets).where(col("asset_id") === 0).collect().head
    assert(again.getSeq[Float](again.fieldIndex("feature")) ===
      row.getSeq[Float](row.fieldIndex("feature")))
  }

  test("decoded byte_len matches the expression-side binary length") {
    import spark.implicits._
    val exprLen = assets.select($"asset_id", length($"payload").cast("long").as("l"))
    val decLen = Multimodal.decode(assets).select($"asset_id", $"byte_len")
    val bad = exprLen.join(decLen, "asset_id").where($"l" =!= $"byte_len").count()
    assert(bad === 0)
  }

  test("frameSample frames tile the payload and agree with frameStats") {
    import spark.implicits._
    val frames = Multimodal.frameSample(assets, $"payload", frameBytes = 64, stride = 1)
    // stride=1: every frame sampled → lengths must sum back to byte_len
    val sums = frames.groupBy($"asset_id")
      .agg(sum($"frame_len").as("total"), count(lit(1)).as("nf"))
    val bad = sums.join(assets, "asset_id")
      .where($"total" =!= length($"payload")).count()
    assert(bad === 0)

    val (nF, nS, nB) = Multimodal.frameStats(length($"payload").cast("long"), 64, 1)
    val stats = assets.select($"asset_id", nF.as("nf2"), nS.as("ns2"), nB.as("nb2"))
    val disagree = sums.join(stats, "asset_id")
      .where($"nf" =!= $"nf2" || $"nf" =!= $"ns2" || $"total" =!= $"nb2").count()
    assert(disagree === 0)
  }

  test("frameStats sampled bytes accounts for the short last frame") {
    import spark.implicits._
    // 150 bytes, 64-byte frames, stride 2 → frames [0,64) [64,128) [128,150);
    // sampled idx 0 and 2 → 64 + 22 bytes
    val df = Seq(150L).toDF("len")
    val (nf, ns, nb) = Multimodal.frameStats($"len", 64, 2)
    val r = df.select(nf.as("nf"), ns.as("ns"), nb.as("nb")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 2L, 86L)))
  }

  test("resize clamps dimensions and preserves row count") {
    val decoded = Multimodal.decode(assets)
    val resized = Multimodal.resize(decoded, 224, 224)
    assert(resized.count() === decoded.count())
    assert(resized.where(col("width") > 224 || col("height") > 224).count() === 0)
  }
}
