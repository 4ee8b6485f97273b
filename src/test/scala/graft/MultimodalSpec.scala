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

  test("empty and null payloads have zero frames in frameSample AND frameStats") {
    import spark.implicits._
    val df = Seq((1L, Array.emptyByteArray), (2L, null: Array[Byte]),
        (3L, Array[Byte](1, 2, 3)))
      .toDF("asset_id", "payload")
    // no phantom zero-length frame rows for empty/null payloads
    val frames = Multimodal.frameSample(df, $"payload", frameBytes = 64, stride = 1)
    assert(frames.select($"asset_id").as[Long].collect().toSeq === Seq(3L))
    val (nf, ns, nb) = Multimodal.frameStats(length($"payload").cast("long"), 64, 1)
    val r = df.where($"asset_id" === 1L)
      .select(nf.as("nf"), ns.as("ns"), nb.as("nb")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(df, $"payload", frameBytes = 0, stride = 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameStats($"payload", 64, 0)
    }
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

  test("frameStats matches the scalar model over a swept domain") {
    import spark.implicits._
    // Drive the REAL Column implementation over every (len, stride)
    // boundary shape — exact multiples, short last frames, zero length,
    // sub-frame payloads — and check each row against an independent
    // scalar model plus the algebraic invariants. (A ScalaCheck mirror
    // of the formula proved nothing: it asserted facts about its own
    // local copy.)
    val frameBytes = 256
    val lens = (0L to 8L).map(_ * frameBytes) ++ // exact multiples
      Seq(1L, 100L, 255L, 257L, 511L, 1000L, 99999L, 100000L)
    val cases = for { len <- lens.distinct; stride <- 1 to 8 }
      yield (len, stride)
    val byStride = cases.groupBy(_._2)
    byStride.foreach { case (stride, cs) =>
      val (nf, ns, nb) =
        Multimodal.frameStats($"len", frameBytes, stride)
      val got = cs.map(_._1).toDF("len")
        .select($"len", nf.as("nf"), ns.as("ns"), nb.as("nb"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      got.foreach { case (len, nfG, nsG, nbG) =>
        val nfE = math.ceil(len / frameBytes.toDouble).toLong
        val nsE = if (nfE == 0) 0L else (nfE - 1) / stride + 1
        val lastLen = len - (nfE - 1) * frameBytes
        val nbE =
          if (nfE == 0) 0L
          else if ((nfE - 1) % stride == 0) (nsE - 1) * frameBytes + lastLen
          else nsE * frameBytes
        assert((nfG, nsG, nbG) === ((nfE, nsE, nbE)),
          s"len=$len stride=$stride")
        // algebra: sampled bytes bounded by payload, frames cover it
        assert(nbG <= len && (nsG == 0) == (nfG == 0) &&
          nfG * frameBytes >= len && (len == 0L || nbG > 0),
          s"len=$len stride=$stride")
      }
    }
  }

  test("ImageIoDecoder decodes real PNG fixtures through the same mapPartitions plan") {
    import spark.implicits._
    // deterministic gradient PNGs encoded with the JDK codec itself
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 7 + y * 13 + seed) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v) // gray gradient
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val fixtures = Seq(
      (1L, "image", png(8, 6, 0)),
      (2L, "image", png(33, 17, 100)),
      (3L, "audio", Array[Byte](1, 2, 3)),       // non-image → stub fallback
      (4L, "image", Array[Byte](9, 9, 9))        // corrupt → stub fallback
    ).toDF("asset_id", "kind", "payload")
    val rows = Multimodal.decode(fixtures, Multimodal.ImageIoDecoder)
      .orderBy($"asset_id").collect()

    // real codec dimensions + channels, real histogram feature
    assert((rows(0).getAs[Int]("width"), rows(0).getAs[Int]("height")) === ((8, 6)))
    assert((rows(1).getAs[Int]("width"), rows(1).getAs[Int]("height")) === ((33, 17)))
    assert(rows(0).getAs[Int]("channels") === 3)
    Seq(0, 1).foreach { i =>
      val hist = rows(i).getSeq[Float](rows(i).fieldIndex("feature"))
      assert(hist.length === 16)
      assert(math.abs(hist.map(_.toDouble).sum - 1.0) < 1e-6) // normalized
    }
    // gray pixels: R=G=B → luma bin == v>>4; gradient covers many bins
    assert(rows(1).getSeq[Float](rows(1).fieldIndex("feature")).count(_ > 0) > 8)

    // fallback rows come from the stub, bit-identical to StubDecoder
    val stub3 = Multimodal.StubDecoder.decode(3L, "audio", Array[Byte](1, 2, 3))
    assert(rows(2).getAs[Int]("width") === stub3.width)
    assert(rows(2).getAs[Int]("channels") === 2)
    val stub4 = Multimodal.StubDecoder.decode(4L, "image", Array[Byte](9, 9, 9))
    assert(rows(3).getAs[Int]("width") === stub4.width)
  }

  test("WebDataset tar shard → sample map → real image decode, end to end") {
    import spark.implicits._
    import graft.io.Staging
    // the multimodal LOAD path a training job runs: tar shards of
    // (stem.jpg + stem.json) pairs → stem-grouped samples → asset frame
    // → the real JDK codec, all executor-side
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(w / 2, h / 2, 0xff8040)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val work = java.nio.file.Files.createTempDirectory("graft-wds")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$work/shard0.tar"),
      TarFixtures.tarBytes(Seq(
        ("000001.jpg", png(9, 4), '0'),
        ("000001.json", """{"label": "cat"}""".getBytes, '0'),
        ("000002.jpg", png(5, 7), '0'),
        ("000002.json", """{"label": "dog"}""".getBytes, '0'))))
    val samples = Staging.webdatasetSamples(spark, work.toString)
    val assets = samples.select(
      expr("CAST(sample AS LONG)").as("asset_id"),
      lit("image").as("kind"),
      col("files")("jpg").as("payload"))
    val rows = Multimodal.decode(assets, Multimodal.ImageIoDecoder)
      .orderBy($"asset_id").collect()
    assert(rows.length === 2)
    assert((rows(0).getAs[Int]("width"), rows(0).getAs[Int]("height")) === ((9, 4)))
    assert((rows(1).getAs[Int]("width"), rows(1).getAs[Int]("height")) === ((5, 7)))
    // the paired metadata rides the same sample map
    val labels = samples
      .select(col("sample"), decode(col("files")("json"), "UTF-8").as("meta"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels("000001").contains("cat") && labels("000002").contains("dog"))
  }

  test("imageNearDups finds perceptual duplicates exact byte dedup misses") {
    import spark.implicits._
    // one dark image with a single orange pixel, re-rendered at a
    // different size (different BYTES, near-identical luma histogram),
    // plus an all-white image — the perceptual pair must link, the
    // white image must not; both paths (exact + bucketed) agree
    def png(w: Int, h: Int, bg: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, bg)
      img.setRGB(w / 2, h / 2, 0xff8040)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val assets = Seq(
      (1L, "image", png(16, 16, 0x000000)),
      (2L, "image", png(32, 32, 0x000000)), // re-render, different bytes
      (3L, "image", png(16, 16, 0xffffff)), // all-white: different histogram
      (4L, "audio", Array[Byte](1, 2, 3)))  // non-image: excluded
      .toDF("asset_id", "kind", "payload")
    assert(assets.where($"kind" === "image").select(md5($"payload"))
      .distinct().count() === 3L) // genuinely distinct bytes
    val exact = Multimodal.imageNearDups(assets, threshold = 0.98)
      .select($"idA", $"idB").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.toSet === Set((1L, 2L)))
    val bucketed = Multimodal.imageNearDupsBucketed(assets, threshold = 0.98)
      .select($"idA", $"idB").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bucketed.toSet === Set((1L, 2L)))
  }

  test("JdkMediaDecoder decodes WAV fixtures and routes kinds to the right codec") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // deterministic 16-bit PCM mono WAV: a ramp over the full amplitude range
    def wav(nFrames: Int, rate: Float): Array[Byte] = {
      val pcm = new Array[Byte](nFrames * 2)
      for (i <- 0 until nFrames) {
        val s = ((i.toLong * 65535 / math.max(nFrames - 1, 1)) - 32768).toShort
        pcm(2 * i) = (s & 0xff).toByte          // little-endian
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def png(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 3,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val fixtures = Seq(
      (1L, "audio", wav(4800, 8000f)),
      (2L, "image", png()),
      (3L, "video", Array[Byte](5, 5, 5)),       // no JDK codec → stub
      (4L, "audio", Array[Byte](1, 2, 3))        // corrupt → stub
    ).toDF("asset_id", "kind", "payload")
    val rows = Multimodal.decode(fixtures, Multimodal.JdkMediaDecoder)
      .orderBy($"asset_id").collect()

    // audio: frames / sample rate / channels from the real codec
    assert(rows(0).getAs[Int]("width") === 4800)
    assert(rows(0).getAs[Int]("height") === 8000)
    assert(rows(0).getAs[Int]("channels") === 1)
    val hist = rows(0).getSeq[Float](rows(0).fieldIndex("feature"))
    assert(hist.length === 16)
    assert(math.abs(hist.map(_.toDouble).sum - 1.0) < 1e-6)
    assert(hist.count(_ > 0) > 8) // full-range ramp fills most bins
    // image routes to ImageIoDecoder
    assert(rows(1).getAs[Int]("width") === 4 && rows(1).getAs[Int]("height") === 3)
    // video and corrupt audio fall back to the stub
    val stub3 = Multimodal.StubDecoder.decode(3L, "video", Array[Byte](5, 5, 5))
    assert(rows(2).getAs[Int]("width") === stub3.width)
    val stub4 = Multimodal.StubDecoder.decode(4L, "audio", Array[Byte](1, 2, 3))
    assert(rows(3).getAs[Int]("width") === stub4.width)
  }

  test("resize clamps dimensions and preserves row count") {
    import spark.implicits._
    // hand-built dims: the clamp must map an oversized dim to EXACTLY
    // the box edge and leave in-range dims untouched — a degenerate
    // "resize" setting every dim to 0 satisfied the old <= 224 bound
    val dims = Seq((1L, 300, 100), (2L, 200, 250), (3L, 64, 48))
      .toDF("asset_id", "width", "height")
    val clamped = Multimodal.resize(dims, 224, 224).orderBy($"asset_id")
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSeq
    assert(clamped === Seq((224, 100), (200, 224), (64, 48)))
    val decoded = Multimodal.decode(assets)
    val resized = Multimodal.resize(decoded, 224, 224)
    assert(resized.count() === decoded.count())
    assert(resized.where(col("width") > 224 || col("height") > 224).count() === 0)
  }

  test("resizeImages downscales real pixels nearest-neighbor, passes the rest") {
    import spark.implicits._
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 7 + y * 13 + seed) % 256) * 0x010101)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val small = png(8, 6, 1)
    val fixtures = Seq(
      (1L, "image", png(40, 20, 0)),       // downscaled to fit 10×10
      (2L, "image", small),                // already inside: untouched
      (3L, "audio", Array[Byte](1, 2, 3)), // non-image: untouched
      (4L, "image", Array[Byte](9, 9))     // corrupt: untouched
    ).toDF("asset_id", "kind", "payload")
    val rows = Multimodal.resizeImages(fixtures, 10, 10)
      .orderBy($"asset_id").collect()
    // 40×20 into a 10×10 box: width binds → 10×5, aspect held
    assert(rows(0).getAs[Boolean]("resized"))
    assert((rows(0).getAs[Int]("width"), rows(0).getAs[Int]("height")) === ((10, 5)))
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rows(0).getAs[Array[Byte]]("payload")))
    assert((out.getWidth, out.getHeight) === ((10, 5)))
    // nearest-neighbor: target (x, y) samples source (4x, 4y) exactly
    for (x <- 0 until 10; y <- 0 until 5) {
      val v = (4 * x * 7 + 4 * y * 13) % 256
      assert((out.getRGB(x, y) & 0xffffff) === v * 0x010101, s"($x,$y)")
    }
    assert(!rows(1).getAs[Boolean]("resized"))
    assert(rows(1).getAs[Array[Byte]]("payload").toSeq === small.toSeq)
    assert((rows(1).getAs[Int]("width"), rows(1).getAs[Int]("height")) === ((8, 6)))
    assert(!rows(2).getAs[Boolean]("resized") &&
      rows(2).getAs[Int]("width") === -1)
    assert(!rows(3).getAs[Boolean]("resized") &&
      rows(3).getAs[Array[Byte]]("payload").length === 2)
  }
}
