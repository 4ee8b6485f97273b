package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads carried as opaque
  * `binary` columns with typed metadata, plus the decode / feature-extract
  * / resize / frame-sample plumbing of a training-data pipeline.
  *
  * Scale design (100 TB target):
  *  - payload bytes never leave the executor: every operator is either a
  *    codegen'd expression over the binary column or a `mapPartitions`
  *    batch (the JVM analog of an Arrow `mapInPandas` — one decoder
  *    instance per partition, rows streamed through it);
  *  - the decode stage is pluggable ([[Decoder]]); real image/audio codecs
  *    are NOT available in this environment, so [[StubDecoder]] is a
  *    clearly-marked deterministic fake — the schema, partitioning, batch
  *    shape and UDF signature are the real contract and are tested;
  *  - frame sampling is pure expression algebra (slice/posexplode), so a
  *    decode→sample→filter pipeline is one narrow codegen'd stage with no
  *    shuffle and no driver involvement.
  */
/** Decoded media features. For the stub these are hash-derived; a real
  * decoder fills them from the codec (dimensions, duration, channels).
  * (Top-level: encoder codegen requires publicly accessible classes.)
  */
case class MediaFeatures(asset_id: Long, kind: String, byte_len: Long,
    width: Int, height: Int, channels: Int, feature: Array[Float])

case class RawAsset(asset_id: Long, kind: String, payload: Array[Byte])

/** [[Multimodal.resizeImages]] output: possibly re-encoded payload with
  * the post-resize dimensions; `resized = false` rows pass the original
  * payload through untouched (non-image, undecodable, or already within
  * the box).
  */
case class ResizedAsset(asset_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int, resized: Boolean)

object Multimodal {

  /** Per-partition media decoder — the seam where a real codec plugs in.
    * One instance per partition (mirrors connection/codec reuse in the
    * enrichment stage, SURVEY.md §2.11).
    */
  trait Decoder extends Serializable {
    def decode(assetId: Long, kind: String, payload: Array[Byte]): MediaFeatures
  }

  /** STUB — deterministic fake standing in for an image/audio/video codec
    * (none are installed in this container). Every feature derives from
    * the md5 of the payload bytes, so results are reproducible on any
    * cluster AND in the DuckDB oracle (q40 hash-checks the decode
    * pipeline's output): width/height from the leading 60 hex bits
    * (`('0x' || substr(md5(payload),1,15))::BIGINT`), feature[i] =
    * digest byte i / 256 (exact in Float — 256 is a power of two).
    * Swap for a real codec without touching any calling plan.
    */
  object StubDecoder extends Decoder {
    def decode(assetId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      val digest = graft.functions.Kernels.md5Digest(payload)
      val h = graft.functions.Kernels.longFromDigest(digest) >>> 4
      val feature = Array.tabulate(16)(i => (digest(i) & 0xff).toFloat / 256f)
      MediaFeatures(assetId, kind, payload.length.toLong,
        width = (h % 1920).toInt + 1, height = (h / 1920 % 1080).toInt + 1,
        channels = if (kind == "audio") 2 else 3, feature = feature)
    }
  }

  /** REAL image decoder on the same seam: `javax.imageio` (JDK-only —
    * PNG/JPEG/GIF/BMP, no external deps). Width/height/channels come
    * from the actual codec; the feature vector is a 16-bin normalized
    * luma histogram — a real, deterministic image statistic. Non-image
    * kinds and undecodable payloads fall back to [[StubDecoder]] so a
    * mixed-media frame keeps flowing (the dead-letter decision belongs
    * to the pipeline, not the codec). Per-pixel `getRGB` is fine for
    * fixture-scale images; a production build would grab the raster
    * buffer — the seam and plan shape are identical either way.
    * [[StubDecoder]] remains the oracle-checked path (q40): histogram
    * values are codec-version-dependent, so they get spec coverage, not
    * a cross-engine hash gate.
    */
  object ImageIoDecoder extends Decoder {
    def decode(assetId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      if (kind != "image") return StubDecoder.decode(assetId, kind, payload)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return StubDecoder.decode(assetId, kind, payload)
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Float](16)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // integer Rec.601 luma in [0, 255] → 16 bins
          val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(luma >> 4) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      MediaFeatures(assetId, kind, payload.length.toLong, w, h,
        channels = img.getColorModel.getNumComponents,
        feature = hist.map(_ / n))
    }
  }

  /** REAL audio decoder: `javax.sound.sampled` (JDK-only — WAV/AIFF/AU
    * PCM). Field mapping for audio: `width` = frame count, `height` =
    * sample rate (Hz), `channels` from the codec; feature = 16-bin
    * normalized histogram of 16-bit amplitude magnitudes — a real,
    * deterministic audio statistic. Non-audio kinds, non-PCM-16
    * payloads and undecodable bytes fall back to [[StubDecoder]].
    */
  object AudioWavDecoder extends Decoder {
    def decode(assetId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      if (kind != "audio") return StubDecoder.decode(assetId, kind, payload)
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return StubDecoder.decode(assetId, kind, payload)
        val bytes = ais.readAllBytes()
        val hist = new Array[Float](16)
        var i = 0
        var samples = 0L
        while (i + 1 < bytes.length) {
          val s =
            if (fmt.isBigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
            else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
          // |sample| in [0, 32768] → 16 bins of 2048 (32768 clamps to 15)
          hist(math.min(math.abs(s.toInt) >> 11, 15)) += 1f
          samples += 1
          i += 2
        }
        val frames = samples / math.max(fmt.getChannels, 1)
        MediaFeatures(assetId, kind, payload.length.toLong,
          width = frames.toInt, height = fmt.getSampleRate.toInt,
          channels = fmt.getChannels,
          feature = if (samples == 0) hist else hist.map(_ / samples))
      } catch {
        case scala.util.control.NonFatal(_) =>
          StubDecoder.decode(assetId, kind, payload)
      }
    }
  }

  /** One decoder for every JDK-decodable kind: images via
    * [[ImageIoDecoder]], audio via [[AudioWavDecoder]], everything else
    * (video — no JDK codec exists) via [[StubDecoder]]. The default a
    * real deployment would plug into [[decode]].
    */
  object JdkMediaDecoder extends Decoder {
    def decode(assetId: Long, kind: String, payload: Array[Byte]): MediaFeatures =
      kind match {
        case "image" => ImageIoDecoder.decode(assetId, kind, payload)
        case "audio" => AudioWavDecoder.decode(assetId, kind, payload)
        case _ => StubDecoder.decode(assetId, kind, payload)
      }
  }

  /** Decode a `(asset_id, kind, payload binary)` DataFrame into
    * [[MediaFeatures]] rows. Batched per partition; payloads stay
    * executor-side end-to-end (the `mapInPandas` shape, JVM-native).
    */
  def decode(df: DataFrame, decoder: Decoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id").cast("long"), col("kind"), col("payload"))
      .as[RawAsset]
      .mapPartitions { it => it.map(a => decoder.decode(a.asset_id, a.kind, a.payload)) }
      .toDF()
  }

  /** Perceptual near-duplicate images: decoded feature vectors (16-bin
    * luma histograms under [[ImageIoDecoder]]; md5-derived under the
    * stub) fed straight into the embedding near-dup engine — re-encodes
    * and resizes of the same image land in the same histogram
    * neighborhood, which exact byte dedup misses. Pure composition: the
    * decode `mapPartitions` stage feeds
    * [[Similarity.cosineNearDupPairs]] unchanged. Exact-quadratic
    * verify — use [[imageNearDupsBucketed]] at corpus scale.
    *
    * @return `idA, idB, cosine` pairs with cosine > `threshold`
    */
  def imageNearDups(assets: DataFrame, threshold: Double,
      decoder: Decoder = JdkMediaDecoder): DataFrame =
    Similarity.cosineNearDupPairs(
      decode(assets.where(col("kind") === "image"), decoder)
        .select(col("asset_id"), col("feature")),
      "asset_id", "feature", threshold)

  /** Scale path of [[imageNearDups]]: sign-LSH-bucketed candidates with
    * exact cosine verification and capped buckets — the plan that
    * survives 100 TB of image shards (candidate-proportional, never
    * all-pairs).
    */
  def imageNearDupsBucketed(assets: DataFrame, threshold: Double,
      planesPerBand: Int = 8, bands: Int = 4,
      decoder: Decoder = JdkMediaDecoder): DataFrame =
    Similarity.cosineNearDupPairsBucketed(
      decode(assets.where(col("kind") === "image"), decoder)
        .select(col("asset_id"), col("feature")),
      "asset_id", "feature", threshold, planesPerBand, bands)

  /** Resize: recompute features at a target resolution. With the stub this
    * just rescales the fake dimensions; the contract (same schema out,
    * narrow stage) is what a real resampler must satisfy.
    */
  def resize(decoded: DataFrame, w: Int, h: Int): DataFrame =
    decoded.withColumn("width", least(col("width"), lit(w)))
      .withColumn("height", least(col("height"), lit(h)))

  /** REAL image resize over the payload bytes (JDK-only): decode, scale
    * to FIT within `maxW`×`maxH` preserving aspect ratio (never
    * upscale), re-encode as PNG. Sampling is hand-rolled
    * nearest-neighbor integer arithmetic — deterministic on any JVM,
    * unlike `Graphics2D` interpolation whose kernels vary by rendering
    * hints and platform. Non-image kinds, undecodable payloads and
    * images already inside the box pass through UNCHANGED
    * (`resized = false`), so the op is safe to run over a mixed asset
    * table.
    *
    * Scale: the same narrow `mapPartitions` stage as [[decode]] —
    * payload bytes never shuffle, never reach the driver; output size
    * is bounded by the box.
    */
  def resizeImages(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id").cast("long"), col("kind"), col("payload"))
      .as[RawAsset]
      .mapPartitions { it =>
        it.map { a =>
          val img =
            if (a.kind != "image") null
            else try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(a.payload))
            catch { case _: Throwable => null }
          if (img == null || (img.getWidth <= maxW && img.getHeight <= maxH))
            ResizedAsset(a.asset_id, a.kind, a.payload,
              if (img == null) -1 else img.getWidth,
              if (img == null) -1 else img.getHeight, resized = false)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            // fit-within scale as exact rational math: the larger of the
            // two overage ratios decides; floor, but never below 1 px
            val tw = math.max(1, math.min(maxW.toLong, w.toLong * maxH / h)).toInt
            val th = math.max(1, math.min(maxH.toLong, h.toLong * maxW / w)).toInt
            val out = new java.awt.image.BufferedImage(tw, th,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < th) {
              val sy = (y.toLong * h / th).toInt
              var x = 0
              while (x < tw) {
                out.setRGB(x, y, img.getRGB((x.toLong * w / tw).toInt, sy))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedAsset(a.asset_id, a.kind, bos.toByteArray, tw, th,
              resized = true)
          }
        }
      }(org.apache.spark.sql.Encoders.product[ResizedAsset])
      .toDF()
  }

  /** Split a binary payload into fixed-size frames and keep every
    * `stride`-th one — pure expression algebra (slice the byte range per
    * frame), codegen'd, no UDF. The last frame may be short.
    *
    * Output: one row per sampled frame with `frame_idx` (0-based index in
    * the full frame sequence) and the frame bytes. An empty or null
    * payload has zero frames and contributes NO rows (an earlier clamp
    * emitted one phantom zero-length frame per empty asset, inflating
    * downstream frame counts).
    */
  def frameSample(df: DataFrame, payload: Column, frameBytes: Int,
      stride: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    val nFrames = ceil(length(payload).cast("double") / frameBytes).cast("int")
    df.withColumn("__n_frames", nFrames)
      .withColumn("frame_idx",
        // explode drops null/empty: n = 0 (empty payload) or null
        // payload yields no frame rows
        explode(when(col("__n_frames") > 0,
          sequence(lit(0), col("__n_frames") - 1, lit(stride)))))
      .withColumn("frame",
        // substring is 1-based; works on binary and returns binary
        substring(payload, col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .withColumn("frame_len", length(col("frame")))
      .drop("__n_frames")
  }

  /** Frame accounting without materializing frames (planning/stats pass):
    * total frames and sampled-frame count/bytes per asset, O(1) per row.
    */
  def frameStats(payloadLen: Column, frameBytes: Int, stride: Int): (Column, Column, Column) = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    val n = ceil(payloadLen.cast("double") / frameBytes).cast("long")
    // Column./ is double division; floor+cast gives integral div (args ≥ 0);
    // a zero-length payload has ZERO frames ([[frameSample]] agrees — an
    // earlier clamp reported 1)
    val sampled = when(n === 0, lit(0L))
      .otherwise(floor((n - 1) / stride).cast("long") + 1)
    // all sampled frames are full except possibly the last (short) frame,
    // which is sampled iff (n-1) % stride == 0
    val lastLen = payloadLen - (n - 1) * frameBytes
    val lastSampled = (n - 1) % stride === 0
    val bytes = when(n === 0, lit(0L))
      .otherwise(when(lastSampled, (sampled - 1) * frameBytes + lastLen)
        .otherwise(sampled * frameBytes))
    (n, sampled, bytes)
  }
}
