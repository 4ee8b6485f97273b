package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Multimodal

/** Multimodal-column operators (builder brief): binary payloads with typed
  * metadata, frame sampling, and the stub-decoded feature pipeline.
  *
  * The `documents` table supplies the payload bytes (UTF-8 of `text` via
  * `encode` — the same given input table, no synthetic data); `kind`
  * cycles image/audio/video by doc_id. Everything except the stub decode
  * is expression-level and oracle-checked via byte-length arithmetic
  * (DuckDB can `octet_length` a BLOB but not slice one, so frame checks
  * compare lengths/indexes, not frame bytes).
  */
object MultimodalQueries {

  private val FrameBytes = 256
  private val Stride = 4

  /** documents → (doc_id, kind, payload binary). */
  private def assets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      when($"doc_id" % 3 === 0, "image")
        .when($"doc_id" % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode($"text", "UTF-8").as("payload"),
      $"text")
  }

  /** Typed metadata over opaque binary: byte length + portable fingerprint. */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .select($"doc_id", $"kind",
        length($"payload").cast("long").as("byte_len"),
        md5($"text").as("fingerprint"))
      .orderBy($"doc_id")
  }

  /** Frame accounting per kind (O(1)/row planning pass, no frame bytes). */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (n, sampled, bytes) =
      Multimodal.frameStats(length(col("payload")).cast("long"), FrameBytes, Stride)
    assets(s, dir)
      .select($"kind", n.as("nf"), sampled.as("ns"), bytes.as("nb"))
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum($"nf").as("total_frames"),
        sum($"ns").as("sampled_frames"),
        sum($"nb").as("sampled_bytes"))
      .orderBy($"kind")
  }

  /** Materialized frame sampling (posexplode + binary slice) — checked on
    * frame index/length algebra for a bounded id range.
    */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.frameSample(
        assets(s, dir).where($"doc_id" < 50), col("payload"), FrameBytes, Stride)
      .select($"doc_id", $"frame_idx", $"frame_len")
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Stub-decoded features (mapPartitions batch decode). Hash-checked:
    * the stub derives every feature from md5(payload), which DuckDB
    * reproduces from md5(text) (payload = UTF-8 of text). feature[0] ×
    * 256 recovers digest byte 0 exactly (no float-rounding ambiguity in
    * the cross-engine sum).
    */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.decode(assets(s, dir).withColumnRenamed("doc_id", "asset_id"))
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum($"byte_len").as("sum_bytes"),
        max($"width").as("max_width"),
        max($"channels").as("max_channels"),
        sum(element_at($"feature", 1).cast("double") * 256).cast("long")
          .as("f0_byte_sum"))
      .orderBy($"kind")
  }

  /** Perceptual image near-dup over the decoded features. Stub-decoded
    * (the oracle-checked basis, like q40): DuckDB rebuilds the full
    * 16-dim md5-derived feature vector per image asset and the exact
    * pair cosines — identical byte-exact doubles (byte/256 is exact in
    * both engines; the dot/norm fold matches q31's proven parity).
    * Real-codec histograms get spec coverage in `MultimodalSpec`.
    */
  private def q98(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // 0.93 keeps a real pair population flowing through the gate (md5
    // features have no planted duplicates; ≥0.98 matches nothing at
    // sf0.01, which would make the hash compare vacuous)
    Multimodal.imageNearDups(
        assets(s, dir).withColumnRenamed("doc_id", "asset_id"),
        threshold = 0.93, decoder = Multimodal.StubDecoder)
      .orderBy($"idA", $"idB")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_media_meta" -> (q37 _),
    "q38_frame_stats" -> (q38 _),
    "q39_frame_sample" -> (q39 _),
    "q40_decoded_features" -> (q40 _),
    "q98_image_neardup" -> (q98 _))

  val oracles: Map[String, String] = Map(
    "q37_media_meta" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |       octet_length(encode(text)) AS byte_len,
        |       md5(text) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q38_frame_stats" ->
      """WITH t AS (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |         octet_length(encode(text)) AS len,
        |         CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS nf
        |  FROM documents),
        |u AS (
        |  SELECT kind, len, nf,
        |         CASE WHEN nf = 0 THEN 0 ELSE (nf - 1) // 4 + 1 END AS ns,
        |         CASE WHEN nf = 0 THEN 0
        |              WHEN (nf - 1) % 4 = 0
        |              THEN ((nf - 1) // 4) * 256 + (len - (nf - 1) * 256)
        |              ELSE ((nf - 1) // 4 + 1) * 256 END AS nb
        |  FROM t)
        |SELECT kind, count(*) AS n_assets,
        |       CAST(sum(nf) AS BIGINT) AS total_frames,
        |       CAST(sum(ns) AS BIGINT) AS sampled_frames,
        |       CAST(sum(nb) AS BIGINT) AS sampled_bytes
        |FROM u GROUP BY kind ORDER BY kind""".stripMargin,
    "q39_frame_sample" ->
      """WITH t AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |         CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS nf
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id, CAST(g.i AS INTEGER) AS frame_idx,
        |       CAST(least(256, len - g.i * 256) AS INTEGER) AS frame_len
        |FROM t, LATERAL (SELECT unnest(range(0, nf, 4)) AS i) g
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q40_decoded_features" ->
      """WITH a AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |         octet_length(encode(text)) AS len,
        |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h,
        |         ('0x' || substr(md5(text), 1, 2))::BIGINT AS b0
        |  FROM documents)
        |SELECT kind, count(*) AS n_assets,
        |       CAST(sum(len) AS BIGINT) AS sum_bytes,
        |       CAST(max(h % 1920 + 1) AS INTEGER) AS max_width,
        |       CAST(max(CASE WHEN kind = 'audio' THEN 2 ELSE 3 END) AS INTEGER) AS max_channels,
        |       CAST(sum(b0) AS BIGINT) AS f0_byte_sum
        |FROM a GROUP BY kind ORDER BY kind""".stripMargin,
    // the stub's full 16-dim feature vector rebuilt from md5(text)
    // (feature[i] = digest byte i / 256, exact in float AND double),
    // then q31's exact-cosine pair technique over the image assets
    "q98_image_neardup" ->
      """WITH f AS (
        |  SELECT doc_id AS asset_id,
        |         list_transform(range(0, 16),
        |           i -> ('0x' || substr(md5(text), CAST(2 * i + 1 AS INTEGER), 2))::BIGINT / 256.0) AS v
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT a.asset_id AS idA, b.asset_id AS idB,
        |       list_cosine_similarity(a.v::DOUBLE[], b.v::DOUBLE[]) AS cosine
        |FROM f a, f b
        |WHERE a.asset_id < b.asset_id
        |  AND list_cosine_similarity(a.v::DOUBLE[], b.v::DOUBLE[]) > 0.93
        |ORDER BY idA, idB""".stripMargin)
}
