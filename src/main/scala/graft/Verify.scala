package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Each query dir also gets a `_digest.json` — per-column row counts,
  * min/max, and an order-independent md5-sum fingerprint of the WRITTEN
  * parquet. Purpose: when the driver's hash gate fails while the local
  * oracle emulation passes (an environment-dependent value, the
  * round-3/4 q87 class), diffing the driver environment's _digest.json
  * against a local one names the offending column and its value range
  * from artifacts alone — no access to the driver machine needed.
  * `tools/check_oracle.py --diff-digests dirA dirB` does the diff.
  */
object Verify {

  /** Per-column digest of a written query result. All values derive
    * from the canonical string cast; `hsum` is the exact decimal sum of
    * 60-bit md5 prefixes over non-null values — partition-order
    * independent, so two environments agree iff the value multiset
    * (as strings) agrees.
    */
  private def writeDigest(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(dir)
    val aggs = df.columns.zipWithIndex.flatMap { case (c, i) =>
      val s = col(c).cast("string")
      Seq(
        count(s).as(s"__n$i"),
        min(s).as(s"__min$i"),
        max(s).as(s"__max$i"),
        sum(conv(substring(md5(s), 1, 15), 16, 10).cast("decimal(38,0)"))
          .as(s"__h$i"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs.toIndexedSeq: _*).head()
    def js(v: Any): String = v match {
      case null => "null"
      case x => "\"" + x.toString.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
        case ch => ch.toString
      } + "\""
    }
    val cols = df.columns.zipWithIndex.map { case (c, i) =>
      val base = 1 + i * 4
      s"${js(c)}:{" +
        s""""n":${row.getLong(base)},""" +
        s""""min":${js(row.get(base + 1))},""" +
        s""""max":${js(row.get(base + 2))},""" +
        s""""hsum":${js(row.get(base + 3))}}"""
    }.mkString("{", ",", "}")
    // The digest lives INSIDE the parquet dir the driver reads via
    // pyarrow ds.dataset(dir); only `_`/`.`-prefixed filenames are
    // ignored by dataset discovery (same rule that lets Spark's own
    // _SUCCESS marker pass). A bare `digest.json` here zeroed every
    // round-5 correctness entry — keep the underscore.
    Files.writeString(Paths.get(s"$dir/_digest.json"),
      s"""{"rows":${row.getLong(0)},"columns":$cols}""")
  }

  /** Oracle-gate demotions (round-12 fail-safe): queries named in the
    * demotions file ship NO oracle SQL — the driver then records the
    * honest weaker rows-only check instead of an unsound hash gate.
    * The file is written by `tools/apply_margin_demotions.py` from the
    * margin audit (a corpus-conditional gate whose BOTH soundness
    * arguments eroded after a fixture regeneration gets demoted there);
    * format `{"<query>": {"source": ..., "reason": ...}}` (a bare
    * string value is accepted as the reason). Missing file = no
    * demotions — the shipped default, since all current gates are
    * sound.
    */
  private[graft] def loadDemotions(path: String): Map[String, String] = {
    val f = new java.io.File(path)
    if (!f.isFile) Map.empty
    else {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(f)
      import scala.jdk.CollectionConverters._
      node.fieldNames().asScala.map { k =>
        val v = node.get(k)
        k -> (if (v.isObject && v.has("reason")) v.get("reason").asText
              else v.asText)
      }.toMap
    }
  }

  /** The oracle map actually shipped: `all` minus demoted queries. */
  private[graft] def gatedOracles(all: Map[String, String],
      demotions: Map[String, String]): Map[String, String] =
    all -- demotions.keys

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    // dev loop: SPARK_GRAFT_VERIFY_FILTER=q87,q83 dumps a subset (the
    // driver never sets it, so the round gate always runs everything)
    val keep = sys.env.get("SPARK_GRAFT_VERIFY_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      keep.forall(f => f.exists(name.startsWith))
    }
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        writeDigest(spark, s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // demotions: sys.prop override (specs), env override (tools), then
    // the repo-root file a round's margin audit maintains
    val demotionsPath = sys.props.getOrElse("graft.demotions",
      sys.env.getOrElse("SPARK_GRAFT_DEMOTIONS", "demotions.json"))
    // state the RESOLVED path and whether it was found, every run: the
    // default is CWD-relative, so Verify launched from any other
    // directory silently finds no file and fails OPEN past committed
    // demotions — make that mode loud in the log (r12 advisor finding)
    val demotionsAbs =
      Paths.get(demotionsPath).toAbsolutePath.normalize
    System.err.println(s"[verify] demotions file: $demotionsAbs (" +
      (if (Files.isRegularFile(demotionsAbs)) "found"
       else "ABSENT — every hash gate ships") + ")")
    val demotions = loadDemotions(demotionsPath)
    val applied = demotions.view
      .filterKeys(SparkEntry.oracleSql.contains).toMap
    applied.foreach { case (k, why) =>
      System.err.println(s"[verify] DEMOTED $k to rows-only: $why")
    }
    val json = gatedOracles(SparkEntry.oracleSql, demotions)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the audit trail CORRECTNESS readers see: why a usually-hash-gated
    // query shipped rows-only this round (empty object when none did)
    Files.writeString(Paths.get(s"$outDir/demotions.json"),
      applied.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
