package graft.io

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: artifact (zip) ingestion — the reference downloads per-run GitHub
  * artifact zips and extracts them into `artifacts/<segment>/` before the
  * aggregator reads the tree
  * (reference .github/workflows/test_parquet_aggregator.yml:62-99,112-117).
  *
  * Spark-first shape: archives are read with the `binaryFile` source (one
  * task per archive, pushdown-pruned by glob), and entries are exploded
  * per-partition with `java.util.zip` — archive bytes never leave the
  * executor that scanned them, and extraction parallelism is the archive
  * count. The driver only ever sees metadata.
  */
object Staging {

  /** One extracted archive member. `content` is the raw entry bytes —
    * route parquet members to a staged tree ([[extractTo]]) for the S4
    * readers, or parse text/JSON members directly from the bytes.
    */
  case class ZipEntryRow(archive: String, entry: String, size: Long,
      content: Array[Byte])

  /** Explode every `*.zip` under `dir` (recursively) into one row per
    * file entry. Directory entries are skipped. Entry sizes come from the
    * decompressed bytes, not the zip header (headers may carry -1 for
    * streamed archives).
    *
    * Scale: each archive is a single `binaryFile` row, so memory per task
    * is one archive + its largest entry; thousands of shard archives
    * extract embarrassingly parallel. Entries stream in archive order —
    * no random access, so this also reads non-seekable object-store
    * copies.
    */
  def zipEntries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .option("recursiveFileLookup", true)
      .load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (path, bytes) =>
          val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
          Iterator.continually(zin.getNextEntry)
            .takeWhile(_ != null)
            .filterNot(_.isDirectory)
            .map { e =>
              val content = zin.readAllBytes()
              ZipEntryRow(path, e.getName, content.length.toLong, content)
            }
        }
      }
      .toDF()
  }

  /** Explode every `*.tar` under `dir` (recursively) into one row per
    * file entry — the WebDataset shard format multimodal training data
    * ships in (a 100 TB image/audio corpus is tar shards of paired
    * files, not zips). Same scale shape as [[zipEntries]]: one
    * `binaryFile` row per shard, entries exploded per-partition,
    * nothing leaves the executor that scanned it.
    *
    * Parser: POSIX ustar 512-byte headers read sequentially (name +
    * ustar prefix field for long paths, octal or GNU base-256 sizes,
    * checksum-verified), GNU 'L' long-name extensions and pax ('x')
    * `path=` records honored (bsdtar and Python tarfile emit pax by
    * default, so >100-char paths arrive that way), pax 'g' globals and
    * directory entries skipped. No external tar dependency — the JDK
    * ships none.
    */
  def tarEntries(spark: SparkSession, dir: String,
      maxShardBytes: Long = MaxShardBytes): DataFrame =
    tarEntriesOrdered(spark, dir, maxShardBytes).drop("ord")

  /** Largest shard a single `binaryFile` row can hold: the JVM array
    * ceiling (minus slack). WebDataset shards are conventionally ~1 GiB,
    * well inside it; a mis-packed multi-TB "shard" must fail the listing
    * check below with a clear message, never an executor OOM.
    */
  val MaxShardBytes: Long = Int.MaxValue.toLong - 512

  /** [[tarEntries]] plus a per-archive member ordinal in tar order —
    * the tie-breaker duplicate member names need (duplicates are legal
    * in tar; last occurrence wins on extraction, like every tar tool).
    */
  private[graft] def tarEntriesOrdered(spark: SparkSession, dir: String,
      maxShardBytes: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val shards = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .option("recursiveFileLookup", true)
      .load(dir)
    // size guard BEFORE any content is read: selecting path+length only
    // prunes the content column, so this is a metadata listing, O(files)
    val cap = math.min(maxShardBytes, MaxShardBytes)
    val oversized = shards.select("path", "length")
      .where(col("length") > cap).limit(3)
      .collect()
    require(oversized.isEmpty,
      s"tar shard(s) exceed the $cap-byte single-task limit (WebDataset " +
        "shards are conventionally ~1 GiB; repack oversized shards): " +
        oversized.map(r => s"${r.getString(0)} (${r.getLong(1)} B)")
          .mkString(", "))
    shards.select("path", "content").as[(String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (path, bytes) =>
          parseTar(path, bytes).zipWithIndex.map { case (e, i) =>
            (e.archive, e.entry, i.toLong, e.size, e.content)
          }
        }
      }
      .toDF("archive", "entry", "ord", "size", "content")
  }

  /** WebDataset sample grouping: tar entries whose names share a stem
    * (`dir/sample.jpg` + `dir/sample.json` + `dir/sample.cls` form ONE
    * training sample) regrouped as `(archive, sample, files: ext →
    * bytes)` — the unit a multimodal training loader consumes. Shuffles
    * on (archive, sample[, ext]); samples are few-file-sized, so the
    * map never grows beyond a sample's own members.
    */
  def webdatasetSamples(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // WebDataset convention: the stem/extension split is at the FIRST
    // dot of the BASENAME — "dir/sample.seg.png" pairs with
    // "dir/sample.json" under stem "dir/sample" (ext "seg.png"). A
    // last-dot split would scatter multi-part extensions into different
    // samples, and a dotted directory ("dir.v2/README") would donate a
    // bogus ext containing '/'. Basenames with no dot cannot pair.
    // ext is [^/]+ — NOT .+ — or backtracking would let a dotted
    // directory match ("dir.v2/README" → stem "dir", ext "v2/readme")
    val split = "^((?:[^/]*/)*[^/.]+)\\.([^/]+)$"
    val entries = tarEntriesOrdered(spark, dir, MaxShardBytes)
      .withColumn("sample", regexp_extract(col("entry"), split, 1))
      .withColumn("ext", lower(regexp_extract(col("entry"), split, 2)))
      .where(col("sample") =!= "") // no-dot basenames: unpaired, dropped
    // duplicate member names are legal in tar; map_from_entries throws
    // on duplicate keys (default EXCEPTION dedup policy), failing the
    // whole job for one re-packed shard — keep the last tar occurrence
    // per (archive, sample, ext) first, like extraction would
    entries
      .groupBy(col("archive"), col("sample"), col("ext"))
      .agg(max_by(col("content"), col("ord")).as("content"))
      .groupBy(col("archive"), col("sample"))
      .agg(map_from_entries(collect_list(struct(col("ext"), col("content"))))
        .as("files"))
  }

  /** Export `(sample, files: ext → bytes)` rows — [[webdatasetSamples]]'s
    * shape — as POSIX-ustar tar shards under `outDir`: the WebDataset
    * format training loaders stream, completing the round trip the
    * reader above starts. Each task packs its partition into
    * `shard-<partition>-<seq>.tar`, rolling to a new shard every
    * `samplesPerShard` samples or when the next sample would push the
    * shard past `maxShardBytes` — shard size stays bounded regardless
    * of input partitioning, and a large export is embarrassingly
    * parallel: sample bytes never move between executors, and the
    * driver sees only shard counts. A sample's members are written
    * contiguously in ext order (the adjacency streaming WebDataset
    * readers rely on — they cut samples at stem boundaries). Headers
    * are checksummed ustar with prefix-split long names and a fixed
    * zero mtime, so identical input partitions produce byte-identical
    * shards, and [[tarEntries]]/[[webdatasetSamples]] read them back
    * verbatim.
    *
    * Commit protocol: tasks write into an attempt-unique temp directory
    * (`_tmp-wds-&lt;ts&gt;/attempt-&lt;id&gt;`) and the DRIVER renames exactly the
    * files of each partition's winning attempt into place, then deletes
    * the temp tree. Writing final names from tasks directly would break
    * under retries and speculation: the shuffle's within-partition row
    * order is not stable across attempts, so a retry can legally pack
    * the same rows into FEWER shards, leaving a dead attempt's extra
    * `shard-xxxxx-0003.tar` alive next to the new set (silent duplicate
    * samples), and two speculative attempts would interleave bytes into
    * one open file.
    *
    * @return number of shards written
    */
  def writeWebDataset(samples: DataFrame, outDir: String,
      samplesPerShard: Int = 1000,
      maxShardBytes: Long = 1L << 30): Long = {
    val spark = samples.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    require(samplesPerShard > 0, "samplesPerShard must be positive")
    val confMap = spark.sessionState.newHadoopConf().asScala
      .map(e => e.getKey -> e.getValue).toMap
    val confBc = spark.sparkContext.broadcast(confMap)
    val tmpName = s"_tmp-wds-${System.nanoTime()}"
    val committed = samples
      .select(col("sample").cast("string"), col("files"))
      .as[(String, Map[String, Array[Byte]])]
      .mapPartitions { rows =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val root = new Path(outDir)
        val fs = FileSystem.get(root.toUri, conf)
        val ctx = org.apache.spark.TaskContext.get()
        val part = ctx.partitionId()
        // attempt-unique staging dir: concurrent speculative attempts
        // and retries never touch each other's files (see scaladoc)
        val attemptDir = new Path(root, s"$tmpName/attempt-${ctx.taskAttemptId()}")
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var seq = 0
        var inShard = 0
        var shardBytes = 0L
        var shards = 0L
        def closeShard(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // two zero end-of-archive blocks
          out.close()
          out = null
        }
        def openShard(): Unit = {
          out = fs.create(new Path(attemptDir, f"shard-$part%05d-$seq%04d.tar"), true)
          seq += 1; inShard = 0; shardBytes = 0L; shards += 1
        }
        rows.foreach { case (sample, files) =>
          val members = files.toSeq.sortBy(_._1)
            .map { case (ext, bytes) => (s"$sample.$ext", bytes) }
          val sampleBytes = members.iterator
            .map { case (_, b) => 512L + (b.length + 511L) / 512 * 512 }.sum
          // roll BETWEEN samples only — a sample never splits across
          // shards (the WebDataset pairing contract)
          if (out == null || inShard >= samplesPerShard ||
              (inShard > 0 && shardBytes + sampleBytes + 1024 > maxShardBytes)) {
            closeShard(); openShard()
          }
          members.foreach { case (name, bytes) =>
            out.write(tarHeader(name, bytes.length.toLong))
            out.write(bytes)
            val pad = ((bytes.length + 511) / 512 * 512 - bytes.length).toInt
            if (pad > 0) out.write(new Array[Byte](pad))
          }
          shardBytes += sampleBytes
          inShard += 1
        }
        closeShard()
        Iterator.single((part, ctx.taskAttemptId(), shards))
      }
      .collect() // one row per partition: its WINNING attempt + shard count
    // driver-side commit: move exactly the winners' files into place,
    // then drop the temp tree (losing attempts' files go with it)
    val root = new Path(outDir)
    val fs = FileSystem.get(root.toUri, spark.sessionState.newHadoopConf())
    var total = 0L
    val committedNames = Set.newBuilder[String]
    committed.foreach { case (part, attempt, n) =>
      (0 until n.toInt).foreach { seq =>
        val name = f"shard-$part%05d-$seq%04d.tar"
        committedNames += name
        val src = new Path(root, s"$tmpName/attempt-$attempt/$name")
        val dst = new Path(root, name)
        if (fs.exists(dst)) fs.delete(dst, false) // rerun over old output
        require(fs.rename(src, dst), s"commit rename failed: $src -> $dst")
      }
      total += n
    }
    // a rerun into the same outDir only overwrites COLLIDING names: a
    // previous, larger run's higher-numbered shards would otherwise
    // survive next to the new set and a downstream read of the
    // directory returns stale samples alongside the fresh ones — the
    // cross-run form of the duplicate-sample hazard the attempt
    // protocol above exists to prevent. Sweep shard-named files this
    // commit did not produce.
    val mine = committedNames.result()
    val ShardName = "shard-\\d{5}-\\d{4}\\.tar".r
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isFile && ShardName.matches(name) && !mine.contains(name))
        fs.delete(st.getPath, false)
    }
    fs.delete(new Path(root, tmpName), true)
    total
  }

  /** One 512-byte POSIX-ustar header [[parseTar]] accepts back: octal
    * C-string numerics, `ustar`+"00" magic, the checksum computed with
    * its own field as spaces, and names over 100 bytes split at a '/'
    * into the 155-byte prefix field. mtime is fixed at zero — shard
    * bytes are a function of shard contents alone.
    */
  private[graft] def tarHeader(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    def octal(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val digits = len - 1 // NUL-terminated
      require(s.length <= digits, s"value $v overflows $digits octal digits")
      val padded = "0" * (digits - s.length) + s
      System.arraycopy(padded.getBytes("US-ASCII"), 0, h, off, digits)
    }
    val nameBytes = name.getBytes("UTF-8")
    if (nameBytes.length <= 100) {
      System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    } else {
      // split at a '/' with suffix ≤ 100 and prefix ≤ 155; the reader
      // rejoins them as "<prefix>/<suffix>"
      val cut = (math.max(1, nameBytes.length - 101) to
          math.min(155, nameBytes.length - 2))
        .find(i => nameBytes(i) == '/')
        .getOrElse(throw new IllegalArgumentException(
          s"entry name too long for a ustar header (no viable '/' " +
            s"split ≤155/≤100): $name"))
      System.arraycopy(nameBytes, 0, h, 345, cut)
      System.arraycopy(nameBytes, cut + 1, h, 0, nameBytes.length - cut - 1)
    }
    octal(0x1a4, 100, 8) // mode 0644
    octal(0, 108, 8) // uid
    octal(0, 116, 8) // gid
    octal(size, 124, 12)
    octal(0, 136, 12) // mtime: fixed for reproducible shards
    h(156) = '0' // regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0' // version "00"
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy(("0" * (6 - cs.length) + cs).getBytes("US-ASCII"),
      0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }

  private[graft] def parseTar(archive: String,
      bytes: Array[Byte]): Iterator[ZipEntryRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntryRow]
    var off = 0
    var pendingLongName: Option[String] = None
    def cstr(start: Int, len: Int): String = {
      var end = start
      val stop = start + len
      while (end < stop && bytes(end) != 0) end += 1
      new String(bytes, start, end - start, "UTF-8")
    }
    // pax extended-header data: records are "<len> <key>=<value>\n"
    // where <len> counts the WHOLE record in bytes (length digits,
    // space, and trailing newline included); values are UTF-8, so all
    // offsets stay byte-based. Only the path record matters here —
    // skipping it would silently fall back to the truncated 100-char
    // ustar name and mispair WebDataset samples with no error.
    def paxPath(start: Int, len: Int): Option[String] = {
      var p = start
      val stop = start + len
      var path: Option[String] = None
      while (p < stop) {
        var sp = p
        while (sp < stop && bytes(sp) != ' ') sp += 1
        require(sp < stop, s"malformed pax record at offset $p in $archive")
        val recLen = java.lang.Integer.parseInt(
          new String(bytes, p, sp - p, "US-ASCII").trim)
        require(recLen > 0 && p + recLen <= stop,
          s"malformed pax record length $recLen at offset $p in $archive")
        val rec = new String(bytes, sp + 1, p + recLen - sp - 2, "UTF-8")
        val eq = rec.indexOf('=')
        if (eq >= 0 && rec.substring(0, eq) == "path")
          path = Some(rec.substring(eq + 1))
        p += recLen
      }
      path
    }
    def num(start: Int, len: Int): Long = {
      // GNU base-256 (high bit of first byte set) or octal C-string
      if ((bytes(start) & 0x80) != 0) {
        var v = (bytes(start) & 0x7f).toLong
        var i = start + 1
        while (i < start + len) { v = (v << 8) | (bytes(i) & 0xff); i += 1 }
        v
      } else {
        val s = cstr(start, len).trim
        if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
      }
    }
    while (off + 512 <= bytes.length && bytes(off) != 0) {
      val size = num(off + 124, 12)
      val typeflag = bytes(off + 156).toChar
      // header checksum: bytes summed with the checksum field as spaces
      val stored = num(off + 148, 8)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(off + i) & 0xff)
        i += 1
      }
      require(sum == stored,
        s"tar header checksum mismatch at offset $off in $archive")
      // a truncated shard (upload cut off mid-entry) must fail LOUDLY:
      // copyOfRange past the array end silently zero-pads, which would
      // hand downstream loaders full-size members of NUL bytes
      require(off + 512 + size <= bytes.length,
        s"truncated tar entry at offset $off in $archive: header claims " +
          s"$size data bytes, only ${bytes.length - off - 512} remain")
      val dataLen = ((size + 511) / 512 * 512).toInt
      val name = pendingLongName.getOrElse {
        val base = cstr(off, 100)
        val prefix = cstr(off + 345, 155) // ustar long-path prefix
        if (prefix.nonEmpty) s"$prefix/$base" else base
      }
      pendingLongName = None
      typeflag match {
        case 'L' => // GNU long name: data block holds the real name
          pendingLongName =
            Some(new String(bytes, off + 512, size.toInt, "UTF-8")
              .takeWhile(_ != 0))
        case 'x' => // pax extended header: its path record names the NEXT
          // entry, overriding the (possibly truncated) ustar name —
          // same pending-name mechanism as the GNU 'L' case
          paxPath(off + 512, size.toInt)
            .foreach(p => pendingLongName = Some(p))
        case c if c == '0' || c == 0.toChar => // regular file (old tars use NUL)
          val content = java.util.Arrays.copyOfRange(
            bytes, off + 512, off + 512 + size.toInt)
          out += ZipEntryRow(archive, name, size, content)
        case _ => () // directories, pax globals, links: skip data
      }
      off += 512 + dataLen
    }
    out.iterator
  }

  /** Reject archive member names that would write outside the extraction
    * root (zip-slip): absolute paths, drive-letter paths, and any `..`
    * traversal that escapes the root. Downloaded CI artifacts are not
    * trusted input — a tampered archive must fail the job loudly, never
    * place a file. Returns the normalized relative path.
    */
  private[graft] def sanitizeEntry(entry: String): String = {
    val p = entry.replace('\\', '/')
    require(!p.startsWith("/") && !p.matches("^[A-Za-z]:.*"),
      s"zip entry has an absolute path (zip-slip): $entry")
    // normalize while checking: interior ".." collapses against the
    // tracked depth, so the returned path never carries literal ".."
    // segments (which would become phantom key components on object
    // stores and parent-resolution hazards on local filesystems)
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    p.split("/").foreach {
      case "" | "." => ()
      case ".." =>
        require(segs.nonEmpty, s"zip entry escapes the extraction root: $entry")
        segs.remove(segs.length - 1)
      case s => segs += s
    }
    require(segs.nonEmpty, s"zip entry resolves to the extraction root: $entry")
    segs.mkString("/")
  }

  /** Extract every archive under `zipDir` into
    * `outDir/<archive-stem>/<entry-path>` — one subdirectory per
    * archive, mirroring the reference's `artifacts/<segment>/` layout.
    * Returns the number of entries written. After staging, the S4 tree
    * readers ([[Sources.parquetTree]]) consume `outDir` directly
    * (they recurse).
    *
    * Writes happen executor-side through Hadoop `FileSystem`, so the
    * target can be any supported scheme; the session's Hadoop conf is
    * shipped as a plain map (the executors rebuild it) because the
    * extraction tasks, not the driver, own the I/O.
    *
    * Safety: entry names are [[sanitizeEntry]]-checked (zip-slip — CI
    * artifacts are not trusted input), and the per-archive subdirectory
    * makes identically-named entries ACROSS archives collide never
    * (a flat layout would crown a task-scheduling-dependent winner;
    * a create-without-overwrite check is check-then-create and races
    * across parallel extraction tasks). Within one archive, later
    * entries deterministically overwrite earlier same-named ones, like
    * every unzip tool.
    */
  def extractTo(spark: SparkSession, zipDir: String, outDir: String): Long = {
    import spark.implicits._
    val confMap = spark.sessionState.newHadoopConf().asScala
      .map(e => e.getKey -> e.getValue).toMap
    val confBc = spark.sparkContext.broadcast(confMap)
    // stem = the archive's zipDir-RELATIVE path (recursive lookup finds
    // same-named archives in different subtrees; a basename-only stem
    // would collide them right back into a scheduling race). Both sides
    // are FileSystem-qualified before the prefix compare: a relative
    // zipDir or a scheme/authority mismatch with the listing's paths
    // would silently defeat a raw string prefix (re-introducing the
    // cross-subtree collision), and java.net.URI parsing rejects legal
    // paths containing spaces.
    val zipRootQ = {
      val p = new Path(zipDir)
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .makeQualified(p).toString.stripSuffix("/")
    }
    val written = zipEntries(spark, zipDir)
      .select("archive", "entry", "content")
      .as[(String, String, Array[Byte])]
      .mapPartitions { rows =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val out = new Path(outDir)
        val fs = FileSystem.get(out.toUri, conf)
        var written = 0L
        rows.foreach { case (archive, entry, content) =>
          val ap = new Path(archive)
          val apQ = FileSystem.get(ap.toUri, conf).makeQualified(ap).toString
          val rel =
            if (apQ.startsWith(zipRootQ + "/")) apQ.stripPrefix(zipRootQ + "/")
            else ap.getName
          val stem = rel.stripSuffix(".zip")
          val target = new Path(out, s"$stem/${sanitizeEntry(entry)}")
          val os = fs.create(target, true)
          try os.write(content) finally os.close()
          written += 1
        }
        Iterator.single(written)
      }
      .toDF("n")
    // agg with a 0 default: Dataset.reduce throws on an empty plan (zero
    // matching archives)
    written.agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("n"),
        org.apache.spark.sql.functions.lit(0L)))
      .head().getLong(0)
  }
}
