package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.jdk.CollectionConverters._

import graft.io.{Retention, Sources, Staging}

class StagingSpec extends SparkSuite {

  private def writeZip(path: String, entries: Seq[(String, Array[Byte])],
      withDirEntry: Boolean = false): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    if (withDirEntry) { zos.putNextEntry(new ZipEntry("sub/")); zos.closeEntry() }
    entries.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
  }

  test("zipEntries explodes archives into file entries, skipping directories") {
    val dir = Files.createTempDirectory("graft-zips").toString
    writeZip(s"$dir/a.zip",
      Seq("x.txt" -> "hello".getBytes, "sub/y.txt" -> "world!".getBytes),
      withDirEntry = true)
    writeZip(s"$dir/b.zip", Seq("z.bin" -> Array[Byte](0, 1, 2, 3)))
    val rows = Staging.zipEntries(spark, dir)
      .collect().map(r => (r.getString(0).split("/").last, r.getString(1),
        r.getLong(2), r.getAs[Array[Byte]](3))).toSeq
    assert(rows.map(r => (r._1, r._2, r._3)).toSet === Set(
      ("a.zip", "x.txt", 5L), ("a.zip", "sub/y.txt", 6L), ("b.zip", "z.bin", 4L)))
    val byEntry = rows.map(r => r._2 -> r._4).toMap
    assert(new String(byEntry("x.txt")) === "hello")
    assert(byEntry("z.bin").toSeq === Seq[Byte](0, 1, 2, 3))
  }

  test("extractTo stages zipped parquet shards that parquetTree then reads back") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-stage")
    val src = s"$work/src"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartition(2).write.parquet(src)
    // zip the shard directory the way the reference zips run artifacts
    val zipDir = s"$work/zips"
    Files.createDirectories(Paths.get(zipDir))
    val parts = Files.list(Paths.get(src)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    writeZip(s"$zipDir/run1.zip",
      parts.map(p => s"shards/${p.getFileName}" -> Files.readAllBytes(p)))
    val out = s"$work/staged"
    val n = Staging.extractTo(spark, zipDir, out)
    assert(n === parts.size.toLong)
    val back = Sources.parquetTree(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("extractTo rejects zip-slip entries and never places the file") {
    val work = Files.createTempDirectory("graft-slip")
    val zipDir = s"$work/zips"
    Files.createDirectories(Paths.get(zipDir))
    writeZip(s"$zipDir/evil.zip", Seq(
      "ok.txt" -> "fine".getBytes,
      "../escape.txt" -> "pwned".getBytes))
    val out = s"$work/staged"
    val e = intercept[org.apache.spark.SparkException] {
      Staging.extractTo(spark, zipDir, out)
    }
    assert(e.getMessage.contains("escapes the extraction root") ||
      Option(e.getCause).exists(_.getMessage.contains("escapes the extraction root")),
      e.getMessage)
    assert(!Files.exists(Paths.get(s"$work/escape.txt")))
    // sanitizer unit cases: absolute and root-resolving names refused;
    // depth-legal interior ".." normalizes away (never a literal key part)
    intercept[IllegalArgumentException](Staging.sanitizeEntry("/abs.txt"))
    intercept[IllegalArgumentException](Staging.sanitizeEntry("C:\\win.txt"))
    intercept[IllegalArgumentException](Staging.sanitizeEntry("a/.."))
    assert(Staging.sanitizeEntry("a/../b.txt") === "b.txt")
    assert(Staging.sanitizeEntry("a/./b//c.txt") === "a/b/c.txt")
  }

  test("extractTo returns 0 on an empty dir; same-named entries across archives both land") {
    val work = Files.createTempDirectory("graft-coll")
    val empty = s"$work/none"
    Files.createDirectories(Paths.get(empty))
    assert(Staging.extractTo(spark, empty, s"$work/out0") === 0L)
    val zipDir = s"$work/zips"
    Files.createDirectories(Paths.get(zipDir))
    writeZip(s"$zipDir/r1.zip", Seq("shards/part.txt" -> "a".getBytes))
    writeZip(s"$zipDir/r2.zip", Seq("shards/part.txt" -> "b".getBytes))
    // same ARCHIVE name in different subtrees (recursive lookup): the
    // zipDir-relative stem must keep them apart too
    Files.createDirectories(Paths.get(s"$zipDir/runA"))
    Files.createDirectories(Paths.get(s"$zipDir/runB"))
    writeZip(s"$zipDir/runA/r1.zip", Seq("shards/part.txt" -> "c".getBytes))
    writeZip(s"$zipDir/runB/r1.zip", Seq("shards/part.txt" -> "d".getBytes))
    // per-archive subdirectories: no scheduling-dependent winner possible
    assert(Staging.extractTo(spark, zipDir, s"$work/out1") === 4L)
    assert(new String(Files.readAllBytes(
      Paths.get(s"$work/out1/r1/shards/part.txt"))) === "a")
    assert(new String(Files.readAllBytes(
      Paths.get(s"$work/out1/r2/shards/part.txt"))) === "b")
    assert(new String(Files.readAllBytes(
      Paths.get(s"$work/out1/runA/r1/shards/part.txt"))) === "c")
    assert(new String(Files.readAllBytes(
      Paths.get(s"$work/out1/runB/r1/shards/part.txt"))) === "d")
  }

  test("extractTo keeps subtree stems for spaced and relative zipDir paths") {
    // a path with a space crashed the old java.net.URI parse, and a
    // relative zipDir defeated the raw string-prefix relativization
    // (silently falling back to colliding basename stems)
    val work = Files.createTempDirectory("graft-sp ace")
    val zipDir = s"$work/zips"
    Files.createDirectories(Paths.get(s"$zipDir/runA"))
    Files.createDirectories(Paths.get(s"$zipDir/runB"))
    writeZip(s"$zipDir/runA/r1.zip", Seq("p.txt" -> "a".getBytes))
    writeZip(s"$zipDir/runB/r1.zip", Seq("p.txt" -> "b".getBytes))
    assert(Staging.extractTo(spark, zipDir, s"$work/out") === 2L)
    assert(new String(Files.readAllBytes(
      Paths.get(s"$work/out/runA/r1/p.txt"))) === "a")
    assert(new String(Files.readAllBytes(
      Paths.get(s"$work/out/runB/r1/p.txt"))) === "b")

    // relative zipDir (no ".." — Hadoop Path qualifies against the fs
    // working directory but keeps ".." literal): FileSystem
    // qualification must still match the listing's fully-qualified
    // archive paths → subtree stems survive
    val relRoot = "target/graft-stage-rel"
    Files.createDirectories(Paths.get(s"$relRoot/zips/runA"))
    Files.createDirectories(Paths.get(s"$relRoot/zips/runB"))
    writeZip(s"$relRoot/zips/runA/r1.zip", Seq("p.txt" -> "a".getBytes))
    writeZip(s"$relRoot/zips/runB/r1.zip", Seq("p.txt" -> "b".getBytes))
    assert(Staging.extractTo(spark, s"$relRoot/zips", s"$work/out2") === 2L)
    assert(new String(Files.readAllBytes(
      Paths.get(s"$work/out2/runA/r1/p.txt"))) === "a")
    assert(new String(Files.readAllBytes(
      Paths.get(s"$work/out2/runB/r1/p.txt"))) === "b")
  }

  test("tarEntries parses ustar shards; webdatasetSamples pairs by stem") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-tar")
    val longName = "deeply/nested/webdataset/sample-with-a-very-long-key-0001.json"
    Files.write(Paths.get(s"$work/shard0.tar"), TarFixtures.tarBytes(Seq(
      ("s1.jpg", Array[Byte](1, 2, 3), '0'),
      ("s1.json", """{"label": 7}""".getBytes, '0'),
      ("somedir/", Array.emptyByteArray, '5'),          // directory: skipped
      ("s2.jpg", Array[Byte](9, 8, 7, 6), '0'),
      ("s2.json", """{"label": 1}""".getBytes, '0'),
      ("README", "no extension".getBytes, '0'),         // unpaired, no ext
      ("././@LongLink", (longName + 0.toChar).getBytes, 'L'), // GNU long name
      ("ignored-short-name", "pix".getBytes, '0'))))    // gets longName

    val entries = Staging.tarEntries(spark, work.toString)
      .select($"entry", $"size").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(entries === Map(
      "s1.jpg" -> 3L, "s1.json" -> 12L, "s2.jpg" -> 4L, "s2.json" -> 12L,
      "README" -> 12L, longName -> 3L))

    val samples = Staging.webdatasetSamples(spark, work.toString)
      .select($"sample", $"files").collect()
      .map(r => r.getString(0) ->
        r.getMap[String, Array[Byte]](1).toMap.map { case (k, v) => k -> v.length })
      .toMap
    // README (no extension) is excluded; the long-name json forms its
    // own single-file sample under the full nested stem
    assert(samples.keySet === Set("s1", "s2",
      longName.stripSuffix(".json")))
    assert(samples("s1") === Map("jpg" -> 3, "json" -> 12))
    assert(samples("s2") === Map("jpg" -> 4, "json" -> 12))
    assert(samples(longName.stripSuffix(".json")) === Map("json" -> 3))
  }

  test("webdatasetSamples splits at the first dot of the basename") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-tar-dots")
    Files.write(Paths.get(s"$work/shard0.tar"), TarFixtures.tarBytes(Seq(
      ("d/s1.jpg", Array[Byte](1, 2), '0'),
      ("d/s1.seg.png", Array[Byte](3, 4, 5), '0'), // multi-part extension
      ("d/s1.json", """{"l":1}""".getBytes, '0'),
      ("dir.v2/README", "no dot in basename".getBytes, '0'), // dotted DIR
      ("d/.hidden", "leading dot".getBytes, '0')))) // empty stem: unpaired
    val samples = Staging.webdatasetSamples(spark, work.toString)
      .select($"sample", $"files").collect()
      .map(r => r.getString(0) ->
        r.getMap[String, Array[Byte]](1).toMap.map { case (k, v) => k -> v.length })
      .toMap
    // the last-dot split scattered s1.seg.png into a phantom "d/s1.seg"
    // sample and gave dir.v2/README a bogus "v2/readme" extension
    assert(samples.keySet === Set("d/s1"))
    assert(samples("d/s1") ===
      Map("jpg" -> 2, "seg.png" -> 3, "json" -> 7))
  }

  test("parseTar applies pax extended-header path records") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-tar-pax")
    // pax record: "<len> path=<value>\n" with <len> counting the whole
    // record — the self-referential length needs a fixed point
    val longPath = "deep/" + ("p" * 110) + "/sample-0001.json"
    def record(key: String, value: String): String = {
      val body = s" $key=$value\n"
      var len = body.length // digits not counted yet
      while (s"$len$body".length != len) len = s"$len$body".length
      s"$len$body"
    }
    val pax = (record("mtime", "1700000000.0") +
      record("path", longPath)).getBytes("UTF-8")
    Files.write(Paths.get(s"$work/shard0.tar"), TarFixtures.tarBytes(Seq(
      ("PaxHeaders.0/sample-0001.json", pax, 'x'),
      ("deep/truncated-fallback-name", """{"l":9}""".getBytes, '0'),
      ("plain.txt", "after".getBytes, '0')))) // pax must not leak forward
    val entries = Staging.tarEntries(spark, work.toString)
      .select($"entry", $"size").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(entries === Map(longPath -> 7L, "plain.txt" -> 5L))
  }

  test("duplicate tar member names keep the last occurrence per sample") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-tar-dup")
    // duplicate names are legal in tar (append/update); extraction is
    // last-wins — map_from_entries alone would throw EXCEPTION here
    Files.write(Paths.get(s"$work/shard0.tar"), TarFixtures.tarBytes(Seq(
      ("s1.json", """{"v":"stale"}""".getBytes, '0'),
      ("s1.jpg", Array[Byte](1), '0'),
      ("s1.json", """{"v":"fresh"}""".getBytes, '0'))))
    val samples = Staging.webdatasetSamples(spark, work.toString)
      .select($"sample", $"files").collect()
      .map(r => r.getString(0) -> r.getMap[String, Array[Byte]](1).toMap)
      .toMap
    assert(samples.keySet === Set("s1"))
    assert(new String(samples("s1")("json")) === """{"v":"fresh"}""")
    assert(samples("s1")("jpg").toSeq === Seq[Byte](1))
  }

  test("writeWebDataset round-trips samples through the tar reader") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-wds-write")
    val longStem = "deeply/nested/export/" + ("x" * 90) + "/sample-0003"
    val samples = Seq(
      ("a/s1", Map("jpg" -> Array[Byte](1, 2, 3), "json" -> """{"l":1}""".getBytes)),
      ("a/s2", Map("jpg" -> Array[Byte](9, 8), "cls" -> "4".getBytes)),
      (longStem, Map("json" -> """{"l":9}""".getBytes)) // >100-char entry: prefix split
    ).toDF("sample", "files").repartition(1).sortWithinPartitions($"sample")
    val shards = Staging.writeWebDataset(samples, out.toString)
    assert(shards === 1L)
    val back = Staging.webdatasetSamples(spark, out.toString)
      .select($"sample", $"files").collect()
      .map(r => r.getString(0) ->
        r.getMap[String, Array[Byte]](1).toMap.map { case (k, v) => k -> v.toSeq })
      .toMap
    assert(back.keySet === Set("a/s1", "a/s2", longStem))
    assert(back("a/s1") === Map("jpg" -> Seq[Byte](1, 2, 3),
      "json" -> """{"l":1}""".getBytes.toSeq))
    assert(back("a/s2") === Map("jpg" -> Seq[Byte](9, 8),
      "cls" -> "4".getBytes.toSeq))
    assert(back(longStem) === Map("json" -> """{"l":9}""".getBytes.toSeq))
    // a sample's members sit adjacent in tar order (streaming readers
    // cut at stem boundaries), exts sorted within the sample
    val order = Staging.tarEntries(spark, out.toString)
      .select($"entry").collect().map(_.getString(0)).toSeq
    assert(order === Seq("a/s1.jpg", "a/s1.json", "a/s2.cls", "a/s2.jpg",
      s"$longStem.json"))
  }

  test("writeWebDataset rerun sweeps stale shards from a previous larger run") {
    import spark.implicits._
    // run 1 commits two shards; run 2 (fewer samples) produces one —
    // the commit must not leave run 1's higher-numbered shard next to
    // the new set, or a directory read returns stale samples alongside
    // fresh ones (the cross-run form of the duplicate-sample hazard
    // the attempt protocol prevents within a run)
    val out = Files.createTempDirectory("graft-wds-rerun")
    def samples(n: Int) = (0 until n)
      .map(i => (f"s$i%02d", Map("cls" -> i.toString.getBytes)))
      .toDF("sample", "files").repartition(1).sortWithinPartitions($"sample")
    assert(Staging.writeWebDataset(samples(4), out.toString,
      samplesPerShard = 2) === 2L)
    assert(Staging.writeWebDataset(samples(2), out.toString,
      samplesPerShard = 2) === 1L)
    val names = out.toFile.listFiles().map(_.getName).filter(_.endsWith(".tar")).toSet
    assert(names === Set("shard-00000-0000.tar"), names.toString)
    val back = Staging.webdatasetSamples(spark, out.toString)
      .select($"sample").collect().map(_.getString(0)).toSet
    assert(back === Set("s00", "s01"))
  }

  test("writeWebDataset shards parse with the host tar when one is present") {
    import spark.implicits._
    // the round-trip test validates the writer only against the
    // IN-HOUSE reader, which could tolerate malformed headers a real
    // tar rejects — verify a written shard with the external binary
    // (skipped silently where unavailable, like the GNU-tar read test)
    val out = Files.createTempDirectory("graft-wds-ext")
    val samples = Seq(
      ("a/s1", Map("jpg" -> Array[Byte](1, 2, 3), "json" -> """{"l":1}""".getBytes)),
      ("a/s2", Map("jpg" -> Array[Byte](9, 8), "cls" -> "4".getBytes)))
      .toDF("sample", "files").repartition(1).sortWithinPartitions($"sample")
    assert(Staging.writeWebDataset(samples, out.toString) === 1L)
    val shard = Files.list(out).iterator().asScala
      .map(_.toString).filter(_.endsWith(".tar")).toSeq.head
    val listing = Files.createTempFile("wds-ext", ".txt")
    val rc = try new ProcessBuilder("tar", "-tf", shard)
        .redirectOutput(listing.toFile).start().waitFor()
      catch { case _: java.io.IOException => -1 }
    if (rc >= 0) {
      assert(rc === 0, s"host tar rejected the written shard $shard")
      val entries = Files.readString(listing).split("\n")
        .filter(_.nonEmpty).toSeq
      assert(entries === Seq("a/s1.jpg", "a/s1.json", "a/s2.cls", "a/s2.jpg"),
        entries.toString)
    }
  }

  test("writeWebDataset rolls shards by sample count and never splits a sample") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-wds-roll")
    val samples = (1 to 5).map(i =>
        (f"s$i%02d", Map("jpg" -> Array.fill[Byte](10)(i.toByte),
          "json" -> s"""{"i":$i}""".getBytes)))
      .toDF("sample", "files").repartition(1).sortWithinPartitions($"sample")
    assert(Staging.writeWebDataset(samples, out.toString,
      samplesPerShard = 2) === 3L)
    val perShard = Staging.tarEntries(spark, out.toString)
      .select($"archive", $"entry").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getString(1)).sorted.toSeq).toMap
    assert(perShard.values.toSet === Set(
      Seq("s01.jpg", "s01.json", "s02.jpg", "s02.json"),
      Seq("s03.jpg", "s03.json", "s04.jpg", "s04.json"),
      Seq("s05.jpg", "s05.json")))
    // byte cap: each ~1124-byte sample forces its own shard, but a
    // sample larger than the cap still writes whole (never splits)
    val tight = Files.createTempDirectory("graft-wds-tight")
    assert(Staging.writeWebDataset(samples, tight.toString,
      samplesPerShard = 100, maxShardBytes = 2000L) === 5L)
    assert(Staging.webdatasetSamples(spark, tight.toString).count() === 5L)
  }

  test("a truncated tar entry fails loudly instead of zero-padding") {
    val work = Files.createTempDirectory("graft-tar-trunc")
    val full = TarFixtures.tarBytes(Seq(
      ("s1.json", ("y" * 2000).getBytes, '0')))
    // cut the upload mid-entry: keep the 512-byte header + half the data
    Files.write(Paths.get(s"$work/cut.tar"), full.take(512 + 1000))
    val e = intercept[Exception] {
      Staging.tarEntries(spark, work.toString).collect()
    }
    // copyOfRange would have silently returned 2000 bytes with a
    // zero-filled tail — valid-looking, corrupt training samples
    // (the require surfaces through Spark's task-failure wrapping,
    // so search the cause chain)
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(msgs.exists(_.contains("truncated tar entry")), msgs.mkString(" | "))
  }

  test("tarEntries rejects shards over the size cap before reading content") {
    val work = Files.createTempDirectory("graft-tar-big")
    Files.write(Paths.get(s"$work/shard0.tar"), TarFixtures.tarBytes(Seq(
      ("s1.json", ("x" * 2000).getBytes, '0'))))
    val e = intercept[IllegalArgumentException] {
      Staging.tarEntries(spark, work.toString, maxShardBytes = 1024L).collect()
    }
    assert(e.getMessage.contains("shard0.tar"))
    assert(e.getMessage.contains("repack"))
    // at the default cap the same shard reads fine
    assert(Staging.tarEntries(spark, work.toString).count() === 1L)
  }

  test("tarEntries reads a GNU-tar-created archive when one is present") {
    // belt-and-braces vs the hand-built fixture: if the host has `tar`,
    // parse its real output too (skipped silently where unavailable)
    val work = Files.createTempDirectory("graft-realtar")
    Files.createDirectories(Paths.get(s"$work/d"))
    Files.write(Paths.get(s"$work/d/a.jpg"), "hello".getBytes)
    Files.write(Paths.get(s"$work/d/a.json"), """{"l":1}""".getBytes)
    val rc = try new ProcessBuilder("tar", "-cf", s"$work/real.tar", "-C",
        work.toString, "d").inheritIO().start().waitFor()
      catch { case _: java.io.IOException => -1 }
    if (rc == 0) {
      val entries = Staging.tarEntries(spark, work.toString)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(entries === Map("d/a.jpg" -> 5L, "d/a.json" -> 7L))
      val samples = Staging.webdatasetSamples(spark, work.toString)
        .collect().map(r => r.getString(1)).toSet
      assert(samples === Set("d/a"))
    }
  }

  test("tarEntries reads a real pax-format tar with >100-char paths") {
    // bsdtar and Python tarfile default to pax; GNU tar needs the flag.
    // Skipped silently where tar is unavailable, like the GNU test.
    val work = Files.createTempDirectory("graft-paxtar")
    val deep = "d/" + ("n" * 120)
    Files.createDirectories(Paths.get(s"$work/$deep"))
    Files.write(Paths.get(s"$work/$deep/a.json"), """{"l":1}""".getBytes)
    val rc = try new ProcessBuilder("tar", "--format=pax", "-cf",
        s"$work/real.tar", "-C", work.toString, "d").inheritIO().start().waitFor()
      catch { case _: java.io.IOException => -1 }
    if (rc == 0) {
      val entries = Staging.tarEntries(spark, work.toString)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      // without pax path records this read back the 100-char truncation
      assert(entries === Map(s"$deep/a.json" -> 7L))
    }
  }

  test("tarEntries round-trips generated adversarial trees through real tar tools") {
    // Generator-driven parity fuzz (round 9): build a file tree whose
    // names hit every parser boundary — exactly 100 chars (the ustar
    // name field with NO terminating NUL), 101 (forces prefix-split /
    // pax / GNU longname), ~155+100 prefix-boundary nested paths,
    // multibyte UTF-8 (Greek, CJK, astral — byte lengths ≠ char
    // lengths), dotted directories, deep nesting — and content sizes
    // that straddle the 512-byte block padding (0, 511, 512, 513,
    // random). Pack it with EVERY available system tool/format (GNU
    // tar gnu+posix formats, bsdtar's restricted pax), read the
    // archives back through tarEntries, and demand exact (name →
    // bytes) parity with the tree that was packed. The three formats
    // drive the 'L' longname, pax 'x' path-record, ustar prefix and
    // pax 'g' global code paths of parseTar against REAL emitters, not
    // the hand-built fixtures. Tools missing from the host are skipped
    // silently (the fixture tests above still cover the format paths).
    val work = Files.createTempDirectory("graft-tarfuzz")
    val src = Files.createDirectories(Paths.get(s"$work/src"))
    val rng = new scala.util.Random(20260815L)
    val alphabets = Seq("abcdefghij", "αβγδεζηθικ", "数据处理管道测试样本", "𝔞𝔟𝔠𝔡𝔢")
    // surrogate-safe generator: appends whole CODE POINTS, so astral
    // chars never split; an astral overshoot drops the whole pair and
    // pads with 'z'. Boundary-length names (100/101 chars) use the
    // ASCII alphabet — a 101-char CJK component is 303 UTF-8 bytes,
    // past ext4's 255-byte component limit, and could not be staged.
    def nameFrom(a: String, chars: Int): String = {
      val cps = a.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      val sb = new StringBuilder
      while (sb.length < chars) sb.append(cps(rng.nextInt(cps.length)))
      if (sb.length > chars) { sb.setLength(chars - 1); sb.append('z') }
      sb.toString
    }
    def name(chars: Int): String =
      nameFrom(alphabets(rng.nextInt(alphabets.length)), chars)
    val ascii = alphabets.head
    val paths = scala.collection.mutable.ArrayBuffer.empty[String]
    paths += nameFrom(ascii, 100)                   // exact ustar field
    paths += nameFrom(ascii, 101)                   // one past it
    paths += Seq(60, 60, 60).map(nameFrom(ascii, _)).mkString("/") // >155 prefix zone
    paths += s"d.v2/${name(20)}.seg.png"            // dotted dir + multi-ext
    paths += (1 to 8).map(_ => name(10)).mkString("/") // deep nesting
    (1 to 15).foreach { _ =>
      val depth = 1 + rng.nextInt(3)
      paths += (1 to depth).map(_ => name(3 + rng.nextInt(40))).mkString("/")
    }
    val sizes = Seq(0, 511, 512, 513) ++ (1 to paths.size).map(_ => rng.nextInt(4096))
    // a random path can collide with an earlier one's directory (file
    // where a dir exists or vice versa) — first staged wins, the loser
    // is dropped from the truth set (seeded, so the kept set is stable)
    val truth = paths.distinct.zip(sizes).flatMap { case (p, sz) =>
      val bytes = new Array[Byte](sz)
      rng.nextBytes(bytes)
      try {
        val f = Paths.get(s"$src/$p")
        Files.createDirectories(f.getParent)
        Files.write(f, bytes)
        Some(p -> bytes)
      } catch { case _: java.io.IOException => None }
    }.toMap
    assert(truth.size >= 15, s"generator staged only ${truth.size} files")
    // each tool maps (archivePath, srcDir) to its full argv; python3's
    // tarfile (pax by default since 3.8) is the 4th emitter — the one
    // most WebDataset shards in the wild were actually written with
    val tools: Seq[(String, (String, String) => Seq[String])] = Seq(
      "gnu.tar" -> ((a, s) => Seq("tar", "--format=gnu", "-cf", a, "-C", s, ".")),
      "pax.tar" -> ((a, s) => Seq("tar", "--format=posix", "-cf", a, "-C", s, ".")),
      "bsd.tar" -> ((a, s) => Seq("bsdtar", "-cf", a, "-C", s, ".")),
      "py.tar" -> ((a, s) => Seq("python3", "-c",
        "import tarfile, os, sys\n" +
          "os.chdir(sys.argv[2])\n" +
          "with tarfile.open(sys.argv[1], 'w') as t:\n" +
          "    t.add('.')\n", a, s)))
    val packed = tools.flatMap { case (out, argv) =>
      val dir = Files.createDirectories(Paths.get(s"$work/tars_${out.takeWhile(_ != '.')}"))
      val rc = try new ProcessBuilder(argv(s"$dir/$out", src.toString): _*)
        .inheritIO().start().waitFor()
        catch { case _: java.io.IOException => -1 }
      if (rc == 0) Some(out -> dir) else None
    }
    assert(packed.nonEmpty, "no system tar tool available to fuzz against")
    packed.foreach { case (archive, dir) =>
      val got = Staging.tarEntries(spark, dir.toString)
        .collect()
        .map(r => (r.getString(1).stripPrefix("./"), r.getAs[Array[Byte]](3)))
        .toMap
      assert(got.keySet === truth.keySet,
        s"$archive: missing=${(truth.keySet -- got.keySet).take(3)} " +
          s"extra=${(got.keySet -- truth.keySet).take(3)}")
      truth.foreach { case (p, bytes) =>
        assert(java.util.Arrays.equals(got(p), bytes),
          s"$archive: content mismatch for $p (${bytes.length} B)")
      }
    }
  }

  test("WebDataset shard → sample pairing → real image decode, end to end") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-wds-e2e")
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 7 + y * 13 + seed) % 256) * 0x010101)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    Files.write(Paths.get(s"$work/shard0.tar"), TarFixtures.tarBytes(Seq(
      ("s1.png", png(8, 6, 0), '0'),
      ("s1.json", """{"label": 7}""".getBytes, '0'),
      ("s2.png", png(33, 17, 100), '0'),
      ("s2.json", """{"label": 1}""".getBytes, '0'))))
    // the loader-side unit: tar shard → (sample, ext → bytes) map, then
    // the image member feeds the SAME decode plan the multimodal suite
    // runs — the full WebDataset ingestion path in one flow
    val samples = Staging.webdatasetSamples(spark, work.toString)
      .select($"sample", $"files")
    val assets = samples.select(
      org.apache.spark.sql.functions.expr("CAST(substr(sample, 2) AS LONG)")
        .as("asset_id"),
      org.apache.spark.sql.functions.lit("image").as("kind"),
      $"files"("png").as("payload"),
      $"files"("json").cast("string").as("meta"))
    val meta = assets.select($"asset_id", $"meta").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(meta === Map(1L -> """{"label": 7}""", 2L -> """{"label": 1}"""))
    val decoded = graft.ops.Multimodal
      .decode(assets, graft.ops.Multimodal.ImageIoDecoder)
      .orderBy($"asset_id").collect()
    assert((decoded(0).getAs[Int]("width"), decoded(0).getAs[Int]("height"))
      === ((8, 6)))
    assert((decoded(1).getAs[Int]("width"), decoded(1).getAs[Int]("height"))
      === ((33, 17)))
  }

  test("stamped retention keys on name-encoded run times, keeps unstamped") {
    val root = Files.createTempDirectory("graft-retain3")
    val day = 24L * 3600 * 1000
    val now = 1700000000000L // realistic 13-digit epoch millis
    def mk(name: String): Unit = {
      Files.createDirectories(root.resolve(name))
      Files.write(root.resolve(name).resolve("d.txt"), "x".getBytes)
    }
    mk(s"run-${now - 7 * day}")
    mk(s"run-${now - 1 * day}")
    mk("unstamped")
    val deleted = Retention.expireOlderThanStamped(
      spark, root.toString, 5 * day, now)
    assert(deleted.map(_.split("/").last).toSet === Set(s"run-${now - 7 * day}"))
    assert(Files.exists(root.resolve("unstamped"))) // undatable → kept
    mk(s"run-${now - 2 * day}")
    mk(s"run-${now - 3 * day}")
    val kept2 = Retention.keepNewestStamped(spark, root.toString, 2)
    assert(kept2.map(_.split("/").last).toSet === Set(s"run-${now - 3 * day}"))
    assert(Files.exists(root.resolve("unstamped")))
  }

  private def touch(p: Path, mtimeMs: Long): Unit = {
    Files.createDirectories(p)
    Files.write(p.resolve("data.txt"), "x".getBytes)
    p.toFile.setLastModified(mtimeMs)
  }

  test("retention expires children older than the horizon and keeps the rest") {
    val root = Files.createTempDirectory("graft-retain")
    val day = 24L * 3600 * 1000
    val now = 1000L * day
    touch(root.resolve("run_old"), now - 7 * day)
    touch(root.resolve("run_mid"), now - 3 * day)
    touch(root.resolve("run_new"), now - 1 * day)
    val deleted = Retention.expireOlderThan(spark, root.toString, 5 * day, now)
    assert(deleted.map(_.split("/").last).toSet === Set("run_old"))
    assert(Files.exists(root.resolve("run_mid")))
    assert(Files.exists(root.resolve("run_new")))
    assert(!Files.exists(root.resolve("run_old")))
  }

  test("keepNewest retains exactly n children by recency") {
    val root = Files.createTempDirectory("graft-retain2")
    val day = 24L * 3600 * 1000
    val now = 1000L * day
    (1 to 4).foreach(i => touch(root.resolve(s"run$i"), now - i * day))
    val deleted = Retention.keepNewest(spark, root.toString, 2)
    assert(deleted.map(_.split("/").last).toSet === Set("run3", "run4"))
    assert(Files.exists(root.resolve("run1")) && Files.exists(root.resolve("run2")))
    // idempotent: a second pass deletes nothing
    assert(Retention.keepNewest(spark, root.toString, 2).isEmpty)
  }
}
