package graft

/** Minimal ustar writer for test fixtures — the JDK ships no tar
  * support, so archives are built header-by-header (name, octal size,
  * checksum, typeflag). Shared by StagingSpec (parser coverage) and
  * MultimodalSpec (WebDataset → decode integration).
  */
object TarFixtures {

  def tarBytes(entries: Seq[(String, Array[Byte], Char)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data, typeflag) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val b = ((("0" * (len - 1 - s.length)) + s) + 0.toChar)
          .getBytes("US-ASCII")
        System.arraycopy(b, 0, h, off, b.length)
      }
      oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
      oct(data.length.toLong, 124, 12); oct(0, 136, 12)
      h(156) = typeflag.toByte
      System.arraycopy(("ustar" + 0.toChar + "00").getBytes("US-ASCII"),
        0, h, 257, 8)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.map(_ & 0xff).sum.toLong
      val cs = java.lang.Long.toOctalString(sum)
      val csb = ((("0" * (6 - cs.length)) + cs) + 0.toChar + " ")
        .getBytes("US-ASCII")
      System.arraycopy(csb, 0, h, 148, 8)
      out.write(h)
      out.write(data)
      out.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    out.write(new Array[Byte](1024)) // end-of-archive zero blocks
    out.toByteArray
  }
}
