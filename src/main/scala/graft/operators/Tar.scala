package graft.operators

/** POSIX ustar (IEEE 1003.1, "tar") archive ingestion — the other
  * archive shape a crawl/data-drop pipeline receives besides WARC:
  * vendor datasets, wiki dumps, and model-training corpora routinely arrive
  * as `.tar` / `.tar.gz` bundles of text files. Archive bytes in, one
  * row per member out.
  *
  * The walk is pure 512-byte-block framing arithmetic: each header block
  * carries name, octal size, a typeflag, the `ustar` magic, and a
  * checksum (byte sum with the checksum field read as spaces) that is
  * VERIFIED — a torn or bit-flipped archive fails loudly naming the
  * offset, never resyncs. Data blocks are size-padded to 512; two zero
  * blocks end the archive. Gzip (.tar.gz) is absorbed by the same
  * multi-member inflater as WARC ([[Warc.gunzipAll]] passthrough when
  * the magic is absent).
  *
  * Reference context: beyond-reference surface (the reference ingests
  * ticks, not archives); format is the public POSIX.1 ustar layout.
  * TarSpec cross-validates the encoder/decoder against the system `tar`
  * binary (independent implementation, same bytes).
  */
object Tar {

  /** One parsed member. `typeflag` '0' = regular file, '5' = directory. */
  final case class TarEntry(name: String, typeflag: Char, bytes: Array[Byte])

  def parse(fileBytes: Array[Byte]): Vector[TarEntry] = {
    val b = Warc.gunzipAll(fileBytes)
    val out = Vector.newBuilder[TarEntry]
    var o = 0
    def octal(off: Int, len: Int): Long = {
      val s = new String(b, off, len, "US-ASCII")
        .takeWhile(c => c != 0 && c != ' ').trim
      if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
    }
    while (o + 512 <= b.length && b(o) != 0) {
      val stored = octal(o + 148, 8)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) 32 else b(o + i) & 0xff)
        i += 1
      }
      require(sum == stored,
        s"tar header checksum mismatch at offset $o: $sum != $stored")
      val magic = new String(b, o + 257, 5, "US-ASCII")
      require(magic == "ustar", s"not a ustar header at $o: '$magic'")
      val name = new String(b, o, 100, "UTF-8").takeWhile(_ != 0)
      val size = octal(o + 124, 12)
      val typeflag = { val c = b(o + 156).toChar; if (c == 0) '0' else c }
      val dataStart = o + 512
      require(dataStart + size <= b.length,
        s"tar member '$name' size $size overruns the file at $o")
      out += TarEntry(name, typeflag, java.util.Arrays.copyOfRange(
        b, dataStart, (dataStart + size).toInt))
      o = dataStart + (((size + 511) / 512) * 512).toInt
    }
    out.result()
  }

  // -------------------------------------------------------------------
  // Deterministic encoder (fixture side; also what TarSpec feeds the
  // system `tar` binary to cross-validate)

  private def header(name: String, size: Long, typeflag: Char)
      : Array[Byte] = {
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val x = s.getBytes("UTF-8")
      require(off + x.length <= 512, s"field overflow at $off")
      System.arraycopy(x, 0, h, off, x.length)
    }
    def putOct(off: Int, len: Int, v: Long): Unit =
      put(off, ("%0" + (len - 1) + "o").format(v)) // NUL-terminated
    put(0, name)
    putOct(100, 8, 420) // 0644
    putOct(108, 8, 0)
    putOct(116, 8, 0)
    putOct(124, 12, size)
    putOct(136, 12, 0) // mtime pinned to epoch: deterministic bytes
    h(156) = typeflag.toByte
    put(257, "ustar")
    put(263, "00")
    put(265, "graft")
    put(297, "graft")
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(x => sum += x & 0xff)
    put(148, "%06o".format(sum))
    h(154) = 0
    h(155) = ' '
    h
  }

  /** Serialize members (name, typeflag, bytes) as one ustar archive. */
  def archive(entries: Seq[(String, Char, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, tf, data) =>
      val size = if (tf == '5') 0 else data.length
      out.write(header(name, size, tf))
      if (tf != '5') {
        out.write(data)
        out.write(new Array[Byte]((512 - data.length % 512) % 512))
      }
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Closed-form fixture mirrored by the DuckDB oracle: one directory
    * entry + 1 + id % 4 text members `docs/<id>/part-<i>.txt` holding
    * `member-<id>-<i>-` plus (id·5 + i) % 96 'y's; even ids gzip the
    * whole archive (.tar.gz), odd ids stay plain (.tar).
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val n = 1 + (id % 4).toInt
    val entries = (s"docs/$id/", '5', Array.empty[Byte]) +:
      (0 until n).map { i =>
        (s"docs/$id/part-$i.txt", '0',
          (s"member-$id-$i-" + "y" * ((id * 5 + i) % 96).toInt)
            .getBytes("UTF-8"))
      }
    val tar = archive(entries)
    if (id % 2 == 0) Warc.gzipMember(tar) else tar
  }
}
