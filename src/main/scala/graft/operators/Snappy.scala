package graft.operators

/** Snappy decompression from scratch (pure JVM) — the second
  * compressed-shard member of the ingestion family next to [[Lz4]]
  * (Snappy is the other codec training shards and columnar files ship
  * with). Implements both public layers:
  *
  *   - the RAW format: varint uncompressed length, then tagged
  *     elements — 2-bit type 00 literals (lengths 61..64 spill into
  *     1..4 little-endian extra bytes), 01 copies (3-bit length + 4,
  *     11-bit offset split across the tag and one byte), 10 copies
  *     (6-bit length + 1, 16-bit LE offset), 11 copies (32-bit LE
  *     offset), overlap-capable match copy;
  *   - the FRAMING format (.sz): the 0xff "sNaPpY" stream identifier,
  *     0x00 compressed / 0x01 uncompressed chunks each led by a MASKED
  *     CRC-32C of the uncompressed data (`rotr15(crc) + 0xa282ead8`),
  *     0xfe padding and reserved-skippable chunks, reserved-unskippable
  *     chunks rejecting loudly.
  *
  * Cross-validated in SnappySpec against the independent snappy-java
  * implementation on Spark's classpath (org.xerial.snappy): our
  * decoder must decode its compressor's raw output bit-exactly and its
  * `SnappyFramedInputStream` must accept our framed writer (and vice
  * versa); CRC-32C comes from the JDK's java.util.zip.CRC32C, so the
  * mask arithmetic is the only checksum code trusted to this module.
  *
  * Formats are the public google/snappy format descriptions
  * (format_description.txt, framing_format.txt). Beyond-reference
  * source surface (SURVEY §2.1 scope).
  */
object Snappy {

  // -------------------------------------------------------------------
  // Raw format

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    le16(b, o) | (le16(b, o + 2) << 16)

  /** Decode one raw-Snappy buffer (preamble + elements). */
  def uncompress(src: Array[Byte], srcOff: Int, srcLen: Int): Array[Byte] = {
    val end = srcOff + srcLen
    require(end <= src.length, "torn snappy: input overruns the buffer")
    // varint32 uncompressed length
    var s = srcOff
    var dstLen = 0
    var shift = 0
    var more = true
    while (more) {
      require(s < end && shift <= 28, "torn snappy: unterminated varint")
      val b = src(s) & 0xff
      s += 1
      dstLen |= (b & 0x7f) << shift
      shift += 7
      more = (b & 0x80) != 0
    }
    require(dstLen >= 0 && dstLen <= (1 << 30),
      s"snappy declares $dstLen bytes (refusing > 1 GiB)")
    val dst = new Array[Byte](dstLen)
    var d = 0
    while (s < end) {
      val tag = src(s) & 0xff
      s += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >>> 2) + 1
          if (len > 60) {
            val extra = len - 60
            require(s + extra <= end, "torn snappy: literal length bytes")
            len = 0
            var i = 0
            while (i < extra) {
              len |= (src(s + i) & 0xff) << (8 * i)
              i += 1
            }
            len += 1
            s += extra
          }
          require(s + len <= end, "torn snappy: literal overruns input")
          require(d + len <= dstLen, "snappy: literal overruns output")
          System.arraycopy(src, s, dst, d, len)
          s += len
          d += len
        case c =>
          val (len, offset) = c match {
            case 1 =>
              require(s < end, "torn snappy: 1-byte-offset copy")
              val l = ((tag >>> 2) & 7) + 4
              val o = ((tag >>> 5) << 8) | (src(s) & 0xff)
              s += 1
              (l, o)
            case 2 =>
              require(s + 2 <= end, "torn snappy: 2-byte-offset copy")
              val l = (tag >>> 2) + 1
              val o = le16(src, s)
              s += 2
              (l, o)
            case _ =>
              require(s + 4 <= end, "torn snappy: 4-byte-offset copy")
              val l = (tag >>> 2) + 1
              val o = le32(src, s)
              s += 4
              (l, o)
          }
          require(offset > 0, "snappy: zero copy offset is invalid")
          require(offset <= d,
            s"snappy: copy offset $offset reaches before the output")
          require(d + len <= dstLen, "snappy: copy overruns output")
          var k = 0
          while (k < len) { // byte-wise: offsets < len overlap (RLE)
            dst(d) = dst(d - offset)
            d += 1
            k += 1
          }
      }
    }
    require(d == dstLen, s"snappy decoded $d of $dstLen declared bytes")
    dst
  }

  /** Raw-Snappy compressor (fixture + spec surface): greedy 4-byte
    * hash matching like the reference implementation's shape — valid
    * output, not byte-identical to it; snappy-java's decompressor
    * asserts acceptance in SnappySpec.
    */
  def compress(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // varint preamble
    var v = src.length
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    def literal(off: Int, len: Int): Unit = if (len > 0) {
      if (len <= 60) out.write(((len - 1) << 2))
      else {
        var extra = 0
        var l = len - 1
        val bytes = new Array[Int](4)
        while (l != 0 || extra == 0) {
          bytes(extra) = l & 0xff; l >>>= 8; extra += 1
        }
        out.write(((59 + extra) << 2))
        var i = 0
        while (i < extra) { out.write(bytes(i)); i += 1 }
      }
      out.write(src, off, len)
    }
    def copy(offset: Int, len0: Int): Unit = {
      // long copies split into <= 64-byte 2-byte-offset elements; the
      // reference implementation's split keeps every piece >= 4 bytes
      def emit(take: Int): Unit = {
        out.write(((take - 1) << 2) | 2)
        out.write(offset & 0xff)
        out.write((offset >>> 8) & 0xff)
      }
      var len = len0
      while (len >= 68) { emit(64); len -= 64 }
      if (len > 64) { emit(60); len -= 60 }
      emit(len) // 4..64 by construction (matches are >= 4)
    }
    val n = src.length
    if (n < 16) { literal(0, n); return out.toByteArray }
    val hashBits = 14
    val table = new Array[Int](1 << hashBits)
    java.util.Arrays.fill(table, -1)
    def read4(i: Int): Int = le32(src, i)
    def hash4(i: Int): Int = (read4(i) * -1640531535) >>> (32 - hashBits)
    var anchor = 0
    var i = 0
    val limit = n - 8
    while (i < limit) {
      val h = hash4(i)
      val cand = table(h)
      table(h) = i
      if (cand >= 0 && i - cand <= 65535 && read4(cand) == read4(i)) {
        var mLen = 4
        val maxLen = n - i
        while (mLen < maxLen && src(cand + mLen) == src(i + mLen))
          mLen += 1
        literal(anchor, i - anchor)
        copy(i - cand, mLen)
        i += mLen
        anchor = i
      } else i += 1
    }
    literal(anchor, n - anchor)
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Framing format (.sz)

  private val StreamId: Array[Byte] =
    Array(0xff, 6, 0, 0, 's', 'N', 'a', 'P', 'p', 'Y').map(_.toByte)

  /** `rotr15(crc32c) + 0xa282ead8` — the framing format's CRC mask. */
  def maskedCrc32c(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    val crc = c.getValue.toInt
    (Integer.rotateRight(crc, 15)) + 0xa282ead8
  }

  final case class SzInfo(content: Array[Byte], nCompressed: Int,
      nUncompressed: Int, nSkipped: Int)

  /** Decode a complete framed .sz stream, verifying every chunk CRC. */
  def decodeFramed(p: Array[Byte]): SzInfo = {
    require(p.length >= 10 && (0 until 10).forall(i => p(i) == StreamId(i)),
      "not a snappy framed stream (missing sNaPpY identifier)")
    var o = 10
    val out = new java.io.ByteArrayOutputStream()
    var nc = 0
    var nu = 0
    var ns = 0
    while (o < p.length) {
      require(o + 4 <= p.length, "torn .sz: chunk header")
      val typ = p(o) & 0xff
      val len = (p(o + 1) & 0xff) | ((p(o + 2) & 0xff) << 8) |
        ((p(o + 3) & 0xff) << 16)
      o += 4
      require(o + len <= p.length, s"torn .sz: chunk overruns (type $typ)")
      typ match {
        case 0x00 => // compressed: masked CRC + raw-snappy data
          require(len >= 4, "torn .sz: compressed chunk under 4 bytes")
          val want = le32(p, o)
          val data = uncompress(p, o + 4, len - 4)
          require(maskedCrc32c(data, 0, data.length) == want,
            "snappy framed chunk CRC mismatch (compressed)")
          out.write(data, 0, data.length)
          nc += 1
        case 0x01 => // uncompressed: masked CRC + plain data
          require(len >= 4, "torn .sz: uncompressed chunk under 4 bytes")
          val want = le32(p, o)
          require(maskedCrc32c(p, o + 4, len - 4) == want,
            "snappy framed chunk CRC mismatch (uncompressed)")
          out.write(p, o + 4, len - 4)
          nu += 1
        case 0xff => // repeated stream identifier: legal, re-validated
          require(len == 6 && new String(p, o, 6, "US-ASCII") == "sNaPpY",
            "torn .sz: malformed repeated stream identifier")
        case t if t == 0xfe || (t >= 0x80 && t <= 0xfd) =>
          ns += 1 // padding / reserved-skippable: ignored by spec
        case t => throw new IllegalArgumentException(
          f"reserved UNSKIPPABLE .sz chunk 0x$t%02x")
      }
      o += len
    }
    SzInfo(out.toByteArray, nc, nu, ns)
  }

  /** Write a framed .sz stream: chunks of `chunkSize` uncompressed
    * bytes, each compressed when that wins (the spec's 65536-byte max
    * per chunk), with a padding chunk after the identifier when
    * `withPadding`.
    */
  def encodeFramed(content: Array[Byte], chunkSize: Int = 65536,
      withPadding: Boolean = false): Array[Byte] = {
    require(chunkSize >= 1 && chunkSize <= 65536,
      ".sz chunks carry at most 65536 uncompressed bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write(StreamId, 0, StreamId.length)
    def chunkHeader(typ: Int, len: Int): Unit = {
      out.write(typ)
      out.write(len & 0xff)
      out.write((len >>> 8) & 0xff)
      out.write((len >>> 16) & 0xff)
    }
    if (withPadding) {
      chunkHeader(0xfe, 3)
      out.write(0); out.write(0); out.write(0)
    }
    var o = 0
    while (o < content.length) {
      val n = math.min(chunkSize, content.length - o)
      val crc = maskedCrc32c(content, o, n)
      val packed = compress(java.util.Arrays.copyOfRange(content, o, o + n))
      if (packed.length < n) {
        chunkHeader(0x00, packed.length + 4)
        out.write(crc & 0xff); out.write((crc >>> 8) & 0xff)
        out.write((crc >>> 16) & 0xff); out.write((crc >>> 24) & 0xff)
        out.write(packed, 0, packed.length)
      } else {
        chunkHeader(0x01, n + 4)
        out.write(crc & 0xff); out.write((crc >>> 8) & 0xff)
        out.write((crc >>> 16) & 0xff); out.write((crc >>> 24) & 0xff)
        out.write(content, o, n)
      }
      o += n
    }
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Closed-form fixture: one .tsv.sz shard per doc id

  def fixtureRowCount(id: Long): Int = 50 + (id % 40).toInt

  /** Row k of shard `id`: tab-separated (doc, seq, lang, tokens). */
  def fixtureRow(id: Long, k: Int): String =
    s"$id\t$k\tlang${k % 5}\t${(k * 53 + id % 13) % 2000}"

  def fixtureContent(id: Long): Array[Byte] =
    (0 until fixtureRowCount(id)).map(k => fixtureRow(id, k))
      .mkString("", "\n", "\n").getBytes("UTF-8")

  /** doc_id → a framed shard: small chunks on id%3==2 (multi-chunk
    * streams), a padding chunk on id%5==0.
    */
  def fixturePayload(id: Long): Array[Byte] =
    encodeFramed(fixtureContent(id),
      chunkSize = if (id % 3 == 2) 512 else 65536,
      withPadding = id % 5 == 0)
}
