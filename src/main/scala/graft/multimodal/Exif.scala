package graft.multimodal

/** EXIF metadata extraction (pure JVM) — the per-image provenance layer a
  * crawl-curation pipeline filters on (camera source, orientation for the
  * decode transform, capture time for dedup/windowing) before any pixel
  * work. The parse is the real thing: walk the JPEG marker stream to the
  * APP1 segment, check the "Exif\0\0" leader, then parse the embedded
  * TIFF structure — BOTH byte orders ("II" little / "MM" big endian), the
  * 42 magic, IFD entry walk with the inline-vs-offset value rule (values
  * ≤ 4 bytes live inside the entry, longer ones behind an offset), ASCII
  * with the trailing NUL, and the ExifIFD sub-directory behind the 0x8769
  * pointer. Torn structures reject loudly.
  *
  * Format is the public JEITA CP-3451 (EXIF) / TIFF 6.0 layout; tags used
  * are the universal ones (Make 0x010F, Model 0x0110, Orientation 0x0112,
  * DateTime 0x0132, ExifIFD 0x8769, PixelXDimension 0xA002,
  * PixelYDimension 0xA003). Beyond-reference multimodal surface (SURVEY
  * §5 scope).
  */
object Exif {

  final case class ExifMeta(byteOrder: String, make: String, model: String,
      orientation: Int, dateTime: String, pixelW: Int, pixelH: Int)

  def parse(jpeg: Array[Byte]): ExifMeta = Torn.guard("EXIF") {
    require(jpeg.length > 4 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG stream")
    // marker walk to APP1/Exif
    var o = 2
    var app1 = -1
    var app1Len = 0
    while (app1 < 0 && o + 4 <= jpeg.length) {
      require((jpeg(o) & 0xff) == 0xff, s"marker expected at offset $o")
      val m = jpeg(o + 1) & 0xff
      require(m != 0xd9 && m != 0xda,
        "no Exif APP1 segment before the entropy stream")
      val len = ((jpeg(o + 2) & 0xff) << 8) | (jpeg(o + 3) & 0xff)
      if (m == 0xe1 && len >= 14 &&
        new String(jpeg, o + 4, 4, "US-ASCII") == "Exif" &&
        jpeg(o + 8) == 0 && jpeg(o + 9) == 0) {
        app1 = o + 10 // TIFF header start
        app1Len = len - 8
      } else o += 2 + len
    }
    require(app1 > 0, "no Exif APP1 segment found")
    val t = app1 // base of the TIFF structure; all offsets are relative
    val order = new String(jpeg, t, 2, "US-ASCII")
    require(order == "II" || order == "MM",
      s"bad TIFF byte order '$order'")
    val le = order == "II"
    def u16(off: Int): Int = {
      val (a, b) = (jpeg(t + off) & 0xff, jpeg(t + off + 1) & 0xff)
      if (le) a | (b << 8) else (a << 8) | b
    }
    def u32(off: Int): Int = {
      val (a, b) = (u16(off), u16(off + 2))
      if (le) a | (b << 16) else (a << 16) | b
    }
    require(u16(2) == 42, s"bad TIFF magic ${u16(2)}")

    var make = ""; var model = ""; var orientation = 0; var dateTime = ""
    var pixelW = 0; var pixelH = 0

    def ascii(off: Int, count: Int): String = {
      require(t + off + count <= app1 + app1Len, "ASCII value overruns APP1")
      val raw = new String(jpeg, t + off, count, "US-ASCII")
      raw.takeWhile(_ != '\u0000') // values carry a trailing NUL
    }

    // visited guards the 0x8769 sub-IFD hop: a crafted ExifIFD offset that
    // points back at an already-walked IFD would otherwise recurse forever
    // (StackOverflowError instead of the documented loud reject)
    def walkIfd(ifdOff: Int, visited: Set[Int]): Unit = {
      require(!visited.contains(ifdOff), s"IFD cycle at offset $ifdOff")
      require(ifdOff >= 0 && ifdOff + 2 <= app1Len,
        s"IFD offset $ifdOff outside APP1")
      val n = u16(ifdOff)
      require(ifdOff + 2 + n * 12 <= app1Len, s"IFD at $ifdOff overruns")
      for (i <- 0 until n) {
        val e = ifdOff + 2 + i * 12
        val tag = u16(e)
        val typ = u16(e + 2)
        // count is an unsigned 32-bit field: widen before arithmetic so a
        // crafted count >= 2^31 cannot wrap negative and pass as "inline"
        val count = u32(e + 4).toLong & 0xffffffffL
        // inline-vs-offset: SHORT(3)=2 bytes, LONG(4)=4, ASCII(2)=1 each
        val unit = typ match {
          case 1 | 2 | 7 => 1L; case 3 => 2L; case 4 | 9 => 4L; case _ => 8L
        }
        val inline = unit * count <= 4
        // every value read — inline or behind the offset — must land
        // inside the APP1 segment, like the ascii helper already enforces
        def valueOff(nBytes: Long): Int = {
          val off = if (inline) e + 8 else u32(e + 8)
          // widen to Long before comparing: a crafted offset near
          // Int.MaxValue would wrap `t + off` negative and pass an Int
          // bounds check, dying later as an AIOOBE instead of this reject
          require(off >= 0 &&
            t.toLong + off.toLong + nBytes <= app1.toLong + app1Len,
            f"tag 0x$tag%04x value overruns APP1")
          off
        }
        def shortOrLong: Int =
          if (typ == 3) u16(valueOff(2)) else u32(valueOff(4))
        def asciiVal: String = {
          require(count <= Int.MaxValue, "ASCII count overflows")
          ascii(valueOff(count), count.toInt)
        }
        tag match {
          case 0x010f => make = asciiVal
          case 0x0110 => model = asciiVal
          case 0x0112 => orientation = shortOrLong
          case 0x0132 => dateTime = asciiVal
          case 0xa002 => pixelW = shortOrLong
          case 0xa003 => pixelH = shortOrLong
          case 0x8769 => walkIfd(u32(e + 8), visited + ifdOff)
          case _ => // unknown tags skipped
        }
      }
    }
    walkIfd(u32(4), Set.empty)
    require(orientation > 0, "Exif without an Orientation tag")
    ExifMeta(if (le) "II" else "MM", make, model, orientation, dateTime,
      pixelW, pixelH)
  }

  // -------------------------------------------------------------------
  // Encoder (fixture side)

  /** Build an APP1/Exif segment: IFD0 (Make, Model, Orientation,
    * DateTime, ExifIFD pointer) + ExifIFD (PixelX/YDimension), in the
    * requested byte order, with string values stored behind offsets (the
    * >4-byte rule) and orientation inline (the ≤4-byte rule) — so the
    * parser's both value paths run on every fixture.
    */
  def app1Segment(le: Boolean, make: String, model: String,
      orientation: Int, dateTime: String, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Int): Unit =
      if (le) { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
      else { w16((v >> 16) & 0xffff); w16(v & 0xffff) }

    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    val dtB = (dateTime + "\u0000").getBytes("US-ASCII")
    // layout: TIFF header (8) | IFD0 (2 + 5*12 + 4) | ExifIFD (2 + 2*12
    // + 4) | offset-stored ASCII values (the > 4-byte ones, in order)
    val ifd0 = 8
    val exifIfd = ifd0 + 2 + 5 * 12 + 4
    val data0 = exifIfd + 2 + 2 * 12 + 4
    val offStored = Seq(makeB, modelB, dtB).filter(_.length > 4)
    val offsets = offStored.scanLeft(data0)(_ + _.length)
    val offsetOf = offStored.zip(offsets).toMap

    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    w16(42); w32(ifd0)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) {
        // inline SHORT occupies the first two value bytes in stream order
        w16(value); w16(0)
      } else w32(value)
    }
    // ASCII honors TIFF's inline rule: values of 4 bytes or fewer live
    // in the entry's value field (natural byte order, zero-padded),
    // longer ones behind the offset — the fixture's short Model string
    // exercises the inline path, Make/DateTime the offset path
    def asciiEntry(tag: Int, b: Array[Byte]): Unit = {
      w16(tag); w16(2); w32(b.length)
      if (b.length <= 4)
        (0 until 4).foreach(i => out.write(if (i < b.length) b(i) else 0))
      else w32(offsetOf(b))
    }
    // IFD0 — entries in ascending tag order per the TIFF spec
    w16(5)
    asciiEntry(0x010f, makeB)
    asciiEntry(0x0110, modelB)
    entry(0x0112, 3, 1, orientation)
    asciiEntry(0x0132, dtB)
    entry(0x8769, 4, 1, exifIfd)
    w32(0) // no IFD1
    // ExifIFD
    w16(2)
    entry(0xa002, 4, 1, w)
    entry(0xa003, 4, 1, h)
    w32(0)
    offStored.foreach(out.write)

    val tiff = out.toByteArray
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = 2 + 6 + tiff.length
    seg.write((len >> 8) & 0xff); seg.write(len & 0xff)
    seg.write("Exif".getBytes("US-ASCII")); seg.write(0); seg.write(0)
    seg.write(tiff)
    seg.toByteArray
  }

  /** doc_id → the deterministic grayscale fixture JPEG with an Exif APP1
    * spliced in after SOI (even ids little-endian "II", odd big-endian
    * "MM") — every field a closed form of the id, mirrored by the oracle.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val base = Jpeg.fixturePayload(id)
    val app1 = app1Segment(
      le = id % 2 == 0,
      make = s"Cam${id % 5}",
      model = s"M${id % 7}",
      orientation = 1 + (id % 8).toInt,
      dateTime = f"2024:01:${1 + id % 28}%02d ${id % 24}%02d:00:00",
      w = 8 * (2 + (id % 5).toInt),
      h = 8 * (2 + ((id * 3) % 4).toInt))
    base.take(2) ++ app1 ++ base.drop(2)
  }
}
