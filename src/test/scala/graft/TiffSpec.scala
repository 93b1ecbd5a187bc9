package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Tiff

/** Baseline TIFF decode (multimodal.Tiff): closed-form fixture contract
  * over both byte orders, gray/RGB/palette photometrics, strip AND
  * tiled organizations (edge-padded tiles), cross-validated against
  * the JDK's TIFFImageReader (lossless container → zero tolerance),
  * plus the PackBits algorithm itself and the loud out-of-scope
  * rejects.
  */
class TiffSpec extends AnyFunSuite {

  private def expected(id: Long, x: Int, y: Int, c: Int): Int =
    ((x / 5) * 31 + y * 7 + id * 13 + c * 5).toInt % 256

  test("fixture family decodes to the closed form for every " +
      "photometric, byte order, compression and strip shape") {
    for (id <- 0L until 60L) {
      val img = Tiff.decode(Tiff.fixturePayload(id))
      val pm = Array(1, 2, 3)((id % 3).toInt)
      assert(img.photometric == pm)
      assert(img.compression == Array(1, 32773, 5, 8)((id % 4).toInt))
      var bad = 0
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val p = img.pixels(y * img.width + x)
        val want = pm match {
          case 1 =>
            val v = expected(id, x, y, 0)
            (0xff << 24) | (v << 16) | (v << 8) | v
          case 2 =>
            (0xff << 24) | (expected(id, x, y, 0) << 16) |
              (expected(id, x, y, 1) << 8) | expected(id, x, y, 2)
          case _ => Tiff.fixturePalette(expected(id, x, y, 0))
        }
        if (p != want) bad += 1
      }
      assert(bad == 0, s"id=$id: $bad pixels off the closed form")
    }
  }

  test("decode matches the JDK TIFFImageReader exactly") {
    for (id <- 0L until 12L) {
      val bytes = Tiff.fixturePayload(id)
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"ImageIO could not parse our TIFF (id=$id)")
      val ours = Tiff.decode(bytes)
      assert(jdk.getWidth == ours.width && jdk.getHeight == ours.height)
      val gray = id % 3 == 0
      val wide = gray && id % 7 == 0 // 16-bit fixture: project high byte
      for (y <- 0 until ours.height; x <- 0 until ours.width) {
        val want =
          if (gray) { // gray loads in a linear gray space; read raw
            val raw = jdk.getRaster.getSample(x, y, 0)
            val v = if (wide) raw >> 8 else raw
            (0xff << 24) | (v << 16) | (v << 8) | v
          } else jdk.getRGB(x, y)
        val got = ours.pixels(y * ours.width + x)
        assert(got == want,
          f"id=$id ($x,$y): ours=0x$got%08x imageio=0x$want%08x")
      }
    }
  }

  test("WhiteIsZero inverts; both engines agree") {
    val bytes = Tiff.encode(19, 7, 0, le = true, compression = 32773,
      rowsPerStrip = 3, (x, y, _) => (x * 5 + y * 11) % 256)
    val ours = Tiff.decode(bytes)
    for (y <- 0 until 7; x <- 0 until 19) {
      val got = (ours.pixels(y * 19 + x) >> 16) & 0xff
      assert(got == 255 - (x * 5 + y * 11) % 256, s"($x,$y) not inverted")
    }
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null, "ImageIO could not parse the WhiteIsZero TIFF")
    for (y <- 0 until 7; x <- 0 until 19) {
      val got = (ours.pixels(y * 19 + x) >> 16) & 0xff
      assert(got == jdk.getRaster.getSample(x, y, 0),
        s"($x,$y) disagrees with ImageIO")
    }
  }

  test("PackBits handles the control-byte edge cases") {
    def roundtrip(src: Array[Byte]): Unit = {
      val packed = Tiff.packBits(src)
      // decode by hand (mirrors the strip decoder's inner loop)
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < packed.length) {
        val ctl = packed(i).toInt; i += 1
        if (ctl >= 0) { out.write(packed, i, ctl + 1); i += ctl + 1 }
        else if (ctl != -128) {
          for (_ <- 0 until 1 - ctl) out.write(packed(i)); i += 1
        }
      }
      assert(out.toByteArray.sameElements(src))
    }
    roundtrip(Array.fill[Byte](300)(7)) // replicate run > 128
    roundtrip(Array.tabulate[Byte](300)(i => i.toByte)) // literal > 128
    roundtrip(Array[Byte](1, 1, 2, 2, 3, 3, 3, 3, 4)) // mixed
    roundtrip(Array[Byte](5)) // single byte
    roundtrip((0 until 130).map(_.toByte).toArray ++
      Array.fill[Byte](5)(9)) // literal cap then run
  }

  test("LZW survives code-width growth and a mid-stream clear") {
    // enough distinct pairs to push the table past 511 and 1023 (the
    // 9->10 and 10->11 early-change boundaries), then past 4093 to force
    // the encoder's mid-stream ClearCode; seeded, deterministic
    val rnd = new scala.util.Random(7)
    val big = Array.fill[Byte](60000)((rnd.nextInt(7) * 37).toByte)
    val bytes = Tiff.encode(200, 300, 1, le = false, compression = 5,
      rowsPerStrip = 300, (x, y, _) => big(y * 200 + x) & 0xff)
    val ours = Tiff.decode(bytes)
    for (y <- 0 until 300; x <- 0 until 200)
      assert((ours.pixels(y * 200 + x) >> 16 & 0xff) ==
        (big(y * 200 + x) & 0xff), s"($x,$y) LZW mismatch")
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null, "ImageIO could not parse our LZW TIFF")
    for (y <- 0 until 300 by 7; x <- 0 until 200 by 3)
      assert(jdk.getRaster.getSample(x, y, 0) ==
        (ours.pixels(y * 200 + x) >> 16 & 0xff),
        s"($x,$y) disagrees with ImageIO on LZW")
  }

  test("tiled organization: multi-tile RGB with edge padding matches " +
      "the closed form and the JDK reader, per compression") {
    // 70x40 RGB over 32x16 tiles -> 3x3 grid, right and bottom edges
    // padded (70 = 2*32+6, 40 = 2*16+8): clipping is really exercised
    for (comp <- Seq(1, 5, 8, 32773); le <- Seq(true, false)) {
      val f = (x: Int, y: Int, c: Int) => ((x / 3) * 17 + y * 5 + c * 9) % 256
      val bytes = Tiff.encode(70, 40, 2, le, comp, rowsPerStrip = 0,
        f, tileW = 32, tileL = 16)
      val ours = Tiff.decode(bytes)
      assert(ours.width == 70 && ours.height == 40)
      for (y <- 0 until 40; x <- 0 until 70) {
        val want = (0xff << 24) | (f(x, y, 0) << 16) |
          (f(x, y, 1) << 8) | f(x, y, 2)
        assert(ours.pixels(y * 70 + x) == want,
          f"comp=$comp le=$le ($x,$y): 0x${ours.pixels(y * 70 + x)}%08x")
      }
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"ImageIO could not parse tiled TIFF comp=$comp")
      for (y <- 0 until 40 by 3; x <- 0 until 70 by 3)
        assert(jdk.getRGB(x, y) == ours.pixels(y * 70 + x),
          s"comp=$comp le=$le ($x,$y) disagrees with ImageIO")
    }
  }

  test("torn tile structures reject loudly") {
    val good = Tiff.encode(40, 40, 1, le = true, compression = 1,
      rowsPerStrip = 0, (x, y, _) => x + y, tileW = 16, tileL = 16)
    // rewrite TileWidth (tag 322, 7th of 10 entries) to 20: IFD starts
    // at 8, entry 6 value at 8 + 2 + 6*12 + 8 = 90 (LONG, little-endian)
    val badW = good.clone()
    assert(badW(82) == 66.toByte && badW(83) == 1.toByte, // tag 322 LE
      "tag layout drifted; update this test")
    badW(90) = 20
    val e1 = intercept[IllegalArgumentException](Tiff.decode(badW))
    assert(e1.getMessage.contains("multiples of 16"), e1.getMessage)
    // non-multiple-of-16 at the writer too
    val e2 = intercept[IllegalArgumentException](
      Tiff.encode(40, 40, 1, le = true, compression = 1, rowsPerStrip = 0,
        (x, y, _) => x + y, tileW = 20, tileL = 16))
    assert(e2.getMessage.contains("multiples of 16"), e2.getMessage)
    // a tile count that contradicts the grid
    val badN = good.clone()
    // TileOffsets (tag 324) count field at entry 8: 8 + 2 + 8*12 + 4 = 110
    assert(badN(106) == 68.toByte && badN(107) == 1.toByte,
      "tag layout drifted; update this test")
    badN(110) = 3
    val e3 = intercept[IllegalArgumentException](Tiff.decode(badN))
    assert(e3.getMessage.contains("tiles") ||
      e3.getMessage.contains("matching"), e3.getMessage)
  }

  test("16-bit grayscale: high-byte projection, both byte orders, " +
      "strips and tiles, vs the JDK reader") {
    // arbitrary (non-v*257) 16-bit samples: projection = high byte
    val f16 = (x: Int, y: Int, _: Int) => (x * 4321 + y * 987) % 65536
    for (le <- Seq(true, false); comp <- Seq(1, 5)) {
      val bytes = Tiff.encode(23, 11, 1, le, comp, rowsPerStrip = 4,
        f16, bitsPerSample = 16)
      val ours = Tiff.decode(bytes)
      for (y <- 0 until 11; x <- 0 until 23) {
        val want = f16(x, y, 0) >> 8
        assert(((ours.pixels(y * 23 + x) >> 16) & 0xff) == want,
          s"le=$le comp=$comp ($x,$y)")
      }
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"ImageIO could not parse 16-bit le=$le")
      for (y <- 0 until 11; x <- 0 until 23)
        assert((jdk.getRaster.getSample(x, y, 0) >> 8) ==
          ((ours.pixels(y * 23 + x) >> 16) & 0xff),
          s"le=$le comp=$comp ($x,$y) vs ImageIO")
    }
    // tiled 16-bit gray
    val bytes = Tiff.encode(40, 20, 1, le = true, compression = 8,
      rowsPerStrip = 0, f16, tileW = 16, tileL = 16, bitsPerSample = 16)
    val ours = Tiff.decode(bytes)
    for (y <- 0 until 20; x <- 0 until 40)
      assert(((ours.pixels(y * 40 + x) >> 16) & 0xff) == (f16(x, y, 0) >> 8),
        s"tiled 16-bit ($x,$y)")
  }

  test("planar configuration 2: component-planar strip RGB matches " +
      "chunky decode and the JDK reader") {
    val f = (x: Int, y: Int, c: Int) => (x * 3 + y * 7 + c * 11) % 256
    for (comp <- Seq(1, 32773); le <- Seq(true, false)) {
      val planar = Tiff.encode(19, 13, 2, le, comp, rowsPerStrip = 5,
        f, planar = 2)
      val chunky = Tiff.encode(19, 13, 2, le, comp, rowsPerStrip = 5, f)
      val a = Tiff.decode(planar)
      val b = Tiff.decode(chunky)
      assert(a.pixels.sameElements(b.pixels),
        s"comp=$comp le=$le planar != chunky")
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(planar))
      assert(jdk != null, s"ImageIO could not parse planar comp=$comp")
      for (y <- 0 until 13; x <- 0 until 19)
        assert(jdk.getRGB(x, y) == a.pixels(y * 19 + x),
          s"comp=$comp le=$le ($x,$y) vs ImageIO")
    }
    // out-of-scope planar shapes reject by name
    val e = intercept[IllegalArgumentException](
      Tiff.encode(19, 13, 1, le = true, compression = 1, rowsPerStrip = 5,
        f, planar = 2))
    assert(e.getMessage.contains("planar"), e.getMessage)
  }

  test("out-of-scope shapes reject loudly by name") {
    val plain = Tiff.encode(8, 8, 1, le = true, compression = 1,
      rowsPerStrip = 8, (x, y, _) => x + y)
    // compression tag (259) is the 4th entry; its SHORT value sits at
    // IFD(10) + 3*12 + 8 = byte 54 (little-endian)
    val bad = plain.clone()
    bad(54) = 7 // JPEG-in-TIFF
    val e = intercept[IllegalArgumentException](Tiff.decode(bad))
    assert(e.getMessage.contains("compression"))
    val notTiff = intercept[IllegalArgumentException](
      Tiff.decode("nope".getBytes("US-ASCII") ++ new Array[Byte](8)))
    assert(notTiff.getMessage.contains("TIFF"))
    val torn = Tiff.fixturePayload(1L)
    intercept[IllegalArgumentException](
      Tiff.decode(torn.take(torn.length / 2)))
  }
}
