package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Png

/** Full PNG pixel decode (multimodal.Png) — the lossless image tier.
  * Because PNG is lossless, cross-validation against the JDK's ImageIO
  * decoder is EXACT (byte-for-byte per channel), with no seam or rounding
  * tolerance — covering all supported color types, the cycling scanline
  * filters, and both interlace modes. Plus the closed-form fixture
  * contract the DuckDB oracle recomputes, and the loud out-of-scope
  * rejects.
  */
class PngSpec extends AnyFunSuite {

  /** The fixture family's expected RGBA, straight from the formulas
    * (never through the codec's own arithmetic).
    */
  private def expected(id: Long, x: Int, y: Int): (Int, Int, Int, Int) = {
    val ct = Array(0, 2, 3, 6)((id % 4).toInt)
    def v(c: Int) = ((x * 7 + y * 13 + id * 31 + c * 5) % 256).toInt
    ct match {
      case 0 => (v(0), v(0), v(0), 255)
      case 2 => (v(0), v(1), v(2), 255)
      case 3 =>
        val i = ((x + y + id) % 16).toInt
        ((i * 17) % 256, (i * 29) % 256, (i * 43) % 256, 255)
      case 6 => (v(0), v(1), v(2), v(3))
    }
  }

  test("fixture family decodes to the closed form for every color type " +
      "and both interlace modes") {
    for (id <- 0L until 16L) { // 0..15 covers ct × interlace × dims
      val img = Png.decode(Png.fixturePayload(id))
      assert(img.width == 8 + (id % 24).toInt)
      assert(img.height == 8 + ((id * 3) % 24).toInt)
      assert(img.interlaced == (id % 2 == 1))
      var bad = 0
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val p = img.pixels(y * img.width + x)
        val got = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff,
          (p >>> 24) & 0xff)
        if (got != expected(id, x, y)) bad += 1
      }
      assert(bad == 0, s"id=$id: $bad pixels off the closed form")
    }
  }

  test("decode matches ImageIO exactly (lossless: zero tolerance)") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 40L, 41L)) {
      val bytes = Png.fixturePayload(id)
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"ImageIO could not parse our PNG (id=$id)")
      val ours = Png.decode(bytes)
      assert(jdk.getWidth == ours.width && jdk.getHeight == ours.height)
      val gray = id % 4 == 0
      for (y <- 0 until ours.height; x <- 0 until ours.width) {
        // grayscale loads as a LINEAR gray color space, where getRGB
        // would apply a gray→sRGB transform — read the raw raster
        // sample instead; the sRGB types (truecolor/palette/RGBA) pass
        // through getRGB untransformed
        val want =
          if (gray) {
            val v = jdk.getRaster.getSample(x, y, 0)
            (0xff << 24) | (v << 16) | (v << 8) | v
          } else jdk.getRGB(x, y)
        val got = ours.pixels(y * ours.width + x)
        assert(got == want,
          f"id=$id ($x,$y): ours=0x$got%08x imageio=0x$want%08x")
      }
    }
  }

  test("sub-byte depths (1/2/4) decode to scaled gray and palette " +
      "pixels, cross-validated against ImageIO") {
    for (d <- Seq(1, 2, 4)) {
      val (w, h) = (23, 9)
      val maxV = (1 << d) - 1
      val factor = 255 / maxV
      // gray: MSB-first packed rows through all five filters
      val gBytes = Png.encodeDepth(w, h, 0, d,
        (x, y, _) => (x * 3 + y * 5) % (maxV + 1))
      val g = Png.decode(gBytes)
      for (y <- 0 until h; x <- 0 until w) {
        val want = ((x * 3 + y * 5) % (maxV + 1)) * factor
        val got = (g.pixels(y * w + x) >> 16) & 0xff
        assert(got == want, s"d=$d gray ($x,$y): $got != $want")
      }
      val jdkG = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(gBytes))
      assert(jdkG != null, s"ImageIO could not parse our $d-bit gray PNG")
      for (y <- 0 until h; x <- 0 until w) {
        val want = (jdkG.getRGB(x, y) >> 16) & 0xff
        val got = (g.pixels(y * w + x) >> 16) & 0xff
        assert(got == want, s"d=$d gray vs ImageIO ($x,$y): $got != $want")
      }
      // palette: 2^d entries, indexes cycle
      val pal = Array.tabulate(maxV + 1)(i =>
        (0xff << 24) | (((i * 37) % 256) << 16) | (((i * 59) % 256) << 8) |
          ((i * 83) % 256))
      val pBytes = Png.encodeDepth(w, h, 3, d,
        (x, y, _) => (x + 2 * y) % (maxV + 1), pal)
      val p = Png.decode(pBytes)
      val jdkP = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(pBytes))
      for (y <- 0 until h; x <- 0 until w) {
        val want = pal((x + 2 * y) % (maxV + 1))
        assert(p.pixels(y * w + x) == want, s"d=$d palette ($x,$y)")
        assert(jdkP.getRGB(x, y) == want,
          f"d=$d palette vs ImageIO ($x,$y): 0x${jdkP.getRGB(x, y)}%08x")
      }
    }
  }

  test("Adam7 interlace at sub-byte and 16-bit depths: per-pass " +
      "re-packing from bit 0, cross-validated against ImageIO") {
    // odd dims so every pass has a ragged width and sub-byte rows end
    // mid-byte; each (depth, colorType) corner of the legal matrix
    val (w, h) = (21, 13)
    for (d <- Seq(1, 2, 4)) {
      val maxV = (1 << d) - 1
      val factor = 255 / maxV
      val gBytes = Png.encodeDepth(w, h, 0, d,
        (x, y, _) => (x * 3 + y * 5) % (maxV + 1), interlace = true)
      val g = Png.decode(gBytes)
      assert(g.interlaced, "IHDR must carry interlace method 1")
      val jdkG = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(gBytes))
      assert(jdkG != null, s"ImageIO could not parse $d-bit Adam7 gray")
      for (y <- 0 until h; x <- 0 until w) {
        val want = ((x * 3 + y * 5) % (maxV + 1)) * factor
        val got = (g.pixels(y * w + x) >> 16) & 0xff
        assert(got == want, s"d=$d Adam7 gray ($x,$y): $got != $want")
        assert(got == ((jdkG.getRGB(x, y) >> 16) & 0xff),
          s"d=$d Adam7 gray vs ImageIO ($x,$y)")
      }
      val pal = Array.tabulate(maxV + 1)(i =>
        (0xff << 24) | (((i * 37) % 256) << 16) |
          (((i * 59) % 256) << 8) | ((i * 83) % 256))
      val pBytes = Png.encodeDepth(w, h, 3, d,
        (x, y, _) => (x + 2 * y) % (maxV + 1), pal, interlace = true)
      val p = Png.decode(pBytes)
      val jdkP = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(pBytes))
      for (y <- 0 until h; x <- 0 until w) {
        val want = pal((x + 2 * y) % (maxV + 1))
        assert(p.pixels(y * w + x) == want, s"d=$d Adam7 palette ($x,$y)")
        assert(jdkP.getRGB(x, y) == want,
          s"d=$d Adam7 palette vs ImageIO ($x,$y)")
      }
    }
    def s16(x: Int, y: Int, c: Int) = (x * 4321 + y * 987 + c * 4099) % 65536
    for (ct <- Seq(0, 2, 6)) {
      val bytes = Png.encodeDepth(w, h, ct, 16, s16, interlace = true)
      val ours = Png.decode(bytes)
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"ImageIO could not parse 16-bit Adam7 ct=$ct")
      for (y <- 0 until h; x <- 0 until w) {
        val p = ours.pixels(y * w + x)
        val gotByChan = ct match {
          case 0 => Seq((p >> 16) & 0xff)
          case 2 => Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          case _ => Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff,
            (p >>> 24) & 0xff)
        }
        gotByChan.zipWithIndex.foreach { case (got, c) =>
          assert(got == (s16(x, y, c) >> 8),
            s"16-bit Adam7 ct=$ct ($x,$y,c=$c) closed form")
          assert(got == (jdk.getRaster.getSample(x, y, c) >> 8),
            s"16-bit Adam7 ct=$ct ($x,$y,c=$c) vs ImageIO")
        }
      }
    }
  }

  test("16-bit depths project to the high byte, cross-validated " +
      "against ImageIO raster samples") {
    val (w, h) = (17, 11)
    def s16(x: Int, y: Int, c: Int) = (x * 4321 + y * 987 + c * 4099) % 65536
    for (ct <- Seq(0, 2, 6)) {
      val bytes = Png.encodeDepth(w, h, ct, 16, s16)
      val ours = Png.decode(bytes)
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, s"ImageIO could not parse our 16-bit ct=$ct PNG")
      val bands = Png.decode(bytes) // sanity: deterministic
      assert(bands.pixels.sameElements(ours.pixels))
      for (y <- 0 until h; x <- 0 until w) {
        val p = ours.pixels(y * w + x)
        val gotByChan = ct match {
          case 0 => Seq((p >> 16) & 0xff)
          case 2 => Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          case _ => Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff,
            (p >>> 24) & 0xff)
        }
        gotByChan.zipWithIndex.foreach { case (got, c) =>
          val want = jdk.getRaster.getSample(x, y, c) >> 8
          assert(got == want,
            s"16-bit ct=$ct ($x,$y,c=$c): $got != $want")
        }
        // and the closed form: high byte of the encoded sample
        gotByChan.zipWithIndex.foreach { case (got, c) =>
          assert(got == (s16(x, y, c) >> 8), s"closed form ct=$ct c=$c")
        }
      }
    }
  }

  test("illegal depth/color-type pairs reject loudly") {
    intercept[IllegalArgumentException](
      Png.encodeDepth(4, 4, 3, 16, (_, _, _) => 0, Array(0xff000000)))
    intercept[IllegalArgumentException](
      Png.encodeDepth(4, 4, 2, 4, (_, _, _) => 0))
    // decoder side: hand-flip a legal header to an illegal pair
    val good = Png.encodeDepth(8, 8, 0, 4, (x, y, _) => (x + y) % 16)
    val bad = good.clone()
    bad(8 + 8 + 9) = 2 // IHDR color type byte: gray(0) -> truecolor(2)
    val e = intercept[IllegalArgumentException](Png.decode(bad))
    assert(e.getMessage.contains("invalid for color type"))
  }

  test("interlaced and sequential encodings of the same image decode " +
      "identically") {
    val id = 42L
    def pix(x: Int, y: Int, c: Int) = ((x * 7 + y * 13 + id + c) % 256).toInt
    val seq = Png.decode(Png.encode(21, 13, 2, interlace = false, pix))
    val il = Png.decode(Png.encode(21, 13, 2, interlace = true, pix))
    assert(!seq.interlaced && il.interlaced)
    assert(seq.pixels.sameElements(il.pixels),
      "Adam7 placement must reconstruct the sequential image")
  }

  test("gray+alpha (type 4) round-trips") {
    val img = Png.decode(Png.encode(9, 7, 4, interlace = true,
      (x, y, c) => (x * 3 + y * 5 + c * 11) % 256))
    for (y <- 0 until 7; x <- 0 until 9) {
      val p = img.pixels(y * 9 + x)
      val g = (x * 3 + y * 5) % 256
      val a = (x * 3 + y * 5 + 11) % 256
      assert(((p >> 16) & 0xff) == g && ((p >>> 24) & 0xff) == a,
        f"($x,$y): 0x$p%08x")
    }
  }

  test("out-of-scope inputs reject loudly, not wrongly") {
    // depth 3 exists in no row of the spec's legal depth/color matrix
    val good = Png.fixturePayload(0L)
    val bad3 = good.clone()
    // IHDR data starts at offset 16 (8 sig + 4 len + 4 type); depth at +8
    bad3(16 + 8) = 3.toByte
    val e = intercept[IllegalArgumentException](Png.decode(bad3))
    assert(e.getMessage.contains("bit depth"))
    val notPng = intercept[IllegalArgumentException](
      Png.decode(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)))
    assert(notPng.getMessage.contains("signature"))
  }
}
