package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Jpeg

/** Color (3-component YCbCr) baseline JPEG decode — the depth tier above
  * the grayscale codec: interleaved MCU walk, per-component DC
  * predictors and quant tables, replicate chroma upsampling, BT.601
  * full-range RGB conversion. Verified three independent ways: an
  * analytically computed expected image (never through the decoder's own
  * arithmetic), the JDK's ImageIO decoder as a second implementation,
  * and loud rejects for the unsupported shapes.
  */
class JpegColorSpec extends AnyFunSuite {

  private def expectedRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val yv = 128 + 2 * ((((id + 7L * (x / 8) + 13L * (y / 8)) % 64) - 32).toInt)
    val cb = 128 + 2 * ((((id * 3 + 5L * (x / 16) + 11L * (y / 16)) % 48) - 24).toInt)
    val cr = 128 + 2 * ((((id * 7 + 3L * (x / 16) + 17L * (y / 16)) % 48) - 24).toInt)
    def cl(d: Double): Int =
      math.max(0, math.min(255, math.floor(d + 0.5).toInt))
    (cl(yv + 1.402 * (cr - 128)),
      cl(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
      cl(yv + 1.772 * (cb - 128)))
  }

  test("4:2:0 color fixture decodes to the closed-form RGB exactly") {
    for (id <- Seq(0L, 1L, 5L, 17L, 123L)) {
      val img = Jpeg.decode(Jpeg.fixtureColorPayload(id))
      assert(img.channels == 3)
      assert(img.width == 16 * (1 + (id % 3).toInt))
      assert(img.height == 16 * (1 + ((id * 5) % 3).toInt))
      var bad = 0
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val p = img.pixels(y * img.width + x)
        val got = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        if (got != expectedRgb(id, x, y)) bad += 1
      }
      assert(bad == 0, s"id=$id: $bad pixels off the closed form")
    }
  }

  test("color decode cross-validates against the JDK ImageIO decoder") {
    // independent implementation, same stream; ImageIO's IDCT/conversion
    // rounding may differ by one step, and flat 4:2:0 blocks make its
    // fancier chroma interpolation a no-op everywhere except the block
    // seams — allow a small per-channel tolerance off the seams, a wider
    // one on them
    for (id <- Seq(2L, 9L, 31L)) {
      val bytes = Jpeg.fixtureColorPayload(id)
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, "ImageIO could not parse our color stream")
      val ours = Jpeg.decode(bytes)
      assert(jdk.getWidth == ours.width && jdk.getHeight == ours.height)
      var worstInterior = 0
      var worstSeam = 0
      for (y <- 0 until ours.height; x <- 0 until ours.width) {
        val a = ours.pixels(y * ours.width + x)
        val b = jdk.getRGB(x, y)
        val d = Seq(16, 8, 0)
          .map(s => math.abs(((a >> s) & 0xff) - ((b >> s) & 0xff))).max
        val seam = (x % 16) == 0 || (x % 16) == 15 ||
          (y % 16) == 0 || (y % 16) == 15
        if (seam) worstSeam = math.max(worstSeam, d)
        else worstInterior = math.max(worstInterior, d)
      }
      assert(worstInterior <= 2,
        s"id=$id: interior differs from ImageIO by $worstInterior")
      // seams see ImageIO's smooth chroma interpolation vs our replicate
      // upsampling — legitimately different algorithms, but still bounded:
      // bilinear corner weights move chroma by <= 7/16 of the inter-block
      // chroma gap (<= 94 steps in this fixture), ~75 in RGB after the
      // 1.772 Cb gain; a seam-confined bug (wrong block offset, swapped
      // Cb/Cr at the border) reaches the full ~166 swing
      assert(worstSeam <= 100,
        s"id=$id: seam differs from ImageIO by $worstSeam")
    }
  }

  test("4:4:4 stream with AC coefficients decodes within 2 of ImageIO") {
    // non-flat blocks exercise the general AC/IDCT path per component
    val w = 24
    val h = 16
    val bytes = Jpeg.encodeColor(w, h, Jpeg.QuantFlat16, Jpeg.QuantFlat16,
      (1, 1), (c, bx, by) => {
        val coef = new Array[Int](64)
        coef(0) = ((c * 11 + bx * 7 + by * 13) % 32) - 16
        coef(1) = ((c + bx + by) % 5) - 2 // one AC term
        coef(8) = ((c * 3 + bx) % 5) - 2
        coef
      })
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null)
    val ours = Jpeg.decode(bytes)
    assert(jdk.getWidth == w && jdk.getHeight == h)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = ours.pixels(y * w + x)
      val b = jdk.getRGB(x, y)
      val d = Seq(16, 8, 0)
        .map(s => math.abs(((a >> s) & 0xff) - ((b >> s) & 0xff))).max
      worst = math.max(worst, d)
    }
    // ImageIO's fixed-point IDCT may sit one step off our double-precision
    // one per component, and the RGB conversion rounds once more: 2 total
    assert(worst <= 2, s"4:4:4 decode differs from ImageIO by $worst")
  }

  test("4:2:0 scan with restart markers decodes identically") {
    // DRI/RSTn is routine in real color corpora: same fixture blocks,
    // restart every 2 MCUs — byte-aligned markers, all three DC
    // predictors reset. Must agree with the closed form AND with ImageIO.
    val id = 7L
    val w = 16 * (1 + (id % 3).toInt)
    val h = 16 * (1 + ((id * 5) % 3).toInt)
    val bytes = Jpeg.encodeColor(w, h, Jpeg.QuantFlat16, Jpeg.QuantFlat16,
      (2, 2), (c, bx, by) => {
        val coef = new Array[Int](64)
        coef(0) = c match {
          case 0 => ((id + 7L * bx + 13L * by) % 64).toInt - 32
          case 1 => ((id * 3 + 5L * bx + 11L * by) % 48).toInt - 24
          case _ => ((id * 7 + 3L * bx + 17L * by) % 48).toInt - 24
        }
        coef
      }, restartInterval = 2)
    val img = Jpeg.decode(bytes)
    var bad = 0
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.pixels(y * w + x)
      if (((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) !=
        expectedRgb(id, x, y)) bad += 1
    }
    assert(bad == 0, s"$bad pixels off the closed form with restarts")
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null && jdk.getWidth == w && jdk.getHeight == h,
      "ImageIO rejected our restart-marker color stream")
  }

  test("grayscale decode is unchanged by the multi-component refactor") {
    for (id <- Seq(0L, 3L, 42L)) {
      val img = Jpeg.decode(Jpeg.fixturePayload(id))
      assert(img.channels == 1)
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val exp = 128 +
          2 * ((((id + 7L * (x / 8) + 13L * (y / 8)) % 64) - 32).toInt)
        assert(img.pixels(y * img.width + x) == exp,
          s"id=$id gray pixel ($x,$y)")
      }
    }
  }

  test("unsupported component shapes are rejected loudly") {
    val good = Jpeg.fixtureColorPayload(1L)
    // corrupt SOF component count 3 -> 2 (offset of the count byte in
    // our encoder's fixed layout: SOI(2) + DQT(69)*2 + SOF marker(2) +
    // len(2) + precision(1) + h(2) + w(2) = byte 149)
    val twoComp = good.clone()
    assert((twoComp(149) & 0xff) == 3, "SOF layout shifted; fix offset")
    twoComp(149) = 2
    val e = intercept[IllegalArgumentException] { Jpeg.decode(twoComp) }
    assert(e.getMessage.contains("component"),
      s"error must name the unsupported shape: ${e.getMessage}")
  }
}
