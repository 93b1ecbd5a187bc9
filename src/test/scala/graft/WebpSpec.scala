package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Vp8l, Webp}

/** WebP container metadata (multimodal.Webp) and VP8L lossless pixel
  * decode (multimodal.Vp8l): closed-form fixture contract across the
  * three bitstream variants, odd-length chunk padding, bit-exact VP8L
  * roundtrips over every transform / cache / LZ77 / meta-group
  * combination, and loud rejects. No JVM WebP reader exists in this
  * environment, so VP8L correctness is pinned by encoder/decoder
  * roundtrip + the closed-form oracle (see the Vp8l scaladoc).
  */
class WebpSpec extends AnyFunSuite {

  test("fixture family parses to the closed form for all variants") {
    for (id <- 0L until 12L) {
      val m = Webp.parse(Webp.fixturePayload(id))
      assert(m.width == 32 + (id % 300).toInt, s"id=$id width")
      assert(m.height == 24 + ((id * 3) % 200).toInt, s"id=$id height")
      (id % 3) match {
        case 0 =>
          assert(m.variant == "vp8" && !m.hasAlpha && m.nFrames == 1)
        case 1 =>
          assert(m.variant == "vp8l" && m.hasAlpha == (id % 2 == 1) &&
            m.nFrames == 1)
        case _ =>
          assert(m.variant == "vp8x" && m.hasAlpha == (id % 2 == 0) &&
            m.nFrames == 1 + (id % 4).toInt,
            s"id=$id: $m — odd-length ANMF chunks must pad to even")
      }
    }
  }

  private def checkRoundtrip(w: Int, h: Int, px: Array[Int],
      opts: Vp8l.EncodeOptions, label: String): Unit = {
    val bytes = Vp8l.encode(w, h, px, opts)
    val d = Vp8l.decode(bytes)
    assert(d.width == w && d.height == h, s"$label dims")
    assert(d.hasAlpha == px.exists(p => (p >>> 24) != 0xff),
      s"$label alpha flag")
    var bad = 0
    for (i <- px.indices) if (d.pixels(i) != px(i)) bad += 1
    assert(bad == 0, s"$label: $bad of ${px.length} pixels diverged")
    // the metadata tier reads the same container
    val m = Webp.parse(bytes)
    assert(m.variant == "vp8l" && m.width == w && m.height == h, label)
  }

  test("VP8L roundtrips bit-exactly: literals, color cache, RLE copies") {
    val rnd = new scala.util.Random(5)
    val (w, h) = (25, 17)
    val noise = Array.fill(w * h)(rnd.nextInt())
    checkRoundtrip(w, h, noise, Vp8l.EncodeOptions(), "noise literals")
    // plateaus make real dist-1 runs and cache hits
    val runs = Array.tabulate(40 * 21) { i =>
      val x = i % 40
      val y = i / 40
      0xff000000 | (((x / 5) * 40 + (y / 3) * 90) % 0xffffff)
    }
    checkRoundtrip(40, 21, runs, Vp8l.EncodeOptions(rle = true),
      "RLE no cache")
    for (cb <- Seq(1, 4, 8, 11))
      checkRoundtrip(40, 21, runs,
        Vp8l.EncodeOptions(cacheBits = cb, rle = true), s"cache $cb")
  }

  test("VP8L transforms roundtrip: subtract-green, all 14 predictor " +
      "modes, cross-color, palette bundling at every width") {
    val rnd = new scala.util.Random(9)
    val (w, h) = (37, 29)
    val smooth = Array.tabulate(w * h) { i =>
      val x = i % w
      val y = i / w
      0xff000000 | ((x * 6 + y * 2) % 256 << 16) |
        ((x * 3 + y * 5) % 256 << 8) | ((x + y * 7) % 256)
    }
    checkRoundtrip(w, h, smooth,
      Vp8l.EncodeOptions(subtractGreen = true), "subtract-green")
    // predictor tiles of 4px: a 10x8 mode grid cycles all 14 modes;
    // odd dims exercise the TR wrap at x = w-1 on modes 3/5/9/10
    checkRoundtrip(w, h, smooth, Vp8l.EncodeOptions(predictorBits = 2,
      predictorMode = (tx, ty) => (tx + ty * 3) % 14), "predictor")
    checkRoundtrip(w, h, smooth, Vp8l.EncodeOptions(colorBits = 3,
      colorElem = (tx, ty) => ((tx * 19 + ty * 7) % 256) |
        (((tx * 5 + ty * 11) % 256) << 8) |
        (((tx * 3 + ty * 13) % 256) << 16)), "cross-color")
    // stacked: subtract-green + predictor + cache + RLE
    checkRoundtrip(w, h, smooth, Vp8l.EncodeOptions(cacheBits = 6,
      rle = true, subtractGreen = true, predictorBits = 3,
      predictorMode = (tx, ty) => (tx * 5 + ty) % 14), "stacked")
    // palette sizes straddling every bundling width (8/4/2/1 px per
    // byte); width 37 is NOT a multiple of any bundle, so the last
    // byte of each row is partially filled
    for (size <- Seq(2, 4, 16, 64)) {
      val pal = Array.tabulate(size)(i => 0xff000000 |
        (((i * 37) % 256) << 16) | (((i * 59) % 256) << 8) |
        ((i * 83) % 256))
      val px = Array.tabulate(w * h)(i =>
        pal((i % w + (i / w) * 3) % size))
      checkRoundtrip(w, h, px,
        Vp8l.EncodeOptions(palette = pal), s"palette $size")
    }
  }

  test("VP8L meta-Huffman groups decode (two groups, tile parity)") {
    val (w, h) = (33, 18)
    val px = Array.tabulate(w * h) { i =>
      0xff000000 | ((i * 2654435761L).toInt & 0xffffff)
    }
    checkRoundtrip(w, h, px, Vp8l.EncodeOptions(metaBits = 3),
      "meta 8px tiles")
    checkRoundtrip(w, h, px,
      Vp8l.EncodeOptions(metaBits = 2, cacheBits = 5, rle = true),
      "meta + cache")
    // a 1-tile grid degenerates to one group and still roundtrips
    checkRoundtrip(7, 6, px.take(42), Vp8l.EncodeOptions(metaBits = 9),
      "meta single tile")
  }

  test("VP8L fixture family decodes to the closed form for every " +
      "coding class") {
    for (id <- 0L until 36L) { // 6 full class rotations
      val img = Vp8l.decode(Vp8l.fixtureLosslessPayload(id))
      val (w, h) = Vp8l.fixtureDims(id)
      assert(img.width == w && img.height == h, s"id=$id dims")
      var bad = 0
      for (y <- 0 until h; x <- 0 until w)
        if (img.pixels(y * w + x) != Vp8l.fixturePixel(id, x, y)) bad += 1
      assert(bad == 0, s"id=$id class=${id % 6}: $bad pixels off")
      assert(img.hasAlpha == (id % 3 == 1 && id % 6 != 4), s"id=$id alpha")
    }
  }

  test("VP8L malformed streams and the lossy seam reject loudly") {
    val good = Vp8l.encode(9, 7,
      Array.tabulate(63)(i => 0xff000000 | (i * 999983)),
      Vp8l.EncodeOptions())
    // truncation
    intercept[IllegalArgumentException](
      Vp8l.decode(good.take(good.length - 2)))
    // bad signature byte inside the chunk
    val badSig = good.clone()
    badSig(20) = 0x2e // VP8L payload starts at 12 + 8
    val e1 = intercept[IllegalArgumentException](Vp8l.decode(badSig))
    assert(e1.getMessage.contains("signature"), e1.getMessage)
    // the lossy VP8 tier names its reason
    val e2 = intercept[IllegalArgumentException](
      Vp8l.decode(Webp.fixturePayload(0L))) // id%3==0 -> "VP8 " chunk
    assert(e2.getMessage.contains("probability tables"), e2.getMessage)
    // a version other than 0
    val badVer = good.clone()
    // version bits are bits 29..31 of the post-signature LSB stream:
    // byte 3 of the payload (offset 20+3), top 3 bits
    badVer(24) = (badVer(24) | 0x80).toByte
    val e3 = intercept[IllegalArgumentException](Vp8l.decode(badVer))
    assert(e3.getMessage.contains("version"), e3.getMessage)
  }

  test("malformed input rejects loudly") {
    val notRiff = intercept[IllegalArgumentException](
      Webp.parse("RIFX0000WEBP0000000000000".getBytes("US-ASCII")))
    assert(notRiff.getMessage.contains("RIFF"))
    val good = Webp.fixturePayload(0L) // vp8 variant
    val bad = good.clone()
    bad(12 + 8 + 3) = 0 // clobber the VP8 start code
    val noStart = intercept[IllegalArgumentException](Webp.parse(bad))
    assert(noStart.getMessage.contains("start code"))
  }
}
