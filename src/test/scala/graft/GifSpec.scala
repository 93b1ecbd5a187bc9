package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Gif

/** Real GIF LZW decode (multimodal.Gif). Indexed color is lossless, so
  * the ImageIO cross-check is exact per channel; the closed-form fixture
  * contract mirrors the DuckDB oracle; an LZW torture fixture exercises
  * width bumps well past the first boundary; interlaced and sequential
  * encodings reconstruct identically.
  */
class GifSpec extends AnyFunSuite {

  private def expectedRgb(id: Long, x: Int, y: Int, f: Int): Int = {
    val i = ((x + 3L * y + 7L * f + id) % 16).toInt
    (0xff << 24) | (((i * 17) % 256) << 16) | (((i * 29) % 256) << 8) |
      ((i * 43) % 256)
  }

  test("fixture family decodes every frame to the closed form") {
    for (id <- 0L until 12L) {
      val img = Gif.decode(Gif.fixturePayload(id))
      assert(img.width == 8 + (id % 16).toInt)
      assert(img.height == 8 + ((id * 3) % 16).toInt)
      assert(img.frames.size == 1 + (id % 3).toInt)
      assert(img.interlaced == (id % 2 == 1))
      var bad = 0
      img.frames.zipWithIndex.foreach { case (px, f) =>
        for (y <- 0 until img.height; x <- 0 until img.width)
          if (px(y * img.width + x) != expectedRgb(id, x, y, f)) bad += 1
      }
      assert(bad == 0, s"id=$id: $bad pixels off the closed form")
    }
  }

  test("decode matches ImageIO exactly on every frame (lossless)") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 30L, 31L)) {
      val bytes = Gif.fixturePayload(id)
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      assert(readers.hasNext, s"no ImageIO GIF reader (id=$id)")
      val reader = readers.next()
      reader.setInput(in)
      val ours = Gif.decode(bytes)
      assert(reader.getNumImages(true) == ours.frames.size,
        s"id=$id frame count")
      ours.frames.zipWithIndex.foreach { case (px, f) =>
        val jdk = reader.read(f)
        assert(jdk.getWidth == ours.width && jdk.getHeight == ours.height)
        for (y <- 0 until ours.height; x <- 0 until ours.width) {
          val want = jdk.getRGB(x, y)
          val got = px(y * ours.width + x)
          assert(got == want,
            f"id=$id frame=$f ($x,$y): ours=0x$got%08x imageio=0x$want%08x")
        }
      }
      reader.dispose()
    }
  }

  test("LZW width bumps survive a high-entropy 64x64 frame") {
    // 4096 pixels of spread-out indices force the dictionary past the
    // 32/64/128/256/512-entry width boundaries
    val img = Gif.decode(Gif.encode(64, 64, 1, Gif.fixturePalette,
      interlace = false,
      (x, y, _) => ((x * 5 + y * 11 + (x * y) % 7) % 16)))
    for (y <- 0 until 64; x <- 0 until 64) {
      val i = (x * 5 + y * 11 + (x * y) % 7) % 16
      assert(img.frames.head(y * 64 + x) == Gif.fixturePalette(i),
        s"($x,$y)")
    }
  }

  test("interlaced and sequential encodings reconstruct identically") {
    def pix(x: Int, y: Int, f: Int) = (x + y + f) % 16
    val seq = Gif.decode(Gif.encode(19, 11, 2, Gif.fixturePalette,
      interlace = false, pix))
    val il = Gif.decode(Gif.encode(19, 11, 2, Gif.fixturePalette,
      interlace = true, pix))
    assert(!seq.interlaced && il.interlaced)
    (0 until 2).foreach { f =>
      assert(seq.frames(f).sameElements(il.frames(f)),
        s"frame $f: 4-pass placement must reconstruct the sequential image")
    }
  }

  test("malformed input rejects loudly") {
    val notGif = intercept[IllegalArgumentException](
      Gif.decode("JIF89a".getBytes("US-ASCII") ++ new Array[Byte](20)))
    assert(notGif.getMessage.contains("signature"))
  }
}
