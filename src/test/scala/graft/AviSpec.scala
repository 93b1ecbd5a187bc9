package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Avi, Jpeg}

/** AVI / MJPEG container + frame decode (multimodal.Avi): closed-form
  * fixture contract, index-seek == direct-slice equivalence, decoded
  * middle-frame pixels against the per-frame closed form, and loud
  * rejects for torn containers and a lying idx1. No independent AVI
  * reader ships with the JVM, so header offsets are pinned against the
  * public AVI RIFF layout (56-byte avih/strh, 40-byte BITMAPINFOHEADER)
  * the way Mp4Spec pins ISO 14496-12.
  */
class AviSpec extends AnyFunSuite {

  test("fixture family parses to the closed form") {
    for (id <- 0L until 24L) {
      val m = Avi.parse(Avi.fixturePayload(id))
      assert(m.width == 8 * (2 + (id % 5).toInt))
      assert(m.height == 8 * (2 + ((id * 3) % 4).toInt))
      assert(m.nFrames == 2 + (id % 4).toInt)
      assert(m.fps == 10 + (id % 20).toInt)
      assert(m.handler == "MJPG")
      assert(m.frameOffsets.length == m.nFrames)
      assert(m.frameOffsets.sameElements(m.frameOffsets.sorted),
        "movi chunk offsets must be increasing")
    }
  }

  test("every frame decodes to its closed-form flat-block pixels") {
    for (id <- Seq(0L, 3L, 7L, 13L)) {
      val p = Avi.fixturePayload(id)
      val m = Avi.parse(p)
      for (f <- 0 until m.nFrames) {
        val img = Jpeg.decode(Avi.frame(p, m, f))
        assert(img.width == m.width && img.height == m.height)
        for (by <- 0 until m.height / 8; bx <- 0 until m.width / 8) {
          val expect = 128 + 2 * (((id + 31L * f + 7L * bx + 13L * by)
            % 64).toInt - 32)
          val got = img.pixels((by * 8) * img.width + bx * 8)
          assert(got == expect, s"id=$id f=$f block ($bx,$by)")
        }
      }
    }
  }

  test("frame() is a pure seek: bytes equal the encoder's JPEG verbatim") {
    val id = 5L
    val w = 8 * (2 + (id % 5).toInt)
    val h = 8 * (2 + ((id * 3) % 4).toInt)
    val direct = Jpeg.encodeGray(w, h, Jpeg.QuantFlat16, (bx, by) => {
      val c = new Array[Int](64)
      c(0) = ((id + 31L * 1 + 7L * bx + 13L * by) % 64).toInt - 32
      c
    })
    val p = Avi.fixturePayload(id)
    val m = Avi.parse(p)
    assert(Avi.frame(p, m, 1).sameElements(direct))
  }

  test("odd-length frames exercise the even-padding path") {
    // JPEG entropy streams have arbitrary parity; assert the fixture
    // family genuinely contains at least one odd-length frame, so the
    // pad byte after a '00dc' chunk is walked over in real parses.
    val anyOdd = (0L until 24L).exists { id =>
      val m = Avi.parse(Avi.fixturePayload(id))
      m.frameSizes.exists(_ % 2 == 1)
    }
    assert(anyOdd, "no odd-sized frame in the fixture family — padding " +
      "path never runs")
  }

  test("malformed input rejects loudly") {
    val notAvi = intercept[IllegalArgumentException](
      Avi.parse(Array.fill[Byte](64)(0)))
    assert(notAvi.getMessage.contains("RIFF"))

    val good = Avi.fixturePayload(2L)
    val m = Avi.parse(good)

    // lie in idx1: bump the first entry's offset field
    val idxPos = {
      // find "idx1" fourcc
      val s = new String(good.map(b => (b & 0xff).toChar))
      s.indexOf("idx1")
    }
    assert(idxPos > 0)
    val lying = good.clone()
    lying(idxPos + 8 + 8) = (lying(idxPos + 8 + 8) + 2).toByte
    val bad = intercept[IllegalArgumentException](Avi.parse(lying))
    assert(bad.getMessage.contains("idx1"))

    // tear a chunk: oversize the first movi video chunk's length
    val dcPos = {
      val s = new String(good.map(b => (b & 0xff).toChar))
      s.indexOf("00dc")
    }
    assert(dcPos > 0)
    val torn = good.clone()
    torn(dcPos + 7) = 0x7f.toByte
    val overrun = intercept[IllegalArgumentException](Avi.parse(torn))
    assert(overrun.getMessage.contains("torn"))

    // out-of-range frame index
    val oob = intercept[IllegalArgumentException](
      Avi.frame(good, m, m.nFrames))
    assert(oob.getMessage.contains("frame"))
  }
}
