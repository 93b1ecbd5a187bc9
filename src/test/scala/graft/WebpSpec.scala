package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Webp

/** WebP container metadata (multimodal.Webp): closed-form fixture
  * contract across the three bitstream variants, odd-length chunk
  * padding, and loud rejects.
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
