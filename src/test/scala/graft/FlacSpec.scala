package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Flac

/** FLAC STREAMINFO parsing (multimodal.Flac): closed-form fixture
  * contract over the bit-packed layout, block-skip path, and loud
  * rejects; offsets pinned against the xiph.org spec (no independent
  * JVM FLAC reader).
  */
class FlacSpec extends AnyFunSuite {

  test("fixture family parses to the closed form") {
    for (id <- 0L until 24L) {
      val m = Flac.parse(Flac.fixturePayload(id))
      assert(m.sampleRate == 8000 + (id % 6).toInt * 8000)
      assert(m.channels == 1 + (id % 2).toInt)
      assert(m.bitsPerSample == 16 + (id % 2).toInt * 8)
      assert(m.totalSamples == 10000L + (id % 90000) * 7)
      assert(m.minBlock == 1024 && m.maxBlock == 4096)
    }
  }

  test("the 36-bit total-samples field survives values past 2^32") {
    // hand-pack a STREAMINFO with total = 2^35 + 5 to prove the wide
    // field is not truncated to 32 bits
    val total = (1L << 35) + 5
    val packed = (44100L << 44) | (1L << 41) | (15L << 36) | total
    def be(v: Long, n: Int) = Array.tabulate(n)(i =>
      ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)
    val si = be(1024, 2) ++ be(4096, 2) ++ be(0, 3) ++ be(0, 3) ++
      be(packed, 8) ++ new Array[Byte](16)
    val stream = "fLaC".getBytes("US-ASCII") ++
      be(0x80, 1) ++ be(34, 3) ++ si
    val m = Flac.parse(stream)
    assert(m.totalSamples == total && m.channels == 2 &&
      m.bitsPerSample == 16 && m.sampleRate == 44100)
  }

  test("malformed input rejects loudly") {
    val bad = intercept[IllegalArgumentException](
      Flac.parse(Array.fill[Byte](16)(0)))
    assert(bad.getMessage.contains("FLAC"))
    val good = Flac.fixturePayload(0L)
    val torn = good.clone()
    torn(7) = 0x7f.toByte // oversize the STREAMINFO block length
    val ov = intercept[IllegalArgumentException](Flac.parse(torn))
    assert(ov.getMessage.contains("torn") ||
      ov.getMessage.contains("STREAMINFO"))
  }
}
