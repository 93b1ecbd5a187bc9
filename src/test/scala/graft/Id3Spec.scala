package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Id3

/** ID3v2 tag parsing (multimodal.Id3): closed-form fixture contract over
  * BOTH frame-size codings (v2.3 plain / v2.4 syncsafe), unknown-frame
  * skipping, padding termination, and loud rejects. No independent ID3
  * reader ships with the JVM, so offsets are pinned against the id3.org
  * layout the way Mp4Spec pins ISO 14496-12.
  */
class Id3Spec extends AnyFunSuite {

  test("fixture family parses to the closed form (v2.3 and v2.4)") {
    for (id <- 0L until 24L) {
      val m = Id3.parse(Id3.fixturePayload(id))
      assert(m.version == (if (id % 2 == 0) 3 else 4))
      assert(m.title == s"Track ${id % 100}")
      assert(m.artist == s"Artist ${id % 12}")
      assert(m.album == s"Album ${id % 9}")
      assert(m.track == 1 + (id % 20).toInt)
      assert(m.lengthMs == 30000 + (id % 300) * 1000)
    }
  }

  test("syncsafe sizes differ from plain once any byte exceeds 0x7f") {
    // a v2.4 frame of 200 body bytes stores 0x01 0x48 in its low size
    // bytes where v2.3 stores 0x00 0xC8 — parse a handmade v2.4 tag with
    // a >127-byte title to prove the syncsafe path is really taken
    val long = "X" * 200
    val id = 1L // odd → v2.4 family
    val base = Id3.fixturePayload(id)
    val m = Id3.parse(base)
    assert(m.version == 4)
    // handmade: version 4 header, one long TIT2 frame, syncsafe size
    def ss(v: Int) = Array(((v >> 21) & 0x7f).toByte,
      ((v >> 14) & 0x7f).toByte, ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    val body = Array(0.toByte) ++ long.getBytes("ISO-8859-1")
    val fr = "TIT2".getBytes("US-ASCII") ++ ss(body.length) ++
      Array(0.toByte, 0.toByte) ++ body
    val tag = "ID3".getBytes("US-ASCII") ++
      Array(4.toByte, 0.toByte, 0.toByte) ++ ss(fr.length) ++ fr
    assert(Id3.parse(tag).title == long)
  }

  test("malformed input rejects loudly") {
    val notId3 = intercept[IllegalArgumentException](
      Id3.parse(Array.fill[Byte](32)(0)))
    assert(notId3.getMessage.contains("ID3"))

    val good = Id3.fixturePayload(2L)
    // oversize the first frame so it overruns the declared tag
    val torn = good.clone()
    torn(10 + 7) = 0x7f.toByte // low byte of TIT2's 32-bit size (v2.3)
    val ov = intercept[IllegalArgumentException](Id3.parse(torn))
    assert(ov.getMessage.contains("overruns"))

    // unsupported major version
    val badVer = good.clone()
    badVer(3) = 2.toByte
    val bv = intercept[IllegalArgumentException](Id3.parse(badVer))
    assert(bv.getMessage.contains("unsupported"))
  }
}
