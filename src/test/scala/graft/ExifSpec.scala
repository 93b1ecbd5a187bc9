package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Exif, Jpeg}

/** EXIF / TIFF-IFD parsing (multimodal.Exif): closed-form fixture
  * contract over both byte orders, inline vs offset ASCII values, the
  * spliced APP1 leaving the JPEG decodable, and loud rejects. No
  * independent EXIF reader ships with the JVM, so offsets are pinned
  * against the TIFF 6.0 / CP-3451 layout the way Mp4Spec pins ISO
  * 14496-12.
  */
class ExifSpec extends AnyFunSuite {

  test("fixture family parses to the closed form (II and MM)") {
    for (id <- 0L until 24L) {
      val m = Exif.parse(Exif.fixturePayload(id))
      assert(m.byteOrder == (if (id % 2 == 0) "II" else "MM"))
      assert(m.make == s"Cam${id % 5}")
      assert(m.model == s"M${id % 7}", "inline (<=4 byte) ASCII value")
      assert(m.orientation == 1 + (id % 8).toInt)
      assert(m.dateTime ==
        f"2024:01:${1 + id % 28}%02d ${id % 24}%02d:00:00")
      assert(m.pixelW == 8 * (2 + (id % 5).toInt))
      assert(m.pixelH == 8 * (2 + ((id * 3) % 4).toInt))
    }
  }

  test("the spliced APP1 leaves the JPEG bit-identically decodable") {
    for (id <- Seq(0L, 1L, 5L)) {
      val plain = Jpeg.decode(Jpeg.fixturePayload(id))
      val tagged = Jpeg.decode(Exif.fixturePayload(id))
      assert(tagged.width == plain.width && tagged.height == plain.height)
      assert(tagged.pixels.sameElements(plain.pixels),
        s"id=$id: APP1 splice changed decoded pixels")
    }
  }

  test("ImageIO still reads the tagged stream (APP1 is skippable)") {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Exif.fixturePayload(4L)))
    assert(img != null && img.getWidth == 8 * (2 + 4 % 5))
  }

  test("malformed input rejects loudly") {
    val notJpeg = intercept[IllegalArgumentException](
      Exif.parse(Array.fill[Byte](16)(0)))
    assert(notJpeg.getMessage.contains("JPEG"))

    // a plain fixture JPEG has no APP1 → loud, not a null record
    val noExif = intercept[IllegalArgumentException](
      Exif.parse(Jpeg.fixturePayload(3L)))
    assert(noExif.getMessage.toLowerCase.contains("exif"))

    // corrupt the byte-order mark
    val good = Exif.fixturePayload(2L)
    val s = new String(good.map(b => (b & 0xff).toChar))
    val tiffAt = s.indexOf("Exif") + 6
    val badOrder = good.clone()
    badOrder(tiffAt) = 'X'.toByte
    val bo = intercept[IllegalArgumentException](Exif.parse(badOrder))
    assert(bo.getMessage.contains("byte order"))

    // oversize the IFD entry count so the walk overruns the segment
    val torn = good.clone()
    // entry count lives at tiff+8 (II fixture: little-endian u16)
    torn(tiffAt + 8) = 0x7f.toByte
    val ov = intercept[IllegalArgumentException](Exif.parse(torn))
    assert(ov.getMessage.contains("overruns"))
  }
}
