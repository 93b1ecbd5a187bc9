package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Jpeg

/** Progressive (SOF2) JPEG decode — spectral selection + successive
  * approximation over the shared coefficient/IDCT machinery. Verified
  * four independent ways: progressive and baseline encodings of the SAME
  * coefficients must decode to bit-identical pixels (the coefficient
  * accumulator makes this an exact identity, not a tolerance); the JDK's
  * ImageIO decoder agrees on our progressive streams; our decoder agrees
  * with ImageIO on streams ImageIO itself WROTE progressively (an
  * independent encoder with optimized tables and real EOBn>1 runs); and
  * torn progressive streams fail loudly.
  */
class JpegProgressiveSpec extends AnyFunSuite {

  /** Dense-ish deterministic coefficient generator: DC plus a few AC
    * terms, varying per component and block so refinement scans carry
    * real correction bits, ZRLs, and per-block EOBs.
    */
  private def coefGen(seed: Long)(c: Int, bx: Int, by: Int): Array[Int] = {
    val coef = new Array[Int](64)
    coef(0) = ((seed + 11L * c + 7L * bx + 13L * by) % 64).toInt - 32
    coef(1) = ((seed * 3 + c + bx + by) % 7).toInt - 3
    coef(8) = ((seed * 5 + 2L * c + bx) % 5).toInt - 2
    coef(17) = ((seed + c + 3L * by) % 3).toInt - 1
    // a high-frequency straggler forces long zero runs (ZRL) and a late EOB
    if ((bx + by + c) % 3 == 0)
      coef(60) = ((seed + bx) % 3).toInt - 1
    coef
  }

  test("progressive gray decodes bit-identically to the baseline stream " +
      "of the same coefficients") {
    for (seed <- Seq(0L, 5L, 17L, 40L)) {
      val w = 8 * (2 + (seed % 5).toInt)
      val h = 8 * (2 + ((seed * 3) % 4).toInt)
      val gen = coefGen(seed) _
      val base = Jpeg.decode(
        Jpeg.encodeGray(w, h, Jpeg.QuantFlat16, (bx, by) => gen(0, bx, by)))
      val prog = Jpeg.decode(
        Jpeg.encodeProgressive(w, h, Jpeg.QuantFlat16, Jpeg.QuantFlat16,
          (1, 1), 1, gen))
      assert(prog.width == base.width && prog.height == base.height)
      assert(prog.pixels.sameElements(base.pixels),
        s"seed=$seed: progressive pixels diverge from baseline")
    }
  }

  test("progressive 4:2:0 color decodes bit-identically to baseline") {
    for (seed <- Seq(1L, 9L, 23L)) {
      val w = 16 * (1 + (seed % 3).toInt)
      val h = 16 * (1 + ((seed * 5) % 3).toInt)
      val gen = coefGen(seed) _
      val base = Jpeg.decode(
        Jpeg.encodeColor(w, h, Jpeg.QuantFlat16, Jpeg.QuantFlat16,
          (2, 2), gen))
      val prog = Jpeg.decode(
        Jpeg.encodeProgressive(w, h, Jpeg.QuantFlat16, Jpeg.QuantFlat16,
          (2, 2), 3, gen))
      assert(prog.width == base.width && prog.height == base.height)
      assert(prog.channels == 3)
      assert(prog.pixels.sameElements(base.pixels),
        s"seed=$seed: progressive color pixels diverge from baseline")
    }
  }

  test("ImageIO agrees with our decode of our own progressive streams") {
    for (seed <- Seq(2L, 14L)) {
      val w = 24
      val h = 16
      val bytes = Jpeg.encodeProgressive(w, h, Jpeg.QuantFlat16,
        Jpeg.QuantFlat16, (1, 1), 1, coefGen(seed))
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(jdk != null, "ImageIO could not parse our progressive stream")
      val ours = Jpeg.decode(bytes)
      assert(jdk.getWidth == ours.width && jdk.getHeight == ours.height)
      var worst = 0
      for (y <- 0 until h; x <- 0 until w) {
        val a = ours.pixels(y * w + x)
        val b = jdk.getRaster.getSample(x, y, 0) // raw gray (getRGB gammas)
        worst = math.max(worst, math.abs(a - b))
      }
      // two independent IDCTs, one rounding step each
      assert(worst <= 2, s"seed=$seed: differs from ImageIO by $worst")
    }
  }

  test("our decoder agrees with ImageIO on an ImageIO-WRITTEN " +
      "progressive stream (independent encoder, real EOBn runs)") {
    val w = 40
    val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth gradient + texture: progressive scans refine over many
      // blocks, and the optimized encoder emits EOB runs spanning blocks
      val v = math.max(0, math.min(255,
        16 + 3 * x + 5 * y + (if ((x / 4 + y / 4) % 2 == 0) 24 else 0)))
      img.getRaster.setSample(x, y, 0, v)
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = baos.toByteArray
    // confirm the stream really is progressive (SOF2 present)
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "ImageIO did not write a progressive stream")
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val ours = Jpeg.decode(bytes)
    assert(jdk.getWidth == ours.width && jdk.getHeight == ours.height)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = ours.pixels(y * w + x)
      val b = jdk.getRaster.getSample(x, y, 0)
      worst = math.max(worst, math.abs(a - b))
    }
    assert(worst <= 2, s"differs from ImageIO by $worst")
  }

  test("our decoder agrees with ImageIO on an ImageIO-WRITTEN progressive " +
      "4:2:0 COLOR stream (independent color encoder, real EOBn runs)") {
    val w = 48
    val h = 32
    // near-gray tint: R=v+10, G=v, B=v-10 keeps Cb/Cr CONSTANT across the
    // image (the BT.601 forward transform is affine, so a constant RGB
    // offset over a shared gradient lands on one chroma value), which
    // makes ImageIO's fancy chroma upsampling a no-op vs our block
    // replication — the compare then isolates the progressive color scan
    // machinery instead of the upsampling filter choice. v stays in
    // [30, 225] so no channel clips and the chroma really is constant.
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = 30 + (3 * x + 5 * y) % 186
      img.setRGB(x, y, ((v + 10) << 16) | (v << 8) | (v - 10))
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = baos.toByteArray
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "ImageIO did not write a progressive stream")
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val ours = Jpeg.decode(bytes)
    assert(ours.channels == 3, "stream should decode as color")
    assert(jdk.getWidth == ours.width && jdk.getHeight == ours.height)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = ours.pixels(y * w + x)
      val b = jdk.getRGB(x, y)
      val d = Seq(16, 8, 0)
        .map(s => math.abs(((a >> s) & 0xff) - ((b >> s) & 0xff))).max
      worst = math.max(worst, d)
    }
    // two independent IDCTs + two YCbCr->RGB roundings, one step each
    assert(worst <= 3, s"differs from ImageIO by $worst")
  }

  test("fixturePayload's progressive subset decodes to the same closed " +
      "form as the baseline ids") {
    for (id <- Seq(2L, 5L, 8L, 11L)) { // id % 3 == 2 → progressive
      val bytes = Jpeg.fixturePayload(id)
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
        s"id=$id should be progressive-encoded")
      val img = Jpeg.decode(bytes)
      val w = 8 * (2 + (id % 5).toInt)
      val h = 8 * (2 + ((id * 3) % 4).toInt)
      assert(img.width == w && img.height == h)
      var bad = 0
      for (y <- 0 until h; x <- 0 until w) {
        val dc = ((id + 7L * (x / 8) + 13L * (y / 8)) % 64).toInt - 32
        if (img.pixels(y * w + x) != 128 + 2 * dc) bad += 1
      }
      assert(bad == 0, s"id=$id: $bad pixels off the closed form")
    }
  }

  test("torn progressive streams fail loudly") {
    val bytes = Jpeg.encodeProgressive(24, 16, Jpeg.QuantFlat16,
      Jpeg.QuantFlat16, (1, 1), 1, coefGen(7L))
    intercept[IllegalArgumentException] {
      Jpeg.decode(bytes.take(bytes.length / 2))
    }
    intercept[IllegalArgumentException] {
      Jpeg.decode(bytes.dropRight(2)) // EOI torn off
    }
  }
}
