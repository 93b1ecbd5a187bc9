package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Inflate

/** DEFLATE/gzip/zlib decode (operators.Inflate), cross-validated
  * against the JDK's independent java.util.zip in both directions:
  * our inflater over Deflater output at every level (stored, fixed and
  * dynamic blocks), the JDK inflater over our stored/fixed writers,
  * checksum parity, the multi-member gzip fixture contract, and loud
  * torn-stream rejects.
  */
class InflateSpec extends AnyFunSuite {

  private def jdkDeflate(src: Array[Byte], level: Int,
      nowrap: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(level, nowrap)
    d.setInput(src); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def jdkInflateRaw(src: Array[Byte], dstLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(src)
    val dst = new Array[Byte](dstLen)
    var got = 0
    while (got < dstLen && !inf.finished())
      got += inf.inflate(dst, got, dstLen - got)
    inf.end()
    assert(got == dstLen)
    dst
  }

  test("our inflater decodes JDK Deflater output at every level " +
      "(stored, fixed and dynamic blocks) bit-exactly") {
    val rnd = new scala.util.Random(23)
    for (level <- 0 to 9; shape <- Seq("rep", "rand", "mix")) {
      val n = 40000 + rnd.nextInt(5000)
      val src = shape match {
        case "rep" => Array.tabulate[Byte](n)(i => ((i / 10) % 17).toByte)
        case "rand" => Array.fill[Byte](n)(rnd.nextInt().toByte)
        case _ => Array.tabulate[Byte](n)(i =>
          if ((i / 1000) % 2 == 0) ((i / 3) % 11).toByte
          else rnd.nextInt().toByte)
      }
      val packed = jdkDeflate(src, level, nowrap = true)
      val (dec, after) = Inflate.inflateRaw(packed, 0)
      assert(dec.sameElements(src), s"level=$level shape=$shape")
      assert(after == packed.length, s"level=$level end position")
    }
    // empty and tiny inputs
    for (n <- Seq(0, 1, 5); level <- Seq(0, 6)) {
      val src = Array.tabulate[Byte](n)(_.toByte)
      val (dec, _) = Inflate.inflateRaw(jdkDeflate(src, level, true), 0)
      assert(dec.sameElements(src), s"n=$n level=$level")
    }
  }

  test("the JDK inflater accepts our stored and fixed-Huffman writers") {
    val rnd = new scala.util.Random(29)
    for (n <- Seq(0, 1, 100, 65535, 70000, 200000)) {
      val src = Array.tabulate[Byte](n)(i =>
        (((i / 7) * 13 + rnd.nextInt(2)) % 41).toByte)
      val stored = Inflate.deflateStored(src)
      assert(jdkInflateRaw(stored, n).sameElements(src), s"stored n=$n")
      val fixed = Inflate.deflateFixed(src)
      assert(jdkInflateRaw(fixed, n).sameElements(src), s"fixed n=$n")
      // and our own decoder agrees with both writers
      assert(Inflate.inflateRaw(stored, 0)._1.sameElements(src))
      assert(Inflate.inflateRaw(fixed, 0)._1.sameElements(src))
    }
  }

  test("zlib streams decode with Adler-32 verified; adler parity with " +
      "the JDK") {
    val rnd = new scala.util.Random(31)
    val src = Array.tabulate[Byte](120000)(i => ((i / 9) % 23).toByte)
    for (level <- Seq(0, 1, 6, 9)) {
      val z = jdkDeflate(src, level, nowrap = false)
      assert(Inflate.zlibDecode(z).sameElements(src), s"zlib level=$level")
    }
    for (len <- Seq(0, 1, 100, 5000, 65521, 100000)) {
      val b = Array.fill[Byte](len)(rnd.nextInt().toByte)
      val jdk = new java.util.zip.Adler32()
      jdk.update(b)
      assert(Inflate.adler32(b, 0, len) == jdk.getValue.toInt, s"len=$len")
    }
    // a wrong trailer rejects
    val z = jdkDeflate(src, 6, nowrap = false)
    val bad = z.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    val e = intercept[IllegalArgumentException](Inflate.zlibDecode(bad))
    assert(e.getMessage.contains("Adler"), e.getMessage)
  }

  test("gzip: JDK-written streams decode; our full-header members " +
      "decode in the JDK; fields recovered") {
    val content = Array.tabulate[Byte](90000)(i => ((i / 11) % 31).toByte)
    // JDK writer -> our decoder
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(content); gz.close()
    assert(Inflate.gunzip(bos.toByteArray).sameElements(content))
    // our writer (all optional fields) -> JDK reader
    val ours = Inflate.gzipMember(content, name = Some("a.jsonl"),
      comment = Some("hello"), extra = Some(Array[Byte](9, 9)),
      headerCrc = true, level = 9)
    val gis = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(ours))
    val back = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = gis.read(buf)
    while (n >= 0) { back.write(buf, 0, n); n = gis.read(buf) }
    gis.close()
    assert(back.toByteArray.sameElements(content), "ours -> JDK gzip")
    // and our decoder recovers the header fields
    val m = Inflate.gunzipMembers(ours)
    assert(m.length == 1 && m.head.name.contains("a.jsonl") &&
      m.head.comment.contains("hello") &&
      m.head.extra.exists(_.sameElements(Array[Byte](9, 9))))
  }

  test("multi-member fixture decodes to the closed form") {
    for (id <- 0L until 24L) {
      val members = Inflate.gunzipMembers(Inflate.fixturePayload(id))
      assert(members.length == Inflate.fixtureMemberCount(id), s"id=$id")
      members.zipWithIndex.foreach { case (m, i) =>
        assert(m.content.sameElements(Inflate.fixtureMemberContent(id, i)),
          s"id=$id member $i content")
        assert(m.name.isDefined == (i % 2 == 0), s"id=$id member $i name")
        assert(m.comment.isDefined == (i % 2 == 1), s"id=$id comment")
      }
      // whole-shard concatenation equals member concatenation
      val whole = Inflate.gunzip(Inflate.fixturePayload(id))
      val want = (0 until Inflate.fixtureMemberCount(id))
        .flatMap(i => Inflate.fixtureMemberContent(id, i).toSeq).toArray
      assert(whole.sameElements(want), s"id=$id gunzip concat")
    }
  }

  test("torn streams reject loudly by name") {
    // reserved block type 3
    val e0 = intercept[IllegalArgumentException](
      Inflate.inflateRaw(Array[Byte](0x07, 0, 0), 0))
    assert(e0.getMessage.contains("reserved"), e0.getMessage)
    // LEN/NLEN mismatch in a stored block
    val stored = Inflate.deflateStored("hello world".getBytes("US-ASCII"))
    val badLen = stored.clone()
    badLen(3) = (badLen(3) ^ 0x01).toByte
    val e1 = intercept[IllegalArgumentException](
      Inflate.inflateRaw(badLen, 0))
    assert(e1.getMessage.contains("LEN/NLEN"), e1.getMessage)
    // gzip payload corruption -> CRC32 catches it
    val good = Inflate.fixturePayload(2L)
    var caught = false
    var i = good.length / 2
    while (!caught && i < good.length - 9) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x20).toByte
      try {
        Inflate.gunzipMembers(bad)
        i += 1 // flip landed in slack (e.g. another member's name)
      } catch {
        case e: IllegalArgumentException => caught = true
      }
    }
    assert(caught, "no mid-payload corruption was ever detected")
    // truncation
    intercept[IllegalArgumentException](
      Inflate.gunzipMembers(good.take(good.length - 4)))
    // wrong FHCRC
    val m = Inflate.gzipMember("x".getBytes, name = Some("n"),
      headerCrc = true)
    val badH = m.clone()
    badH(4) = 99 // MTIME byte participates in the header CRC
    val e2 = intercept[IllegalArgumentException](
      Inflate.gunzipMembers(badH))
    assert(e2.getMessage.contains("FHCRC"), e2.getMessage)
  }

  test("decompression-bomb guard: output past the ceiling rejects " +
      "instead of inflating unbounded") {
    // a 1032:1 deflate bomb would OOM the executor through the
    // ByteArrayOutputStream; the emit path must reject at the cap. The
    // cap is parameterized (default 1 GiB) so the guard is provable
    // without emitting a real gibibyte.
    val src = Array.fill[Byte](1000)('A')
    val packed = Inflate.deflateFixed(src)
    val e = intercept[IllegalArgumentException](
      Inflate.inflateRaw(packed, 0, maxOut = 100))
    assert(e.getMessage.contains("ceiling"), e.getMessage)
    // at exactly the output size the stream still decodes
    assert(Inflate.inflateRaw(packed, 0, maxOut = 1000)._1
      .sameElements(src))
  }
}
