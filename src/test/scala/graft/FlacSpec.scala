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

  test("audio fixture family decodes to the closed-form signal exactly") {
    for (id <- 0L until 24L) {
      val a = Flac.decodeAudio(Flac.fixtureAudioPayload(id))
      val ch = Flac.fixtureAudioChannels(id)
      val n = Flac.fixtureAudioSamples(id)
      assert(a.meta.sampleRate == 8000 + (id % 6).toInt * 8000)
      assert(a.meta.channels == ch)
      assert(a.meta.bitsPerSample ==
        (if (id % 20 == 15) 32 else 16 + (id % 2).toInt * 8))
      assert(a.samples.length == n * ch)
      var bad = 0
      for (i <- 0 until n; c <- 0 until ch)
        if (a.samples(i * ch + c) != Flac.fixtureSample(id, c, i)) bad += 1
      assert(bad == 0, s"id=$id: $bad samples off the closed form " +
        s"(ch=$ch n=$n, frames=${(n + 511) / 512})")
    }
  }

  test("audio decode is CRC-guarded: a flipped residual bit rejects") {
    val good = Flac.fixtureAudioPayload(3L)
    // flip one bit deep in the first frame's residual region (well past
    // the 4+4+38 metadata prefix and the 7+1-byte frame header)
    val torn = good.clone()
    torn(80) = (torn(80) ^ 0x10).toByte
    val e = intercept[IllegalArgumentException](Flac.decodeAudio(torn))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("torn") ||
      e.getMessage.contains("unary") || e.getMessage.contains("frame"),
      s"unexpected reject: ${e.getMessage}")
    // truncation rejects too
    intercept[IllegalArgumentException](
      Flac.decodeAudio(good.take(good.length / 2)))
  }

  test("frame-header tampering (channel-nibble rewrite) is caught by " +
      "the CRC-8 guard") {
    // rewrite the frame header's channel-assignment nibble of a real
    // stereo fixture to mid/side (10): the assignment itself now
    // decodes, so the tamper must be caught by the header checksum
    val base = Flac.fixtureAudioPayload(1L) // id 1 -> 2 channels
    val frameOff = 4 + 4 + 34
    assert((base(frameOff) & 0xff) == 0xff &&
      (base(frameOff + 1) & 0xf8) == 0xf8, "frame sync not where expected")
    val midSide = base.clone()
    midSide(frameOff + 3) =
      ((10 << 4) | (midSide(frameOff + 3) & 0x0f)).toByte
    val e1 = intercept[IllegalArgumentException](Flac.decodeAudio(midSide))
    assert(e1.getMessage.contains("CRC-8"), e1.getMessage)
  }

  test("LPC subframes roundtrip bit-exactly across orders, precisions " +
      "and shifts") {
    val rnd = new scala.util.Random(7)
    def check(chans: Array[Array[Int]], bytes: Array[Byte]): Unit = {
      val a = Flac.decodeAudio(bytes)
      val ch = chans.length
      val n = chans(0).length
      assert(a.samples.length == n * ch)
      for (i <- 0 until n; c <- 0 until ch)
        assert(a.samples(i * ch + c) == chans(c)(i),
          s"sample ($c,$i) diverged")
    }
    // every (order, precision, shift) corner incl. the 32-coef max and
    // the 15-bit/15-shift extremes; coefficients are RANDOM — LPC
    // roundtrip is lossless for any coefficient set because encoder and
    // decoder replay the same integer prediction
    for ((order, prec, shift) <- Seq((1, 4, 0), (2, 5, 2), (4, 8, 6),
        (8, 12, 10), (32, 15, 15))) {
      val coefs =
        Array.fill(order)(rnd.nextInt(1 << prec) - (1 << (prec - 1)))
      val chans = Array.fill(1)(Array.fill(96)(rnd.nextInt(2001) - 1000))
      check(chans, Flac.encodeStream(chans, 44100, 16, 5, po = 1,
        lpcCoefs = coefs, lpcShift = shift, lpcPrec = prec))
    }
    // 24-bit samples through the LPC path
    val wide = Array(Array.fill(64)(rnd.nextInt(2000001) - 1000000))
    check(wide, Flac.encodeStream(wide, 96000, 24, 5,
      lpcCoefs = Array(3, -3, 1, 2), lpcShift = 3, lpcPrec = 6))
  }

  test("stereo decorrelation modes reconstruct L/R exactly at full " +
      "sample range") {
    val rnd = new scala.util.Random(11)
    for (stereo <- Seq(8, 9, 10); mode <- Seq(2, 5); bps <- Seq(16, 24)) {
      val lim = if (bps == 16) 32768 else 1 << 23
      val chans =
        Array.fill(2)(Array.fill(64)(rnd.nextInt(2 * lim) - lim))
      val bytes =
        if (mode == 5)
          Flac.encodeStream(chans, 44100, bps, 5, po = 1,
            stereo = stereo, lpcCoefs = Array(2), lpcShift = 1,
            lpcPrec = 3)
        else Flac.encodeStream(chans, 44100, bps, 2, po = 1,
          stereo = stereo)
      val a = Flac.decodeAudio(bytes)
      for (i <- 0 until 64; c <- 0 until 2)
        assert(a.samples(i * 2 + c) == chans(c)(i),
          s"stereo=$stereo mode=$mode bps=$bps sample ($c,$i) diverged")
    }
  }

  test("variable-blocksize streams roundtrip; multi-byte coded sample " +
      "numbers decode") {
    val rnd = new scala.util.Random(13)
    // frame 2 starts at sample 60000 -> a 3-byte coded number; frame 3
    // at 70000 stays 3-byte; the tail frame is odd-sized
    val n = 70007
    val chans = Array.fill(2)(Array.fill(n)(rnd.nextInt(2001) - 1000))
    val bytes = Flac.encodeVariableStream(chans, 44100, 16,
      Array(60000, 10000, 7))
    val a = Flac.decodeAudio(bytes)
    assert(a.meta.minBlock == 7 && a.meta.maxBlock == 60000)
    assert(a.samples.length == n * 2)
    var bad = 0
    for (i <- 0 until n; c <- 0 until 2)
      if (a.samples(i * 2 + c) != chans(c)(i)) bad += 1
    assert(bad == 0, s"$bad samples diverged across variable frames")
    // a torn sample number (frame 2 claims the wrong start) rejects:
    // rebuild with a gap by dropping the middle frame's samples
    val torn = Flac.encodeVariableStream(
      chans.map(_.take(60007)), 44100, 16, Array(60000, 7))
    // same header but STREAMINFO total says 70007: decoder must keep
    // walking past the end and reject, never return short PCM
    val tornTotal = torn.clone()
    // patch the 36-bit total inside STREAMINFO (low 4 bytes at offset
    // 8+4+10+4=26..29 big-endian within the packed field)
    val packed = (44100L << 44) | (1L << 41) | (15L << 36) | 70007L
    for (i <- 0 until 8)
      tornTotal(8 + 4 + 10 + i) = ((packed >>> (8 * (7 - i))) & 0xff).toByte
    intercept[IllegalArgumentException](Flac.decodeAudio(tornTotal))
  }

  test("torn LPC parameter fields reject loudly") {
    // hand-build a mono 16-bit, blockSize-2, LPC(1) frame whose
    // parameter fields are invalid: precision code 15, then (second
    // variant) a negative quantization shift
    def be(v: Long, n: Int) = Array.tabulate(n)(i =>
      ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)
    def stream(tail: String): Array[Byte] = {
      val packed = (8000L << 44) | (0L << 41) | (15L << 36) | 2L
      val si = be(2, 2) ++ be(2, 2) ++ be(0, 3) ++ be(0, 3) ++
        be(packed, 8) ++ new Array[Byte](16)
      val head = "fLaC".getBytes("US-ASCII") ++
        be(0x80, 1) ++ be(34, 3) ++ si
      val hdr = Array[Byte](0xff.toByte, 0xf8.toByte, 0x60.toByte,
        0x08.toByte, 0x00.toByte, 0x01.toByte)
      val crc8 = Flac.crc8(hdr, 0, hdr.length)
      val bits = new StringBuilder
      bits.append("01000000")         // subframe header: LPC order 1
      bits.append("0000000000000101") // 16-bit warmup sample = 5
      bits.append(tail)
      while (bits.length % 8 != 0) bits.append('0')
      val body = bits.toString.grouped(8)
        .map(s => Integer.parseInt(s, 2).toByte).toArray
      head ++ hdr ++ Array(crc8.toByte) ++ body ++ be(0, 2)
    }
    val e1 = intercept[IllegalArgumentException](
      Flac.decodeAudio(stream("1111"))) // precision code 15
    assert(e1.getMessage.contains("precision"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Flac.decodeAudio(stream("0011" + "10000"))) // prec 4, shift -16
    assert(e2.getMessage.contains("negative LPC"), e2.getMessage)
  }

  test("every subframe type, FIXED order, rice width and channel count " +
      "roundtrips bit-exactly on seeded random PCM") {
    val rnd = new scala.util.Random(42) // seeded: deterministic spec
    def check(chans: Array[Array[Int]], bytes: Array[Byte]): Unit = {
      val a = Flac.decodeAudio(bytes)
      val ch = chans.length
      val n = chans(0).length
      assert(a.samples.length == n * ch)
      for (i <- 0 until n; c <- 0 until ch)
        assert(a.samples(i * ch + c) == chans(c)(i),
          s"sample ($c,$i) diverged")
    }
    for (order <- 0 to 4; ch <- 1 to 2; method <- 0 to 1) {
      val chans = Array.fill(ch)(Array.fill(96)(rnd.nextInt(2001) - 1000))
      check(chans,
        Flac.encodeStream(chans, 44100, 16, order, po = 2,
          riceMethod = method))
    }
    // 24-bit samples, larger values, deeper partition order
    val wide = Array(Array.fill(128)(rnd.nextInt(2000001) - 1000000))
    check(wide, Flac.encodeStream(wide, 96000, 24, 2, po = 3))
    // CONSTANT and VERBATIM subframes
    val const = Array(Array.fill(64)(-12345))
    check(const, Flac.encodeStream(const, 8000, 16, -2))
    val verb = Array.fill(2)(Array.fill(64)(rnd.nextInt(65536) - 32768))
    check(verb, Flac.encodeStream(verb, 8000, 16, -1))
    // wasted bits: samples share 3 trailing zero bits
    val wastedPcm = Array(Array.fill(64)((rnd.nextInt(501) - 250) << 3))
    check(wastedPcm, Flac.encodeStream(wastedPcm, 8000, 16, 2, wasted = 3))
    // 8-channel stream (the max the frame header can carry independently)
    val many = Array.fill(8)(Array.fill(32)(rnd.nextInt(201) - 100))
    check(many, Flac.encodeStream(many, 8000, 16, 1))
  }

  test("escape-coded Rice partitions decode raw residuals") {
    // hand-build a minimal mono 16-bit stream: one frame, block size 4,
    // FIXED(0) subframe, partition order 0, ESCAPED partition with 6-bit
    // raw residuals — the path the generated fixtures never take
    def be(v: Long, n: Int) = Array.tabulate(n)(i =>
      ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)
    val total = 4L
    val packed = (8000L << 44) | (0L << 41) | (15L << 36) | total
    val si = be(4, 2) ++ be(4, 2) ++ be(0, 3) ++ be(0, 3) ++
      be(packed, 8) ++ new Array[Byte](16)
    val head = "fLaC".getBytes("US-ASCII") ++ be(0x80, 1) ++ be(34, 3) ++ si
    // frame header: sync(14)=0x3ffe, 0, 0, bs=0110 (8-bit at end),
    // sr=0000, ch=0000, ss=100, 0, frameNum=0x00, bs-1=3
    val hdr = Array[Byte](0xff.toByte, 0xf8.toByte, 0x60.toByte,
      0x08.toByte, 0x00.toByte, 0x03.toByte)
    val crc8 = Flac.crc8(hdr, 0, hdr.length)
    // subframe: 0_000000_0 (CONSTANT? no — FIXED(0) is 0_001000_0=0x10)
    // FIXED(0): all 4 samples are residuals; method 00, po 0000,
    // param 1111 (escape), raw width 000110 -> 5 bits says 6, then
    // 4 x 6-bit two's-complement residuals: 5, -3, 0, -17
    val bits = new StringBuilder
    bits.append("00010000") // subframe header: FIXED(0)
    bits.append("00")       // residual method 0 (4-bit params)
    bits.append("0000")     // partition order 0
    bits.append("1111")     // escape
    bits.append("00110")    // raw residual width 6
    def sb(v: Int, n: Int): Unit =
      for (i <- n - 1 to 0 by -1) bits.append((v >> i) & 1)
    sb(5, 6); sb(-3 & 0x3f, 6); sb(0, 6); sb(-17 & 0x3f, 6)
    while (bits.length % 8 != 0) bits.append('0')
    val body = bits.toString.grouped(8)
      .map(s => Integer.parseInt(s, 2).toByte).toArray
    val frameNoCrc = hdr ++ Array(crc8.toByte) ++ body
    val crc16 = Flac.crc16(frameNoCrc, 0, frameNoCrc.length)
    val stream = head ++ frameNoCrc ++ be(crc16, 2)
    val a = Flac.decodeAudio(stream)
    assert(a.samples.toSeq == Seq(5, -3, 0, -17),
      s"escape decode got ${a.samples.toSeq}")
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

  test("32-bit decorrelated stereo: the 33-bit side channel roundtrips " +
      "at full sample range (the r13 named reject, closed)") {
    // extreme 32-bit PCM: side = L - R spans past Int range, so the
    // side subframe carries 33 bits and every decode intermediate
    // (warmup, residual, predictor) must run in Long
    val n = 64
    val l = Array.tabulate(n)(i =>
      if (i % 2 == 0) Int.MaxValue - i else Int.MinValue + 2 * i)
    val r = Array.tabulate(n)(i =>
      if (i % 2 == 0) Int.MinValue + 3 * i else Int.MaxValue - i)
    def check(bytes: Array[Byte], label: String): Unit = {
      val a = Flac.decodeAudio(bytes)
      for (i <- 0 until n) {
        assert(a.samples(2 * i) == l(i), s"$label L@$i")
        assert(a.samples(2 * i + 1) == r(i), s"$label R@$i")
      }
    }
    for (stereo <- Seq(8, 9, 10)) {
      // VERBATIM: raw 33-bit warmup-free samples
      check(Flac.encodeStream(Array(l, r), 48000, 32, -1,
        stereo = stereo), s"verbatim stereo=$stereo")
      // FIXED(2): 33-bit warmups + Rice residuals wider than 32 bits
      // (5-bit parameter width keeps the unary quotients bounded)
      check(Flac.encodeStream(Array(l, r), 48000, 32, 2, po = 0,
        riceMethod = 1, stereo = stereo), s"fixed2 stereo=$stereo")
    }
    // and through LPC with a 33-bit running prediction
    check(Flac.encodeStream(Array(l, r), 48000, 32, 5, po = 0,
      riceMethod = 1, stereo = 10, lpcCoefs = Array(1), lpcShift = 0,
      lpcPrec = 2), "lpc mid/side")
    // the fixture rotation: id%20==15 shards are 32-bit decorrelated
    for (id <- Seq(15L, 35L, 55L)) {
      val a = Flac.decodeAudio(Flac.fixtureAudioPayload(id))
      assert(a.meta.bitsPerSample == 32, s"id=$id bps")
      val ch = Flac.fixtureAudioChannels(id)
      for (i <- 0 until 32; c <- 0 until ch)
        assert(a.samples(i * ch + c) == Flac.fixtureSample(id, c, i),
          s"id=$id ($c,$i)")
    }
  }
}
