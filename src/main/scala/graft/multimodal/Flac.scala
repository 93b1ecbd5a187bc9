package graft.multimodal

/** FLAC STREAMINFO extraction (pure JVM) — the lossless-audio member of
  * the container-metadata family (WAV is decoded fully, MP3 carries ID3
  * tags, FLAC fronts its stream with a bit-packed STREAMINFO block): the
  * "fLaC" magic, the metadata-block walk (1-bit last flag + 7-bit type +
  * 24-bit big-endian length), and STREAMINFO's dense bit layout —
  * 16+16-bit block sizes, 24+24-bit frame sizes, then a 64-bit field
  * packing sample rate (20 bits), channels-1 (3), bits-per-sample-1 (5)
  * and total samples (36). A VORBIS_COMMENT block en route exercises the
  * skip path; torn structures reject loudly. Audio SAMPLE decode lives
  * below ([[decodeAudio]]): FIXED and LPC predictor subframes with
  * partitioned-Rice residuals, left/right/mid-side stereo
  * decorrelation, BOTH blocksize strategies (fixed frame numbers and
  * variable-blocksize sample numbers, multi-byte coded), and
  * CRC-verified frames; the remaining documented seam is 32-bit
  * decorrelated stereo (33-bit side channels).
  *
  * Format is the public xiph.org FLAC specification. Beyond-reference
  * multimodal surface (SURVEY §5 scope).
  */
object Flac {

  final case class FlacMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, minBlock: Int, maxBlock: Int)

  private def be(b: Array[Byte], o: Int, n: Int): Long = {
    var v = 0L
    for (i <- 0 until n) v = (v << 8) | (b(o + i) & 0xff)
    v
  }

  def parse(p: Array[Byte]): FlacMeta = {
    require(p.length > 8 && new String(p, 0, 4, "US-ASCII") == "fLaC",
      "not a FLAC stream")
    var o = 4
    var meta: FlacMeta = null
    var last = false
    while (!last && o + 4 <= p.length) {
      val header = be(p, o, 4)
      last = (header >>> 31) == 1
      val typ = ((header >>> 24) & 0x7f).toInt
      val len = (header & 0xffffff).toInt
      require(o + 4 + len <= p.length,
        s"torn FLAC block type $typ: length $len overruns")
      if (typ == 0) { // STREAMINFO
        require(len == 34, s"STREAMINFO must be 34 bytes, got $len")
        val d = o + 4
        val minBlock = be(p, d, 2).toInt
        val maxBlock = be(p, d + 2, 2).toInt
        // 8 bytes at d+10: rate(20) | channels-1(3) | bps-1(5) | total(36)
        val packed = be(p, d + 10, 8)
        val rate = (packed >>> 44).toInt
        val channels = ((packed >>> 41) & 0x7).toInt + 1
        val bps = ((packed >>> 36) & 0x1f).toInt + 1
        val total = packed & 0xfffffffffL
        meta = FlacMeta(rate, channels, bps, total, minBlock, maxBlock)
      }
      o += 4 + len
    }
    require(meta != null, "FLAC without a STREAMINFO block")
    meta
  }

  // -------------------------------------------------------------------
  // Encoder (fixture side)

  private def beBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)

  /** doc_id → a FLAC header: STREAMINFO + a skippable VORBIS_COMMENT as
    * the LAST block, every field a closed form of the id.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val rate = 8000 + ((id % 6) * 8000).toInt // up to 48 kHz, 20 bits
    val channels = 1 + (id % 2).toInt
    val bps = 16 + ((id % 2) * 8).toInt // 16 or 24
    val total = 10000L + (id % 90000) * 7
    val minBlock = 1024; val maxBlock = 4096
    val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total
    val streaminfo = beBytes(minBlock, 2) ++ beBytes(maxBlock, 2) ++
      beBytes(0, 3) ++ beBytes(0, 3) ++ beBytes(packed, 8) ++
      new Array[Byte](16) // MD5 of the raw audio, zeroed in the fixture
    val comment = s"graft=${id % 10}".getBytes("US-ASCII")
    "fLaC".getBytes("US-ASCII") ++
      beBytes(0x00, 1) ++ beBytes(34, 3) ++ streaminfo ++ // STREAMINFO
      beBytes(0x80L | 4L, 1) ++ beBytes(comment.length, 3) ++ comment
  }

  // -------------------------------------------------------------------
  // Audio SAMPLE decode: frame headers (sync, coded frame number,
  // CRC-8), FIXED predictor subframes of order 0..4 and LPC subframes
  // of order 1..32 (quantized coefficients, right-shift prediction in
  // 64-bit accumulation) with partitioned-Rice residuals (both 4- and
  // 5-bit parameter widths, escape partitions), CONSTANT and VERBATIM
  // subframes, wasted bits, the three stereo decorrelation channel
  // assignments (left/side, right/side, mid/side — side at bps+1),
  // multi-frame streams under BOTH blocksize strategies (fixed: coded
  // frame numbers; variable: coded first-sample numbers, multi-byte
  // UTF-8-style), and the frame-trailing CRC-16 — all per RFC 9639 /
  // the xiph.org spec. 33-bit side channels (32-bit decorrelated
  // stereo) decode through Long channel buffers — the r13 named reject
  // closed in r14; samples re-checked into 32 bits at interleave.

  /** Decoded stream: STREAMINFO + interleaved PCM (frame by frame,
    * sample-major: `samples(i*channels + c)`).
    */
  final case class FlacAudio(meta: FlacMeta, samples: Array[Int])

  /** MSB-first bit reader over the byte array (FLAC is big-endian at the
    * bit level throughout).
    */
  private final class BitReader(p: Array[Byte], var bytePos: Int) {
    private var bitPos = 0
    def bit(): Int = {
      require(bytePos < p.length, "torn FLAC frame: read past end")
      val b = ((p(bytePos) & 0xff) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def bits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Two's-complement signed read. */
    def sbits(n: Int): Int = {
      val v = bits(n)
      ((v << (64 - n)) >> (64 - n)).toInt
    }
    /** Signed read up to 33 bits — the side channel of a 32-bit
      * decorrelated stereo pair carries bps+1 bits.
      */
    def sbitsL(n: Int): Long = {
      val v = bits(n)
      (v << (64 - n)) >> (64 - n)
    }
    /** FLAC unary: count of 0-bits before the terminating 1. */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) {
        q += 1
        require(q <= (1 << 20), "runaway unary run (corrupt Rice stream)")
      }
      q
    }
    def aligned: Boolean = bitPos == 0
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** CRC-8, poly 0x07, init 0 — the FLAC frame-header checksum. */
  def crc8(p: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      crc ^= p(off + i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — the FLAC whole-frame checksum. */
  def crc16(p: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      crc ^= (p(off + i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // sample-rate codes 1..11 (code 0 = from STREAMINFO; 12..14 read
  // explicit fields; 15 is invalid)
  private val RateTable = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)

  def decodeAudio(p: Array[Byte]): FlacAudio = {
    val meta = parse(p)
    // walk past the metadata blocks to the first frame
    var o = 4
    var lastBlock = false
    while (!lastBlock) {
      val h = be(p, o, 4)
      lastBlock = (h >>> 31) == 1
      o += 4 + (h & 0xffffff).toInt
    }
    require(meta.totalSamples > 0, "cannot decode a stream of 0 samples")
    require(meta.totalSamples * meta.channels <= (1 << 26),
      "fixture-scale guard: refusing a multi-hundred-MB PCM buffer")
    val total = meta.totalSamples.toInt
    val out = new Array[Int](total * meta.channels)
    var written = 0 // per-channel samples decoded so far
    var frameIdx = 0L
    while (written < total) {
      val start = o
      val br = new BitReader(p, o)
      require(br.bits(14) == 0x3ffe, "bad FLAC frame sync")
      require(br.bit() == 0, "reserved sync bit must be 0")
      // strategy bit: 0 = fixed blocksize (coded number = frame index),
      // 1 = variable blocksize (coded number = first SAMPLE index)
      val variable = br.bit() == 1
      val bsCode = br.bits(4).toInt
      val srCode = br.bits(4).toInt
      val chCode = br.bits(4).toInt
      val ssCode = br.bits(3).toInt
      require(br.bit() == 0, "reserved header bit must be 0")
      // coded frame number (UTF-8-style, up to 6 continuation bytes)
      val first = br.bits(8).toInt
      val codedNum =
        if ((first & 0x80) == 0) first.toLong
        else {
          var nOnes = 0
          var m = 0x80
          while ((first & m) != 0) { nOnes += 1; m >>= 1 }
          require(nOnes >= 2 && nOnes <= 7, "bad coded frame number lead")
          var v = (first & (0x7f >> nOnes)).toLong
          var k = 1
          while (k < nOnes) {
            val c = br.bits(8).toInt
            require((c & 0xc0) == 0x80, "bad coded-number continuation")
            v = (v << 6) | (c & 0x3f)
            k += 1
          }
          v
        }
      if (variable)
        require(codedNum == written,
          s"frame sample number $codedNum, expected $written")
      else require(codedNum == frameIdx,
        s"frame number $codedNum, expected $frameIdx")
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.bits(8).toInt + 1
        case 7 => br.bits(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new IllegalArgumentException(
          "reserved block-size code 0")
      }
      srCode match { // value checked against STREAMINFO; fields consumed
        case 0 => ()
        case 12 => br.bits(8); ()
        case 13 | 14 => br.bits(16); ()
        case 15 => throw new IllegalArgumentException(
          "invalid sample-rate code 15")
        case c => require(RateTable(c) == meta.sampleRate,
          s"frame sample-rate code $c contradicts STREAMINFO")
      }
      // assignment: -1 = independent; 8 = left/side, 9 = right/side,
      // 10 = mid/side (always 2 channels, side subframe carries bps+1)
      val (channels, assignment) = chCode match {
        case c if c <= 7 => (c + 1, -1)
        case c if c <= 10 => (2, c)
        case _ => throw new IllegalArgumentException(
          "reserved channel-assignment code")
      }
      require(channels == meta.channels,
        "frame channel count contradicts STREAMINFO")
      val bps = ssCode match {
        case 0 => meta.bitsPerSample
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new IllegalArgumentException(
          "reserved sample-size code")
      }
      require(bps == meta.bitsPerSample,
        "frame sample size contradicts STREAMINFO")
      require(br.aligned, "frame header must be byte-aligned here")
      val gotCrc8 = crc8(p, start, br.bytePos - start)
      require(br.bits(8).toInt == gotCrc8, "frame header CRC-8 mismatch")
      require(written + blockSize <= total,
        s"frame overruns STREAMINFO total: $written+$blockSize > $total")
      // ---- subframes, one per channel. Long buffers: the side channel
      // of a 32-bit decorrelated pair is 33-bit (and its LPC/fixed
      // intermediates wider still); final samples are re-checked into
      // 32 bits at interleave
      val chans = Array.ofDim[Long](channels, blockSize)
      var c = 0
      while (c < channels) {
        require(br.bit() == 0, "subframe padding bit must be 0")
        val typ = br.bits(6).toInt
        val wasted =
          if (br.bit() == 1) { var k = 1; while (br.bit() == 0) k += 1; k }
          else 0
        // the difference (side) channel of a decorrelated pair carries
        // one extra bit: side = left - right spans [-2^bps, 2^bps)
        val sideBit = assignment match {
          case 8 | 10 => if (c == 1) 1 else 0
          case 9 => if (c == 0) 1 else 0
          case _ => 0
        }
        val effBps = bps + sideBit - wasted
        require(effBps > 0, "wasted bits consume the whole sample")
        require(effBps <= 33, s"subframe sample width $effBps > 33")
        val dst = chans(c)
        if (typ == 0) { // CONSTANT
          java.util.Arrays.fill(dst, br.sbitsL(effBps))
        } else if (typ == 1) { // VERBATIM
          var i = 0
          while (i < blockSize) { dst(i) = br.sbitsL(effBps); i += 1 }
        } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
          val order = typ & 0x07
          require(blockSize > order,
            s"block of $blockSize cannot carry a FIXED($order) subframe")
          var i = 0
          while (i < order) { dst(i) = br.sbitsL(effBps); i += 1 }
          readResiduals(br, blockSize, order, dst)
          restoreFixed(dst, order, blockSize)
        } else if (typ >= 0x20) { // LPC, order = (typ & 0x1f) + 1
          val order = (typ & 0x1f) + 1
          require(blockSize > order,
            s"block of $blockSize cannot carry an LPC($order) subframe")
          var i = 0
          while (i < order) { dst(i) = br.sbitsL(effBps); i += 1 }
          val precM1 = br.bits(4).toInt
          require(precM1 != 15, "invalid LPC coefficient precision code 15")
          val prec = precM1 + 1
          val shift = br.sbits(5)
          require(shift >= 0,
            "negative LPC quantization shift (forbidden by RFC 9639)")
          val coefs = new Array[Int](order)
          i = 0
          while (i < order) { coefs(i) = br.sbits(prec); i += 1 }
          readResiduals(br, blockSize, order, dst)
          // restore: s(i) = r(i) + (Σ_j coefs(j)·s(i-1-j)) >> shift —
          // the accumulator is a Long so a 15-bit coefficient times a
          // 33-bit running sample cannot wrap before the shift
          i = order
          while (i < blockSize) {
            var acc = 0L
            var j = 0
            while (j < order) {
              acc += coefs(j).toLong * dst(i - 1 - j); j += 1
            }
            dst(i) += acc >> shift
            i += 1
          }
        } else {
          throw new IllegalArgumentException(
            f"reserved subframe type 0x$typ%02x")
        }
        if (wasted > 0) {
          var i = 0
          while (i < blockSize) { dst(i) <<= wasted; i += 1 }
        }
        c += 1
      }
      br.align()
      val gotCrc16 = crc16(p, start, br.bytePos - start)
      require(br.bits(16).toInt == gotCrc16, "frame CRC-16 mismatch")
      // undo stereo decorrelation (after wasted-bit restoration, before
      // interleave): left/side keeps ch0, right/side keeps ch1, mid/side
      // reconstructs via the spec's (mid<<1)|(side&1) rounding recovery
      assignment match {
        case 8 => // ch0 = left, ch1 = side → right = left - side
          var i = 0
          while (i < blockSize) {
            chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
          }
        case 9 => // ch0 = side, ch1 = right → left = right + side
          var i = 0
          while (i < blockSize) {
            chans(0)(i) = chans(0)(i) + chans(1)(i); i += 1
          }
        case 10 => // ch0 = mid (floor average), ch1 = side
          var i = 0
          while (i < blockSize) {
            val side = chans(1)(i)
            val mid = (chans(0)(i) << 1) | (side & 1)
            chans(0)(i) = (mid + side) >> 1
            chans(1)(i) = (mid - side) >> 1
            i += 1
          }
        case _ => ()
      }
      // interleave — after decorrelation every sample must be back in
      // its declared bps ≤ 32 bits; a value outside Int range here is a
      // torn stream, not a representable sample
      var i = 0
      while (i < blockSize) {
        c = 0
        while (c < channels) {
          val v = chans(c)(i)
          require(v >= Int.MinValue && v <= Int.MaxValue,
            "decoded sample exceeds 32 bits (torn stream)")
          out((written + i) * channels + c) = v.toInt
          c += 1
        }
        i += 1
      }
      written += blockSize
      frameIdx += 1
      o = br.bytePos
    }
    FlacAudio(meta, out)
  }

  /** Partitioned-Rice residual decode into `dst(order until blockSize)`.
    * Handles both parameter widths (method 0 → 4-bit, 1 → 5-bit) and the
    * all-ones escape (raw `n`-bit residuals, n=0 meaning all-zero).
    */
  private def readResiduals(br: BitReader, blockSize: Int, order: Int,
      dst: Array[Long]): Unit = {
    val method = br.bits(2).toInt
    require(method <= 1, s"reserved residual coding method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = br.bits(4).toInt
    val nPart = 1 << po
    require(blockSize % nPart == 0,
      s"partition order $po does not divide block size $blockSize")
    require(blockSize >> po >= order,
      s"partition order $po leaves partition 0 short of the warmup")
    var idx = order
    var part = 0
    while (part < nPart) {
      val count = (blockSize >> po) - (if (part == 0) order else 0)
      val prm = br.bits(pBits).toInt
      if (prm == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < count) {
          dst(idx) = if (raw == 0) 0L else br.sbitsL(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = br.unary().toLong
          val u = (q << prm) | br.bits(prm)
          dst(idx) = (u >>> 1) ^ -(u & 1L) // unsigned folding
          idx += 1; i += 1
        }
      }
      part += 1
    }
  }

  /** In-place fixed-predictor restoration (orders 0..4, T.81-era
    * binomial coefficients per the FLAC spec).
    */
  private def restoreFixed(d: Array[Long], order: Int, n: Int): Unit = {
    var i = order
    order match {
      case 0 => ()
      case 1 => while (i < n) { d(i) += d(i - 1); i += 1 }
      case 2 => while (i < n) { d(i) += 2 * d(i - 1) - d(i - 2); i += 1 }
      case 3 => while (i < n) {
        d(i) += 3 * d(i - 1) - 3 * d(i - 2) + d(i - 3); i += 1
      }
      case _ => while (i < n) {
        d(i) += 4 * d(i - 1) - 6 * d(i - 2) + 4 * d(i - 3) - d(i - 4)
        i += 1
      }
    }
  }

  // -------------------------------------------------------------------
  // Audio encoder (fixture side)

  /** MSB-first bit writer mirroring [[BitReader]]. */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (nBits != 0) bit(0)
    def toBytes: Array[Byte] = { align(); buf.toByteArray }
  }

  /** The closed-form PCM signal of [[fixtureAudioPayload]]: a per-channel
    * linear ramp plus a period-33 sawtooth, every parameter a pure
    * function of the id — small enough second differences that the
    * FIXED(2) residuals Rice-code tightly, and a closed form a SQL
    * oracle regenerates with integer arithmetic only.
    */
  def fixtureSample(id: Long, c: Int, i: Int): Int =
    ((id % 200) - 100 + ((id % 7) - 3) * i +
      (i * 37 + 13 + 7 * c) % 33 - 16).toInt

  def fixtureAudioChannels(id: Long): Int = 1 + (id % 2).toInt
  def fixtureAudioSamples(id: Long): Int = 512 + ((id % 4) * 256).toInt

  /** The o-th-order fixed-predictor residual at position `i` (binomial
    * alternating weights, the inverse of [[restoreFixed]]).
    */
  private def fixedResidual(s: Array[Long], i: Int, o: Int): Long = o match {
    case 0 => s(i)
    case 1 => s(i) - s(i - 1)
    case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
    case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
    case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
  }

  /** One complete FLAC frame (header + subframes + CRC-16) over
    * already-decorrelated per-subframe signals: `subs(c)` with bit depth
    * `subBps(c)` (the side channel of a stereo pair carries bps+1).
    * `mode` -2 = CONSTANT, -1 = VERBATIM, 0..4 = FIXED order, 5 = LPC
    * with the supplied coefficients/shift/precision. Shared by
    * [[encodeStream]] (single frame, spec-exercise) and
    * [[fixtureAudioPayload]] (multi-frame corpus).
    */
  /** FLAC "UTF-8-style" coded number (frame or sample index): one raw
    * byte below 0x80, else an n-byte form with an n-ones lead and 6-bit
    * continuation bytes, n up to 7 (36 payload bits) — the exact
    * inverse of the decoder's continuation walk.
    */
  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 36), s"coded number $v exceeds 36 bits")
    if (v < 0x80) { w.bits(v, 8); return }
    var n = 2
    while (v >= (1L << (5 * n + 1))) n += 1
    var i = 0
    while (i < n) { w.bit(1); i += 1 }
    w.bit(0)
    val payloadBits = 5 * n + 1
    var remaining = payloadBits - (7 - n)
    w.bits(v >>> remaining, 7 - n)
    while (remaining > 0) {
      w.bits(2, 2) // continuation marker bits 10
      remaining -= 6
      w.bits((v >>> remaining) & 0x3f, 6)
    }
  }

  private def encodeFrameBytes(codedValue: Long, variable: Boolean,
      n: Int, chCode: Int,
      ssCode: Int, subs: Array[Array[Long]], subBps: Array[Int],
      mode: Int, po: Int, riceMethod: Int, wasted: Int,
      lpcCoefs: Array[Int], lpcShift: Int, lpcPrec: Int): Array[Byte] = {
    val w = new BitWriter()
    w.bits(0x3ffe, 14); w.bit(0)
    w.bit(if (variable) 1 else 0) // blocksize strategy
    w.bits(7, 4) // block size: 16-bit field at header end
    w.bits(0, 4) // sample rate: from STREAMINFO
    w.bits(chCode, 4)
    w.bits(ssCode, 3)
    w.bit(0)
    writeCodedNumber(w, codedValue)
    w.bits(n - 1, 16)
    val headerBytes = w.toBytes
    val w2 = new BitWriter()
    w2.bits(crc8(headerBytes, 0, headerBytes.length), 8)
    var c = 0
    while (c < subs.length) {
      val effBps = subBps(c) - wasted
      val mask = (1L << effBps) - 1
      w2.bit(0)
      w2.bits(mode match {
        case -2 => 0L
        case -1 => 1L
        case 5 => (0x20 | (lpcCoefs.length - 1)).toLong
        case o => (0x08 | o).toLong
      }, 6)
      if (wasted == 0) w2.bit(0)
      else {
        w2.bit(1)
        var k = 0
        while (k < wasted - 1) { w2.bit(0); k += 1 }
        w2.bit(1)
      }
      val s = subs(c).map { v =>
        require(wasted == 0 || (v & ((1L << wasted) - 1)) == 0,
          "samples must be divisible by 2^wasted")
        v >> wasted
      }
      mode match {
        case -2 =>
          require(s.forall(_ == s(0)), "CONSTANT needs a constant block")
          w2.bits(s(0) & mask, effBps)
        case -1 => s.foreach(v => w2.bits(v & mask, effBps))
        case m =>
          val order = if (m == 5) lpcCoefs.length else m
          var i = 0
          while (i < order) { w2.bits(s(i) & mask, effBps); i += 1 }
          if (m == 5) {
            w2.bits((lpcPrec - 1).toLong, 4)
            w2.bits((lpcShift & 0x1f).toLong, 5)
            lpcCoefs.foreach(co =>
              w2.bits(co.toLong & ((1L << lpcPrec) - 1), lpcPrec))
          }
          val r = Array.tabulate(n - order) { j =>
            if (m == 5) {
              var acc = 0L
              var k = 0
              while (k < order) {
                acc += lpcCoefs(k).toLong * s(j + order - 1 - k); k += 1
              }
              s(j + order) - (acc >> lpcShift)
            } else fixedResidual(s, j + order, m)
          }
          w2.bits(riceMethod.toLong, 2)
          w2.bits(po.toLong, 4)
          val pBits = if (riceMethod == 0) 4 else 5
          val escape = (1 << pBits) - 1
          var idx = 0
          var part = 0
          while (part < (1 << po)) {
            val count = (n >> po) - (if (part == 0) order else 0)
            val us = Array.tabulate(count) { j =>
              val v = r(idx + j)
              if (v >= 0) 2L * v else -2L * v - 1
            }
            val maxU = if (us.isEmpty) 0L else us.max
            val p = math.min(escape - 1, math.max(0,
              64 - java.lang.Long.numberOfLeadingZeros(maxU | 1L) - 4))
            w2.bits(p.toLong, pBits)
            us.foreach { u =>
              var q = (u >>> p).toInt
              while (q > 0) { w2.bit(0); q -= 1 }
              w2.bit(1)
              w2.bits(u & ((1L << p) - 1), p)
            }
            idx += count
            part += 1
          }
      }
      c += 1
    }
    val frame = headerBytes ++ w2.toBytes
    frame ++ beBytes(crc16(frame, 0, frame.length).toLong, 2)
  }

  /** Decorrelate a stereo pair per the channel-assignment code (8 =
    * left/side, 9 = right/side, 10 = mid/side; -1 = pass through) and
    * report each subframe's bit depth (side carries bps+1).
    */
  private def decorrelate(chans: Array[Array[Int]], stereo: Int,
      bps: Int): (Array[Array[Long]], Array[Int]) = {
    require(stereo == -1 || (stereo >= 8 && stereo <= 10 &&
      chans.length == 2),
      "stereo decorrelation needs exactly 2 channels and code 8..10")
    val n = if (chans.isEmpty) 0 else chans(0).length
    // Long: the side channel of a 32-bit pair is 33-bit, and the
    // mid-channel sum would overflow Int before its shift
    def side = Array.tabulate(n)(i => chans(0)(i).toLong - chans(1)(i))
    val subs = stereo match {
      case -1 => chans.map(_.map(_.toLong))
      case 8 => Array(chans(0).map(_.toLong), side)
      case 9 => Array(side, chans(1).map(_.toLong))
      case _ => Array(
        Array.tabulate(n)(i => (chans(0)(i).toLong + chans(1)(i)) >> 1),
        side)
    }
    val subBps = Array.tabulate(subs.length) { c =>
      bps + (stereo match {
        case 8 | 10 => if (c == 1) 1 else 0
        case 9 => if (c == 0) 1 else 0
        case _ => 0
      })
    }
    (subs, subBps)
  }

  /** Single-frame stream from explicit per-channel PCM — the
    * spec-exercise encoder: `mode` -2 encodes CONSTANT (all samples must
    * be equal), -1 VERBATIM, 0..4 the FIXED order, 5 LPC with the
    * supplied quantized coefficients (`lpcCoefs`/`lpcShift`/`lpcPrec` —
    * lossless for ANY coefficient set, since the residual is computed
    * against the same integer prediction the decoder replays); `wasted`
    * > 0 requires every sample divisible by 2^wasted; `riceMethod`
    * selects the 4- or 5-bit parameter width; `stereo` 8/9/10 encodes a
    * 2-channel input as left/side, right/side or mid/side. Rice
    * parameters are chosen per partition so unary quotients stay short
    * at any signal scale. Lets the specs walk every decoder path the
    * generated fixture family does not reach.
    */
  def encodeStream(chans: Array[Array[Int]], rate: Int, bps: Int,
      mode: Int, po: Int = 0, wasted: Int = 0,
      riceMethod: Int = 0, stereo: Int = -1,
      lpcCoefs: Array[Int] = null, lpcShift: Int = 0,
      lpcPrec: Int = 0): Array[Byte] = {
    val channels = chans.length
    require(channels >= 1 && channels <= 8, "1..8 channels")
    val n = chans(0).length
    require(chans.forall(_.length == n), "ragged channels")
    val order0 =
      if (mode == 5) {
        require(lpcCoefs != null && lpcCoefs.nonEmpty &&
          lpcCoefs.length <= 32, "LPC needs 1..32 coefficients")
        require(lpcPrec >= 2 && lpcPrec <= 15,
          "LPC coefficient precision 2..15")
        require(lpcShift >= 0 && lpcShift <= 15, "LPC shift 0..15")
        lpcCoefs.foreach(co => require(
          co >= -(1 << (lpcPrec - 1)) && co < (1 << (lpcPrec - 1)),
          s"coefficient $co exceeds $lpcPrec-bit precision"))
        lpcCoefs.length
      } else math.max(mode, 0)
    require(mode >= -2 && mode <= 5 && n > order0,
      s"mode $mode needs more than $order0 samples")
    require(n % (1 << po) == 0 && (n >> po) >= order0,
      s"partition order $po incompatible with block size $n")
    require(riceMethod == 0 || riceMethod == 1, "rice method 0 or 1")
    val (subs, subBps) = decorrelate(chans, stereo, bps)
    val chCode = if (stereo == -1) channels - 1 else stereo
    val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | n.toLong
    val streaminfo = beBytes(n.toLong, 2) ++ beBytes(n.toLong, 2) ++
      beBytes(0, 3) ++ beBytes(0, 3) ++ beBytes(packed, 8) ++
      new Array[Byte](16)
    val head = "fLaC".getBytes("US-ASCII") ++
      beBytes(0x80L, 1) ++ beBytes(34, 3) ++ streaminfo
    head ++ encodeFrameBytes(0L, variable = false, n, chCode, 0, subs,
      subBps, mode, po, riceMethod, wasted, lpcCoefs, lpcShift, lpcPrec)
  }

  /** Multi-frame VARIABLE-blocksize stream (strategy bit 1, coded
    * SAMPLE numbers — multi-byte from frame 2 on): FIXED(2) subframes
    * over explicit per-frame block sizes. Spec-exercise surface for the
    * paths the fixed-blocksize family cannot reach.
    */
  def encodeVariableStream(chans: Array[Array[Int]], rate: Int, bps: Int,
      blockSizes: Array[Int]): Array[Byte] = {
    val channels = chans.length
    require(channels >= 1 && channels <= 8, "1..8 channels")
    val total = chans(0).length
    require(chans.forall(_.length == total), "ragged channels")
    require(blockSizes.nonEmpty && blockSizes.sum == total,
      s"block sizes must cover all $total samples")
    require(blockSizes.forall(b => b > 2 && b <= 65536),
      "each variable block needs 3..65536 samples (FIXED(2) warmup)")
    val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total.toLong
    val streaminfo = beBytes(blockSizes.min.toLong, 2) ++
      beBytes(blockSizes.max.toLong, 2) ++
      beBytes(0, 3) ++ beBytes(0, 3) ++ beBytes(packed, 8) ++
      new Array[Byte](16)
    val out = new java.io.ByteArrayOutputStream()
    val head = "fLaC".getBytes("US-ASCII") ++
      beBytes(0x80L, 1) ++ beBytes(34, 3) ++ streaminfo
    out.write(head, 0, head.length)
    var written = 0
    blockSizes.foreach { n =>
      val subs = Array.tabulate(channels, n)(
        (c, i) => chans(c)(written + i).toLong)
      val frame = encodeFrameBytes(written.toLong, variable = true, n,
        channels - 1, 0, subs, Array.fill(channels)(bps),
        mode = 2, po = 0, riceMethod = 0, wasted = 0, null, 0, 0)
      out.write(frame, 0, frame.length)
      written += n
    }
    out.toByteArray
  }

  /** doc_id → a complete decodable FLAC stream: STREAMINFO, then the
    * signal above as multiple frames — fixed-size-512 normally, a
    * VARIABLE 448/320/512 cycle with coded sample numbers on id%5==3 —
    * partition order id%2, 16- or 24-bit samples, 1 or 2 channels.
    * The corpus rotates through the predictor families and stereo
    * modes — id%3 selects FIXED(2) / LPC(2) [4,-2]>>1 / LPC(3)
    * [6,-6,2]>>1 (integer-exact emulations of the fixed predictors, so
    * the LPC path is exercised with genuinely shifted quantized
    * coefficients), and (id/2)%4 selects independent / left-side /
    * right-side / mid-side for the 2-channel half. Every rotation is
    * LOSSLESS, so the decoded PCM is the same closed form for every id
    * and the SQL oracle regenerating [[fixtureSample]] is untouched.
    */
  def fixtureAudioPayload(id: Long): Array[Byte] = {
    val rate = 8000 + ((id % 6) * 8000).toInt
    val channels = fixtureAudioChannels(id)
    // id%20==15 rotates in 32-BIT stereo — always decorrelated (the
    // (id/2)%4 table gives code 8 or 10 for these ids), so the side
    // subframe carries 33 bits and the decoder's Long sample path runs
    // against every 20th shard. Sample VALUES are the same closed form
    // (the oracle is bps-independent); only the coded width changes.
    val bps =
      if (id % 20 == 15) 32 else 16 + ((id % 2) * 8).toInt
    val total = fixtureAudioSamples(id)
    val block = 512
    val (mode, lpcCoefs, lpcShift, lpcPrec): (Int, Array[Int], Int, Int) =
      (id % 3).toInt match {
        case 0 => (2, null, 0, 0)
        case 1 => (5, Array(4, -2), 1, 4) // (4a-2b)>>1 = 2a-b, exact
        case _ => (5, Array(6, -6, 2), 1, 4) // (6a-6b+2c)>>1, exact
      }
    val stereo =
      if (channels == 2) Array(-1, 8, 9, 10)(((id / 2) % 4).toInt)
      else -1
    val po = (id % 2).toInt
    val ssCode = bps match { case 16 => 4; case 24 => 6; case _ => 7 }
    // blocksize strategy rotation (id%5==3): VARIABLE streams cycle
    // 448/320/512-sample frames (remainders stay even and > 2), coded
    // numbers become multi-byte SAMPLE indexes from frame 2 on —
    // another lossless re-layout, the decoded PCM and oracle unchanged
    val variable = id % 5 == 3
    val sizes: Seq[Int] =
      if (!variable) {
        Seq.unfold(0)(w =>
          if (w >= total) None
          else Some((math.min(block, total - w), w + block)))
      } else {
        val cyc = Array(448, 320, 512)
        Seq.unfold((0, 0)) { case (w, k) =>
          if (w >= total) None
          else {
            val n = math.min(cyc(k % 3), total - w)
            Some((n, (w + n, k + 1)))
          }
        }
      }
    val packed = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total.toLong
    val streaminfo = beBytes(sizes.min.toLong, 2) ++
      beBytes(sizes.max.toLong, 2) ++
      beBytes(0, 3) ++ beBytes(0, 3) ++ beBytes(packed, 8) ++
      new Array[Byte](16)
    val head = "fLaC".getBytes("US-ASCII") ++
      beBytes(0x80L, 1) ++ beBytes(34, 3) ++ streaminfo
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    var written = 0
    var frameIdx = 0
    sizes.foreach { n =>
      val chans = Array.tabulate(channels, n)((c, i) =>
        fixtureSample(id, c, written + i))
      val (subs, subBps) = decorrelate(chans, stereo, bps)
      val chCode = if (stereo == -1) channels - 1 else stereo
      val frame = encodeFrameBytes(
        if (variable) written.toLong else frameIdx.toLong, variable,
        n, chCode, ssCode, subs,
        subBps, mode, po, riceMethod = 0, wasted = 0,
        lpcCoefs, lpcShift, lpcPrec)
      out.write(frame, 0, frame.length)
      written += n
      frameIdx += 1
    }
    out.toByteArray
  }
}
