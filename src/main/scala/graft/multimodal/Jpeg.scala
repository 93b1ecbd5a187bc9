package graft.multimodal

/** Baseline-DCT JPEG (ITU-T T.81), pure JVM, zero external libraries —
  * the codec tier above [[Media.HeaderDecoder]]'s container parsing: a
  * real entropy DECODER (marker parse, DQT/DHT table build, canonical
  * Huffman decode with byte-unstuffing and restart markers, dequantize,
  * separable IDCT, level shift) plus the ENCODER that builds the
  * deterministic fixtures the decoder is value-oracled against.
  *
  * Scope (documented, not hidden): baseline/extended sequential Huffman
  * (SOF0/SOF1) AND progressive Huffman (SOF2 — spectral selection and
  * successive approximation, DC and AC refinement, EOBn runs), 8-bit
  * precision, single-component (grayscale) scans AND three-component
  * (YCbCr) interleaved scans at the sampling layouts real corpora
  * actually use — 4:4:4, 4:2:2, 4:2:0 (generic Hi/Vi MCU interleave per
  * T.81 A.2.3, so other factors decode too). Chroma is upsampled by
  * sample replication and converted to RGB with the BT.601 full-range
  * JFIF matrix, rounded floor(x+0.5) so the closed-form fixture oracle
  * can reproduce every output pixel. Arithmetic coding and 4-component
  * (CMYK) streams are rejected LOUDLY — a corpus shard hitting one gets
  * an error naming the unsupported mode, never a wrong pixel.
  *
  * The Huffman/quantization constants below are the public Annex K
  * example tables from the T.81 spec itself.
  */
object Jpeg {

  /** Zigzag scan order: position k in the stream → natural (row-major)
    * coefficient index.
    */
  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.3.1 luminance DC table: code-length counts (lengths 1..16)
  // and the symbol values in code order.
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray

  // Annex K.3.2 luminance AC table.
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Flat quantization table (all 16): keeps the DC basis arithmetic
    * exact (16/8 = 2) so fixtures have closed-form pixels.
    */
  val QuantFlat16: Array[Int] = Array.fill(64)(16)

  /** Canonical Huffman code assignment: value → (code, length). The same
    * derivation JPEG decoders run from a DHT segment, used here by the
    * encoder so streams are decodable by ANY baseline decoder.
    */
  private def canonicalCodes(bits: Array[Int],
      vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = Map.newBuilder[Int, (Int, Int)]
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  private lazy val DcCodes = canonicalCodes(DcBits, DcVals)
  private lazy val AcCodes = canonicalCodes(AcBits, AcVals)

  // ---- bit I/O ---------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec-mandated). */
    def flush(): Unit = if (n > 0) { put(0xff, 8 - n); }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    /** Set when the reader walks into a non-stuffing marker. */
    var atMarker: Int = -1
    def nextBit(): Int = {
      if (n == 0) {
        if (atMarker >= 0) throw new IllegalArgumentException(
          f"entropy data ended at marker 0xff$atMarker%02x")
        require(pos < data.length, "truncated entropy data")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < data.length, "truncated after 0xff")
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed literal 0xff
          else {
            atMarker = m
            throw new IllegalArgumentException(
              f"entropy data ended at marker 0xff$m%02x")
          }
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      n = 0
      require(pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
        ((data(pos + 1) & 0xff) & 0xf8) == 0xd0,
        s"expected restart marker at $pos")
      pos += 2
    }
  }

  /** DC/AC magnitude category (T.81 F.1.2.1.1): bit length of |v|. */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(
    math.abs(v))

  /** EXTEND (T.81 F.2.2.1): map `len` received bits back to the signed
    * coefficient value.
    */
  private def extend(bits: Int, len: Int): Int =
    if (len == 0) 0
    else if (bits < (1 << (len - 1))) bits - (1 << len) + 1
    else bits

  // ---- encoder ---------------------------------------------------------

  /** Encode an 8-bit grayscale baseline JPEG from QUANTIZED coefficient
    * blocks (natural order, block (bx, by) row-major). The stream uses
    * the Annex K example tables, so any compliant decoder reproduces it.
    * `restartInterval` > 0 emits a DRI segment and RSTn markers every
    * that many MCUs (byte-aligned, DC predictor reset) — the
    * error-recovery structure long scans carry in the wild.
    */
  def encodeGray(w: Int, h: Int, quant: Array[Int],
      blocks: (Int, Int) => Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && quant.length == 64)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xdb); be16(67); out.write(0x00) // DQT: Pq=0 Tq=0
    var k = 0
    while (k < 64) { out.write(quant(Zigzag(k))); k += 1 }
    marker(0xc0); be16(11) // SOF0: 8-bit, 1 component, no subsampling
    out.write(8); be16(h); be16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    def dht(clazz: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length); out.write(clazz << 4)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    if (restartInterval > 0) { marker(0xdd); be16(4); be16(restartInterval) }
    marker(0xda); be16(8) // SOS: 1 component, tables 0/0, full spectral
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    var bw = new BitWriter(out)
    def emit(codes: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (c, l) = codes(sym)
      bw.put(c, l)
    }
    var prevDc = 0
    var mcu = 0
    var rstIdx = 0
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush() // byte-align before the marker
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          prevDc = 0
          bw = new BitWriter(out)
        }
        mcu += 1
        val coef = blocks(bx, by)
        require(coef.length == 64)
        val diff = coef(0) - prevDc
        prevDc = coef(0)
        val s = category(diff)
        emit(DcCodes, s)
        if (s > 0)
          bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        // AC run-length over zigzag positions 1..63
        var run = 0
        var kk = 1
        while (kk < 64) {
          val v = coef(Zigzag(kk))
          if (v == 0) run += 1
          else {
            while (run >= 16) { emit(AcCodes, 0xf0); run -= 16 } // ZRL
            val sa = category(v)
            emit(AcCodes, (run << 4) | sa)
            bw.put(if (v < 0) v + (1 << sa) - 1 else v, sa)
            run = 0
          }
          kk += 1
        }
        if (run > 0) emit(AcCodes, 0x00) // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a 3-component (YCbCr) baseline interleaved JPEG from
    * QUANTIZED coefficient blocks: `blocks(comp, bx, by)` addresses each
    * component's own block grid (the luma grid is `hv`-times denser per
    * the sampling). Component 1 carries `hv` sampling on quant table 0;
    * chroma components are 1x1 on quant table 1; all three share the
    * Annex K luminance Huffman tables (legal, and keeps the stream
    * minimal). `hv` = (2,2) is 4:2:0, (2,1) is 4:2:2, (1,1) is 4:4:4.
    */
  def encodeColor(w: Int, h: Int, quantLuma: Array[Int],
      quantChroma: Array[Int], hv: (Int, Int),
      blocks: (Int, Int, Int) => Array[Int],
      restartInterval: Int = 0): Array[Byte] = {
    val (hl, vl) = hv
    require(w > 0 && h > 0 && quantLuma.length == 64 &&
      quantChroma.length == 64 && hl >= 1 && hl <= 2 && vl >= 1 && vl <= 2)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    def dqt(tq: Int, q: Array[Int]): Unit = {
      marker(0xdb); be16(67); out.write(tq)
      var k = 0
      while (k < 64) { out.write(q(Zigzag(k))); k += 1 }
    }
    dqt(0, quantLuma)
    dqt(1, quantChroma)
    marker(0xc0); be16(8 + 3 * 3) // SOF0: 8-bit, 3 components
    out.write(8); be16(h); be16(w); out.write(3)
    out.write(1); out.write((hl << 4) | vl); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    def dht(clazz: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length); out.write(clazz << 4)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    if (restartInterval > 0) { marker(0xdd); be16(4); be16(restartInterval) }
    marker(0xda); be16(6 + 2 * 3) // SOS: all 3 components, tables 0/0
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x00)
    out.write(3); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    var bw = new BitWriter(out)
    val prevDc = new Array[Int](3)
    def emitBlock(coef: Array[Int], ci: Int): Unit = {
      require(coef.length == 64)
      val diff = coef(0) - prevDc(ci)
      prevDc(ci) = coef(0)
      val s = category(diff)
      val (dc, dl) = DcCodes(s)
      bw.put(dc, dl)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var run = 0
      var kk = 1
      while (kk < 64) {
        val v = coef(Zigzag(kk))
        if (v == 0) run += 1
        else {
          while (run >= 16) {
            val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl); run -= 16
          }
          val sa = category(v)
          val (ac, al) = AcCodes((run << 4) | sa)
          bw.put(ac, al)
          bw.put(if (v < 0) v + (1 << sa) - 1 else v, sa)
          run = 0
        }
        kk += 1
      }
      if (run > 0) { val (ec, el) = AcCodes(0x00); bw.put(ec, el) }
    }
    val mcusX = (w + 8 * hl - 1) / (8 * hl)
    val mcusY = (h + 8 * vl - 1) / (8 * vl)
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush() // byte-align before the marker
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(prevDc, 0)
          bw = new BitWriter(out)
        }
        mcu += 1
        var v = 0
        while (v < vl) {
          var hb = 0
          while (hb < hl) {
            emitBlock(blocks(0, mx * hl + hb, my * vl + v), 0); hb += 1
          }
          v += 1
        }
        emitBlock(blocks(1, mx, my), 1)
        emitBlock(blocks(2, mx, my), 2)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode a PROGRESSIVE (SOF2) JPEG from quantized coefficient blocks —
    * the same `blocks(comp, bx, by)` contract as [[encodeColor]]
    * (`nComp == 1` ignores the chroma arguments and encodes grayscale).
    * Fixed scan script exercising BOTH progressive mechanisms:
    *
    *   1. DC first, all components interleaved, Al=1
    *   2. AC first per component — luma split into spectral bands 1..5
    *      and 6..63, chroma as one band — at Al=1
    *   3. DC refinement (Ah=1 → Al=0), one raw bit per block
    *   4. AC refinement per component to full precision
    *
    * End-of-band runs are flushed per block (run length 1, symbol 0x00)
    * so the Annex K AC table — which carries no EOBn>1 symbols — stays
    * sufficient; decoders still exercise the general EOBn machinery via
    * externally encoded streams (see JpegProgressiveSpec's ImageIO
    * round-trip).
    */
  def encodeProgressive(w: Int, h: Int, quantLuma: Array[Int],
      quantChroma: Array[Int], hv: (Int, Int), nComp: Int,
      blocks: (Int, Int, Int) => Array[Int]): Array[Byte] = {
    require(nComp == 1 || nComp == 3, s"nComp must be 1 or 3, got $nComp")
    val (hl, vl) = if (nComp == 1) (1, 1) else hv
    require(w > 0 && h > 0 && quantLuma.length == 64 &&
      quantChroma.length == 64 && hl >= 1 && hl <= 2 && vl >= 1 && vl <= 2)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    def dqt(tq: Int, q: Array[Int]): Unit = {
      marker(0xdb); be16(67); out.write(tq)
      var k = 0
      while (k < 64) { out.write(q(Zigzag(k))); k += 1 }
    }
    dqt(0, quantLuma)
    if (nComp == 3) dqt(1, quantChroma)
    marker(0xc2); be16(8 + 3 * nComp) // SOF2
    out.write(8); be16(h); be16(w); out.write(nComp)
    var ci0 = 0
    while (ci0 < nComp) {
      out.write(ci0 + 1)
      out.write(if (ci0 == 0) (hl << 4) | vl else 0x11)
      out.write(if (ci0 == 0) 0 else 1)
      ci0 += 1
    }
    def dht(clazz: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length); out.write(clazz << 4)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    val mcusX = (w + 8 * hl - 1) / (8 * hl)
    val mcusY = (h + 8 * vl - 1) / (8 * vl)
    def hi(ci: Int) = if (ci == 0) hl else 1
    def vi(ci: Int) = if (ci == 0) vl else 1
    // non-interleaved grid per component (T.81 A.2.2)
    def grid(ci: Int): (Int, Int) = {
      val cw = (w * hi(ci) + hl - 1) / hl
      val ch = (h * vi(ci) + vl - 1) / vl
      ((cw + 7) / 8, (ch + 7) / 8)
    }
    def sos(sel: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); be16(6 + 2 * sel.length); out.write(sel.length)
      sel.foreach { ci => out.write(ci + 1); out.write(0x00) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    /** Interleaved walk over every (comp, bx, by) block in MCU order. */
    def mcuWalk(f: (Int, Int, Int) => Unit): Unit = {
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var ci = 0
          while (ci < nComp) {
            var v = 0
            while (v < vi(ci)) {
              var hb = 0
              while (hb < hi(ci)) {
                f(ci, mx * hi(ci) + hb, my * vi(ci) + v)
                hb += 1
              }
              v += 1
            }
            ci += 1
          }
          mx += 1
        }
        my += 1
      }
    }
    def dcFirstScan(al: Int): Unit = {
      sos(0 until nComp, 0, 0, 0, al)
      val bw = new BitWriter(out)
      val prev = new Array[Int](nComp)
      mcuWalk { (ci, bx, by) =>
        val dc = blocks(ci, bx, by)(0) >> al // arithmetic shift (T.81 G.1.2.1)
        val diff = dc - prev(ci)
        prev(ci) = dc
        val s = category(diff)
        val (c, l) = DcCodes(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
      bw.flush()
    }
    def dcRefineScan(al: Int): Unit = {
      sos(0 until nComp, 0, 0, al + 1, al)
      val bw = new BitWriter(out)
      mcuWalk { (ci, bx, by) =>
        bw.put((blocks(ci, bx, by)(0) >> al) & 1, 1)
      }
      bw.flush()
    }
    def acFirstScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(ci), ss, se, 0, al)
      val bw = new BitWriter(out)
      val (nbx, nby) = grid(ci)
      var by = 0
      while (by < nby) {
        var bx = 0
        while (bx < nbx) {
          val coef = blocks(ci, bx, by)
          var r = 0
          var k = ss
          while (k <= se) {
            val v0 = coef(Zigzag(k))
            val v = if (v0 < 0) -((-v0) >> al) else v0 >> al // magnitude shift
            if (v == 0) r += 1
            else {
              while (r > 15) {
                val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl); r -= 16
              }
              val s = category(v)
              val (ac, alen) = AcCodes((r << 4) | s)
              bw.put(ac, alen)
              bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
              r = 0
            }
            k += 1
          }
          if (r > 0) { val (ec, el) = AcCodes(0x00); bw.put(ec, el) } // EOB(1)
          bx += 1
        }
        by += 1
      }
      bw.flush()
    }
    // T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine with per-block EOB flush:
    // correction bits buffer after each symbol; zeros past the last newly-
    // significant coefficient fold into the block's EOB.
    def acRefineScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(ci), ss, se, al + 1, al)
      val bw = new BitWriter(out)
      val (nbx, nby) = grid(ci)
      var by = 0
      while (by < nby) {
        var bx = 0
        while (bx < nbx) {
          val coef = blocks(ci, bx, by)
          val ab = new Array[Int](se + 1)
          var eobPos = ss - 1
          var k = ss
          while (k <= se) {
            ab(k) = math.abs(coef(Zigzag(k))) >> al
            if (ab(k) == 1) eobPos = k
            k += 1
          }
          var r = 0
          val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
          def flushPending(): Unit = {
            pending.foreach(b => bw.put(b, 1)); pending.clear()
          }
          k = ss
          while (k <= se) {
            val t = ab(k)
            if (t == 0) r += 1
            else {
              // ZRLs are emitted on ARRIVAL at any nonzero (libjpeg
              // order): the decoder's post-ZRL advance stops at the 16th
              // zero-history position, so correction bits buffered past a
              // >15-zero run must ride with the NEXT symbol, not this ZRL
              while (r > 15 && k <= eobPos) {
                val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl); r -= 16
                flushPending()
              }
              if (t > 1) pending += (t & 1) // already significant
              else {
                val (ac, alen) = AcCodes((r << 4) | 1)
                bw.put(ac, alen)
                bw.put(if (coef(Zigzag(k)) >= 0) 1 else 0, 1)
                flushPending()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || pending.nonEmpty) {
            val (ec, el) = AcCodes(0x00) // EOB run of exactly 1
            bw.put(ec, el)
            flushPending()
          }
          bx += 1
        }
        by += 1
      }
      bw.flush()
    }
    dcFirstScan(1)
    acFirstScan(0, 1, 5, 1)
    acFirstScan(0, 6, 63, 1)
    var ci1 = 1
    while (ci1 < nComp) { acFirstScan(ci1, 1, 63, 1); ci1 += 1 }
    dcRefineScan(0)
    acRefineScan(0, 1, 5, 0)
    acRefineScan(0, 6, 63, 0)
    var ci2 = 1
    while (ci2 < nComp) { acRefineScan(ci2, 1, 63, 0); ci2 += 1 }
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ---------------------------------------------------------

  /** channels = 1: `pixels` are gray 0..255; channels = 3: packed
    * 0xRRGGBB.
    */
  final case class JpegImage(width: Int, height: Int, pixels: Array[Int],
      channels: Int = 1)

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // (length, code) → symbol via the canonical assignment
    private val table: Map[(Int, Int), Int] = {
      var code = 0
      var k = 0
      val b = Map.newBuilder[(Int, Int), Int]
      var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len - 1)) {
          b += (len, code) -> vals(k); code += 1; k += 1; i += 1
        }
        code <<= 1
        len += 1
      }
      b.result()
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.nextBit()
        len += 1
        table.get((len, code)) match {
          case Some(v) => return v
          case None =>
        }
      }
      throw new IllegalArgumentException("invalid Huffman code in scan")
    }
  }

  private val CosTable: Array[Array[Double]] = Array.tabulate(8, 8) {
    (x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16) *
        (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
  }

  /** Separable 2D type-III DCT (the JPEG IDCT), 1/4 total normalization:
    * rows then columns, each with the 1/2 factor folded in.
    */
  private def idct8x8(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTable(x)(u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = 0.5 * s
        x += 1
      }
      y += 1
    }
    val outA = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTable(yy)(v) * tmp(v * 8 + x); v += 1 }
        outA(yy * 8 + x) = 0.5 * s
        yy += 1
      }
      x += 1
    }
    outA
  }

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode a JPEG: baseline/extended-sequential (SOF0/SOF1) or
    * PROGRESSIVE (SOF2, spectral selection + successive approximation),
    * grayscale or 3-component interleaved YCbCr with generic Hi/Vi
    * sampling (T.81 A.2.3 MCU order) — 4:4:4, 4:2:2 and 4:2:0 in
    * practice. All scans accumulate into per-component quantized
    * coefficient planes; dequantize + IDCT run once at the end, so a
    * progressive stream decodes to EXACTLY the pixels of the equivalent
    * sequential stream (same coefficients in, same IDCT out). Color
    * output replicate-upsamples chroma and applies the BT.601 full-range
    * JFIF matrix with floor(x+0.5) rounding, so a DC-only fixture's
    * every output pixel has a closed form an oracle can recompute.
    *
    * Progressive scan semantics follow T.81 G.1/G.2 (the libjpeg-
    * compatible reading): DC first scans code diffs of `dc >> Al`; DC
    * refinements append one raw bit per block; AC first scans run-length
    * the band with EOBn end-of-band runs; AC refinements interleave
    * newly-significant ±(1<<Al) values with correction bits for already-
    * nonzero coefficients (verified against a 50k-case encode/decode
    * simulation and the JDK decoder). Arithmetic coding and 4-component
    * (CMYK) streams are rejected loudly.
    */
  def decode(data: Array[Byte]): JpegImage = Torn.guard("JPEG") {
    require(data.length >= 4 && (data(0) & 0xff) == 0xff &&
      (data(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    var pos = 2
    var width = -1
    var height = -1
    var progressive = false
    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var restartInterval = 0
    var hmax = 0
    var vmax = 0
    var mcusX = 0
    var mcusY = 0
    // per-component quantized coefficient storage: MCU-padded block grid
    // (blocksW x blocksH blocks of 64 natural-order ints)
    var coefs: Array[Array[Int]] = null
    var blocksW: Array[Int] = null
    var blocksH: Array[Int] = null
    var sawScan = false
    def be16(o: Int): Int = ((data(o) & 0xff) << 8) | (data(o + 1) & 0xff)

    def parseFrame(body: Int, prog: Boolean): Unit = {
      progressive = prog
      height = be16(body + 1); width = be16(body + 3)
      require(width > 0 && height > 0 &&
        width.toLong * height <= (1L << 26),
        s"scale guard: refusing a $width x $height frame")
      val nComp = data(body + 5) & 0xff
      require(nComp == 1 || nComp == 3,
        s"only 1-component (grayscale) or 3-component (YCbCr) frames" +
          s" supported, got $nComp")
      comps = Array.tabulate(nComp) { i =>
        val o = body + 6 + 3 * i
        val hv = data(o + 1) & 0xff
        Comp(data(o) & 0xff, hv >> 4, hv & 0x0f, data(o + 2) & 0x0f)
      }
      comps.foreach { c =>
        require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
          s"invalid sampling factors ${c.h}x${c.v}")
      }
      if (nComp == 1)
        require(comps(0).h == 1 && comps(0).v == 1,
          "subsampling unsupported for single-component")
      hmax = comps.map(_.h).max
      vmax = comps.map(_.v).max
      mcusX = (width + 8 * hmax - 1) / (8 * hmax)
      mcusY = (height + 8 * vmax - 1) / (8 * vmax)
      blocksW = Array.tabulate(nComp)(i => mcusX * comps(i).h)
      blocksH = Array.tabulate(nComp)(i => mcusY * comps(i).v)
      coefs = Array.tabulate(nComp)(i =>
        new Array[Int](blocksW(i) * blocksH(i) * 64))
    }

    /** Decode one scan (SOS at segPos with segment length len); returns
      * the position of the next marker after the entropy data.
      */
    def decodeScan(segPos: Int, len: Int): Int = {
      require(comps != null, "SOS before SOF")
      val body = segPos + 4
      val ns = data(body) & 0xff
      val scIdx = new Array[Int](ns)
      val scSel = new Array[(Int, Int)](ns)
      var i = 0
      while (i < ns) {
        val cid = data(body + 1 + 2 * i) & 0xff
        val idx = comps.indexWhere(_.id == cid)
        require(idx >= 0, s"scan references unknown component id $cid")
        scIdx(i) = idx
        val t = data(body + 2 + 2 * i) & 0xff
        scSel(i) = (t >> 4, t & 0x0f)
        i += 1
      }
      val ss = data(body + 1 + 2 * ns) & 0xff
      val se = data(body + 2 + 2 * ns) & 0xff
      val ahal = data(body + 3 + 2 * ns) & 0xff
      val ah = ahal >> 4
      val al = ahal & 0x0f
      if (!progressive) {
        require(ns == comps.length,
          s"scan must interleave all ${comps.length} frame components," +
            s" got $ns (partial sequential scans unsupported)")
        var j = 0
        while (j < ns) {
          require(scIdx(j) == j,
            s"scan component order must match SOF (component $j is id" +
              s" ${comps(scIdx(j)).id})")
          j += 1
        }
        require(ss == 0 && se == 63 && ah == 0 && al == 0,
          "sequential scan must cover the full spectrum at full precision")
      } else {
        if (ss == 0) require(se == 0,
          "progressive DC scan must have Se=0 (spectral selection splits" +
            " DC from AC)")
        else {
          require(ns == 1, "progressive AC scans must be non-interleaved")
          require(se >= ss && se <= 63, s"invalid spectral band $ss..$se")
        }
        if (ns > 1) require(ns == comps.length && scIdx.zipWithIndex
          .forall { case (ci, j) => ci == j },
          "interleaved progressive scan must cover the SOF components in" +
            " order")
        require(ah == 0 || ah == al + 1,
          "successive approximation must refine exactly one bit per scan")
      }
      val isDc = ss == 0
      val refining = ah > 0
      val dcs = Array.tabulate(ns) { j =>
        if (!progressive || (isDc && !refining)) {
          val t = dcTables(scSel(j)._1)
          require(t != null, s"missing DC table ${scSel(j)._1}")
          t
        } else null
      }
      val acs = Array.tabulate(ns) { j =>
        if (!progressive || !isDc) {
          val t = acTables(scSel(j)._2)
          require(t != null, s"missing AC table ${scSel(j)._2}")
          t
        } else null
      }
      val br = new BitReader(data, segPos + 2 + len)
      val prevDc = new Array[Int](ns)
      var eobrun = 0
      val p1 = 1 << al

      def sequentialBlock(j: Int, c: Array[Int], off: Int): Unit = {
        val s = dcs(j).decode(br)
        prevDc(j) += extend(br.receive(s), s)
        c(off) = prevDc(j)
        var k = 1
        while (k < 64) {
          val rs = acs(j).decode(br)
          if (rs == 0x00) k = 64 // EOB
          else if (rs == 0xf0) k += 16 // ZRL
          else {
            k += rs >> 4
            require(k < 64, "AC run past block end")
            val sa = rs & 0x0f
            c(off + Zigzag(k)) = extend(br.receive(sa), sa)
            k += 1
          }
        }
      }

      def acFirstBlock(j: Int, c: Array[Int], off: Int): Unit = {
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          while (k <= se) {
            val rs = acs(j).decode(br)
            val r = rs >> 4
            val sMag = rs & 0x0f
            if (sMag == 0) {
              if (r < 15) {
                eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
                k = se + 1
              } else k += 16 // ZRL
            } else {
              k += r
              require(k <= se, "AC run past band end")
              c(off + Zigzag(k)) = extend(br.receive(sMag), sMag) << al
              k += 1
            }
          }
        }
      }

      // T.81 G.2 / libjpeg decode_mcu_AC_refine: newly-significant values
      // arrive as ±(1<<Al); every already-nonzero coefficient passed costs
      // one correction bit; EOBn covers whole blocks whose nonzero
      // coefficients still consume correction bits.
      def acRefineBlock(j: Int, c: Array[Int], off: Int): Unit = {
        def correct(z: Int): Unit =
          if (br.nextBit() == 1 && (math.abs(c(z)) & p1) == 0)
            c(z) += (if (c(z) >= 0) p1 else -p1)
        var k = ss
        if (eobrun == 0) {
          var atEob = false
          while (k <= se && !atEob) {
            val rs = acs(j).decode(br)
            var r = rs >> 4
            val sMag = rs & 0x0f
            var newval = 0
            if (sMag == 0) {
              if (r < 15) {
                eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
                atEob = true
              }
              // r == 15: ZRL — skip 16 zero-history coefficients below
            } else {
              require(sMag == 1, "invalid magnitude in AC refinement scan")
              newval = if (br.nextBit() == 1) p1 else -p1
            }
            if (!atEob) {
              var advancing = true
              while (advancing && k <= se) {
                val z = off + Zigzag(k)
                if (c(z) != 0) { correct(z); k += 1 }
                else {
                  r -= 1
                  if (r < 0) advancing = false else k += 1
                }
              }
              if (sMag != 0) {
                require(k <= se, "AC refinement position past band end")
                c(off + Zigzag(k)) = newval
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val z = off + Zigzag(k)
            if (c(z) != 0) correct(z)
            k += 1
          }
          eobrun -= 1
        }
      }

      def decodeUnit(j: Int, bx: Int, by: Int): Unit = {
        val ci = scIdx(j)
        val c = coefs(ci)
        val off = (by * blocksW(ci) + bx) * 64
        if (!progressive) sequentialBlock(j, c, off)
        else if (isDc && !refining) {
          val s = dcs(j).decode(br)
          prevDc(j) += extend(br.receive(s), s)
          c(off) = prevDc(j) << al
        } else if (isDc) {
          if (br.nextBit() == 1) c(off) |= p1
        } else if (!refining) acFirstBlock(j, c, off)
        else acRefineBlock(j, c, off)
      }

      def atRestart(unit: Int): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.restart()
          java.util.Arrays.fill(prevDc, 0)
          eobrun = 0
        }

      if (ns > 1) {
        var mcu = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            atRestart(mcu)
            var j = 0
            while (j < ns) {
              val c = comps(scIdx(j))
              var v = 0
              while (v < c.v) {
                var hb = 0
                while (hb < c.h) {
                  decodeUnit(j, mx * c.h + hb, my * c.v + v)
                  hb += 1
                }
                v += 1
              }
              j += 1
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
      } else {
        // non-interleaved: the component's OWN block grid (T.81 A.2.2 —
        // ceil of the scaled dimensions, NOT the MCU-padded grid)
        val c = comps(scIdx(0))
        val compW = (width * c.h + hmax - 1) / hmax
        val compH = (height * c.v + vmax - 1) / vmax
        val nbx = (compW + 7) / 8
        val nby = (compH + 7) / 8
        var blk = 0
        var by = 0
        while (by < nby) {
          var bx = 0
          while (bx < nbx) {
            atRestart(blk)
            decodeUnit(0, bx, by)
            blk += 1
            bx += 1
          }
          by += 1
        }
      }
      // skip pad bits / stuffed bytes up to the next marker
      var p = br.pos
      while (p + 1 < data.length &&
          !((data(p) & 0xff) == 0xff && (data(p + 1) & 0xff) != 0x00))
        p += 1
      require(p + 1 < data.length, "truncated JPEG after scan data")
      p
    }

    var done = false
    while (!done) {
      require(pos + 2 <= data.length, "truncated JPEG segment stream")
      require((data(pos) & 0xff) == 0xff,
        f"expected marker at $pos, got 0x${data(pos) & 0xff}%02x")
      val m = data(pos + 1) & 0xff
      if (m == 0xd9) done = true // EOI
      else {
        require(pos + 4 <= data.length, "truncated JPEG segment stream")
        val len = be16(pos + 2)
        require(pos + 2 + len <= data.length,
          f"truncated JPEG: segment 0xff$m%02x runs past end of data")
        val body = pos + 4
        var nextPos = pos + 2 + len
        m match {
          case 0xdb => // DQT: one or more (PqTq, 64 entries) tables
            var o = body
            while (o < pos + 2 + len) {
              val pq = (data(o) & 0xff) >> 4
              val tq = data(o) & 0x0f
              require(pq == 0, "16-bit quantization tables unsupported")
              val q = new Array[Int](64)
              var i = 0
              while (i < 64) { q(Zigzag(i)) = data(o + 1 + i) & 0xff; i += 1 }
              quantTables(tq) = q
              o += 65
            }
          case 0xc0 | 0xc1 => parseFrame(body, prog = false)
          case 0xc2 => parseFrame(body, prog = true)
          case 0xc4 => // DHT: one or more tables
            var o = body
            while (o < pos + 2 + len) {
              val clazz = (data(o) & 0xff) >> 4
              val id = data(o) & 0x0f
              val bits = Array.tabulate(16)(i => data(o + 1 + i) & 0xff)
              val nVals = bits.sum
              val vals = Array.tabulate(nVals)(i => data(o + 17 + i) & 0xff)
              val t = new HuffTable(bits, vals)
              if (clazz == 0) dcTables(id) = t else acTables(id) = t
              o += 17 + nVals
            }
          case 0xdd => restartInterval = be16(body)
          case 0xda =>
            sawScan = true
            nextPos = decodeScan(pos, len)
          case _ if m >= 0xe0 && m <= 0xef => // APPn: skip
          case 0xfe => // COM: skip
          case other => throw new IllegalArgumentException(
            f"unsupported JPEG marker 0xff$other%02x")
        }
        pos = nextPos
      }
    }
    require(width > 0 && height > 0 && sawScan, "no scan data before EOI")
    val nc = comps.length
    // dequantize + IDCT every stored block into MCU-aligned sample planes
    val planeW = Array.tabulate(nc)(i => blocksW(i) * 8)
    val planes = Array.tabulate(nc)(i =>
      new Array[Int](planeW(i) * blocksH(i) * 8))
    val quants = comps.map { c =>
      val q = quantTables(c.tq)
      require(q != null, s"missing quant table ${c.tq}")
      q
    }
    var ci = 0
    while (ci < nc) {
      val q = quants(ci)
      val cstore = coefs(ci)
      val pw = planeW(ci)
      var by = 0
      while (by < blocksH(ci)) {
        var bx = 0
        while (bx < blocksW(ci)) {
          val off = (by * blocksW(ci) + bx) * 64
          val coef = new Array[Double](64)
          var i = 0
          while (i < 64) { coef(i) = cstore(off + i).toDouble * q(i); i += 1 }
          val px = idct8x8(coef)
          val bx0 = bx * 8
          val by0 = by * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val s2 = math.round(px(yy * 8 + xx)).toInt + 128
              planes(ci)((by0 + yy) * pw + (bx0 + xx)) =
                math.max(0, math.min(255, s2))
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    val pixels = new Array[Int](width * height)
    if (nc == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          pixels(y * width + x) = planes(0)(y * pw + x)
          x += 1
        }
        y += 1
      }
      JpegImage(width, height, pixels, channels = 1)
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          // replicate upsampling: component sample at floor(x*Hi/Hmax)
          val yv = planes(0)(
            (y * comps(0).v / vmax) * planeW(0) + (x * comps(0).h / hmax))
          val cb = planes(1)(
            (y * comps(1).v / vmax) * planeW(1) + (x * comps(1).h / hmax)) -
            128
          val cr = planes(2)(
            (y * comps(2).v / vmax) * planeW(2) + (x * comps(2).h / hmax)) -
            128
          def clamp(d: Double): Int = {
            val r = math.floor(d + 0.5).toInt
            math.max(0, math.min(255, r))
          }
          val r = clamp(yv + 1.402 * cr)
          val g = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          val b = clamp(yv + 1.772 * cb)
          pixels(y * width + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      JpegImage(width, height, pixels, channels = 3)
    }
  }

  // ---- deterministic fixture -------------------------------------------

  /** doc_id → a real grayscale JPEG whose every 8×8 block is DC-only
    * with quantized DC ((id + 7·bx + 13·by) mod 64) − 32. With the
    * flat-16 quant table the IDCT of a DC-only block is exactly
    * 128 + 2·dc at every sample (16/8 = 2, no rounding, no clamp in
    * range), so pixel sums have a closed form an oracle recomputes.
    *
    * Every third id (id ≡ 2 mod 3) encodes PROGRESSIVE (SOF2) instead of
    * baseline — identical coefficients, hence bit-identical decoded
    * pixels and an unchanged oracle — so the batch decode queries
    * (mm_decode_batch, mm_thumbnail_jpeg, …) exercise both entropy
    * modes the way a real mixed crawl corpus would.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val w = 8 * (2 + (id % 5).toInt)
    val h = 8 * (2 + ((id * 3) % 4).toInt)
    val gen = (bx: Int, by: Int) => {
      val coef = new Array[Int](64)
      coef(0) = ((id + 7L * bx + 13L * by) % 64).toInt - 32
      coef
    }
    if (id % 3 == 2)
      encodeProgressive(w, h, QuantFlat16, QuantFlat16, (1, 1), 1,
        (_, bx, by) => gen(bx, by))
    else encodeGray(w, h, QuantFlat16, gen)
  }

  /** doc_id → a real 4:2:0 YCbCr baseline JPEG: every block DC-only on
    * the flat-16 quant table, so each decoded 8×8 luma block is the flat
    * value 128 + 2·dcY and each 8×8 chroma block covers a whole 16×16
    * macroblock with flat 128 + 2·dcC. Dimensions are multiples of 16
    * (no edge crop), every Y/Cb/Cr value stays inside [64, 191], and the
    * RGB conversion is the documented floor(x+0.5) — the full pixel and
    * per-channel sums have closed forms a SQL oracle recomputes from
    * doc_id alone.
    *
    * Like [[fixturePayload]], every third id (id ≡ 2 mod 3) encodes
    * PROGRESSIVE — same coefficients, bit-identical pixels, unchanged
    * oracle — so mm_decode_color chews mixed baseline/SOF2 color too.
    */
  def fixtureColorPayload(id: Long): Array[Byte] = {
    val w = 16 * (1 + (id % 3).toInt)
    val h = 16 * (1 + ((id * 5) % 3).toInt)
    val gen = (c: Int, bx: Int, by: Int) => {
      val coef = new Array[Int](64)
      coef(0) = c match {
        case 0 => ((id + 7L * bx + 13L * by) % 64).toInt - 32
        case 1 => ((id * 3 + 5L * bx + 11L * by) % 48).toInt - 24
        case _ => ((id * 7 + 3L * bx + 17L * by) % 48).toInt - 24
      }
      coef
    }
    if (id % 3 == 2)
      encodeProgressive(w, h, QuantFlat16, QuantFlat16, (2, 2), 3, gen)
    else encodeColor(w, h, QuantFlat16, QuantFlat16, (2, 2), gen)
  }
}
