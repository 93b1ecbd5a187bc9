package graft.multimodal

/** VP8L (WebP LOSSLESS) pixel decoder + fixture encoder (pure JVM) —
  * the lossless half of the WebP bitstream family, closing the
  * pixel-decode seam [[Webp]]'s metadata tier documented: LSB-first bit
  * stream, canonical (DEFLATE-ordered) Huffman codes in both the SIMPLE
  * (1/2-symbol) and code-length-coded normal forms, the
  * {17,18,0,1,...}-ordered code-length code with repeat codes 16/17/18
  * and the max-symbol cap, LZ77 backward references with the
  * prefix+extra-bits value coding, the 1<<1..11-entry color cache
  * (0x1e35a7bd multiplicative hash), meta-Huffman group images, and all
  * four transforms — PREDICTOR (14 spatial modes over power-of-two
  * tiles), COLOR (per-tile signed cross-channel deltas), SUBTRACT-GREEN
  * and COLOR-INDEXING (delta-coded palette with 1/2/4/8-per-byte pixel
  * bundling).
  *
  * Format is the public "WebP Lossless Bitstream Specification"
  * (Google, also RFC 9649). Decoded streams roundtrip bit-exactly
  * against this module's own [[encode]] and the closed-form fixture
  * oracle; NO JVM WebP reader exists in this environment (unlike the
  * PNG/TIFF tiers' ImageIO cross-validation), so the two spec corner
  * conventions that admit a reading — the Select tie-break (ties take
  * T), the top-right pixel at a row's end (the contiguous-buffer
  * wrap to (0, y), the libwebp layout convention), and a single-symbol
  * code arriving through the NORMAL (code-length-coded) form, which
  * here must declare length 1 and costs 1 bit per symbol (libwebp
  * assigns such tables a 0-bit code; this repo's encoder emits the
  * simple-code form for single symbols, so the divergence is
  * interop-visible only on foreign streams using that rare shape) —
  * are pinned here by documentation and spec-line comments rather
  * than an external reader.
  *
  * Documented loud-reject seams: 2D-locality distance codes (the
  * <=120 neighborhood map — this decoder requires plain distances,
  * code 120+d) and the VP8 LOSSY entropy tier, which stays out of
  * scope for a stated reason: its default probability tables
  * (coefficient probs, kf mode probs — thousands of spec constants)
  * cannot be transcribed offline with any way to verify them, and a
  * wrong-constant decoder would be worse than an honest boundary.
  *
  * Beyond-reference multimodal surface (SURVEY §5 scope).
  */
object Vp8l {

  final case class Vp8lImage(width: Int, height: Int, hasAlpha: Boolean,
      pixels: Array[Int]) // ARGB, row-major

  // -------------------------------------------------------------------
  // LSB-first bit IO (VP8L is little-endian at the bit level; Huffman
  // code BITS are read most-significant-first through this reader, the
  // DEFLATE packing convention the spec shares)

  private final class BitReader(p: Array[Byte], start: Int) {
    private var pos = start
    private var bit = 0
    def readBit(): Int = {
      require(pos < p.length, "torn VP8L: read past end of stream")
      val b = (p(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << nBits
      nBits += 1
      if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { writeBit((v >> i) & 1); i += 1 }
    }
    /** A Huffman code: its bits go most-significant-first. */
    def huff(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBit((code >> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { buf.write(cur); cur = 0; nBits = 0 }
      buf.toByteArray
    }
  }

  // -------------------------------------------------------------------
  // Canonical Huffman (DEFLATE ordering: shorter lengths first, ties by
  // symbol index), decoded incrementally bit-by-bit

  private val MaxCodeLen = 15

  private final class Huffman private (
      val single: Int, // >= 0: zero-bit single-symbol code
      counts: Array[Int], sorted: Array[Int]) {
    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= MaxCodeLen) {
        code |= br.readBit()
        val n = counts(len)
        if (code - first < n) return sorted(index + code - first)
        index += n
        first = (first + n) << 1
        code <<= 1
        len += 1
      }
      throw new IllegalArgumentException(
        "invalid VP8L Huffman code (over-long bit pattern)")
    }
  }

  private object Huffman {
    def singleSymbol(sym: Int): Huffman = new Huffman(sym, null, null)
    /** Simple 2-symbol code in STREAM order: symbols[0] takes code 0
      * regardless of value order (spec §6.2.1).
      */
    def pair(first: Int, second: Int): Huffman = {
      val counts = new Array[Int](MaxCodeLen + 1)
      counts(1) = 2
      new Huffman(-1, counts, Array(first, second))
    }
    def fromLengths(lengths: Array[Int]): Huffman = {
      val counts = new Array[Int](MaxCodeLen + 1)
      var used = 0
      var lone = -1
      lengths.foreach { l =>
        require(l >= 0 && l <= MaxCodeLen, s"code length $l out of range")
        if (l > 0) { counts(l) += 1; used += 1 }
      }
      require(used > 0, "VP8L Huffman code with no symbols")
      if (used == 1) {
        lone = lengths.indexWhere(_ > 0)
        // a lone symbol carried through the normal grammar decodes with
        // one bit (its declared length must be 1 for a complete read)
        require(lengths(lone) == 1,
          "single-symbol normal code must have length 1")
      }
      // Kraft completeness: an over- or under-subscribed code is torn
      var left = 1
      for (l <- 1 to MaxCodeLen) {
        left <<= 1
        left -= counts(l)
        require(left >= 0, "over-subscribed VP8L Huffman code")
      }
      require(left == 0 || used == 1,
        "incomplete VP8L Huffman code")
      val sorted = lengths.indices.filter(lengths(_) > 0)
        .sortBy(i => (lengths(i), i)).toArray
      new Huffman(-1, counts, sorted)
    }
    /** Canonical code values per symbol (encoder side). */
    def codes(lengths: Array[Int]): Array[Int] = {
      val counts = new Array[Int](MaxCodeLen + 1)
      lengths.foreach(l => if (l > 0) counts(l) += 1)
      val next = new Array[Int](MaxCodeLen + 1)
      var code = 0
      for (l <- 1 to MaxCodeLen) {
        code = (code + counts(l - 1)) << 1
        next(l) = code
      }
      val out = new Array[Int](lengths.length)
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l > 0) { out(i) = next(l); next(l) += 1 }
        i += 1
      }
      out
    }
    /** Length-limited Huffman lengths from symbol frequencies (simple
      * tree build; fixture-scale inputs keep depths far below 15, and a
      * depth overflow rejects loudly rather than emitting a torn code).
      */
    def lengthsFor(freq: Array[Int]): Array[Int] = {
      val used = freq.indices.filter(freq(_) > 0)
      val lengths = new Array[Int](freq.length)
      if (used.isEmpty) return lengths
      if (used.size == 1) { lengths(used.head) = 1; return lengths }
      // (weight, tiebreak, symbols-under-node)
      val pq = new scala.collection.mutable.PriorityQueue[
        (Long, Int, List[Int])]()(Ordering.by(t => (-t._1, -t._2)))
      var tie = 0
      used.foreach { s => pq.enqueue((freq(s).toLong, tie, List(s))); tie += 1 }
      while (pq.size > 1) {
        val a = pq.dequeue(); val b = pq.dequeue()
        (a._3 ++ b._3).foreach(s => lengths(s) += 1)
        pq.enqueue((a._1 + b._1, tie, a._3 ++ b._3)); tie += 1
      }
      require(lengths.forall(_ <= MaxCodeLen),
        "fixture Huffman depth exceeded 15 — flatten the input histogram")
      lengths
    }
  }

  // -------------------------------------------------------------------
  // Shared constants and small helpers

  // code-length-code transmission order (spec §6.2.2 / RFC 9649)
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Per-channel byte addition mod 256 (SWAR). */
  private def addPixels(a: Int, b: Int): Int = {
    val ag = ((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)
    val rb = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    ((ag & 0x00ff00ff) << 8) | (rb & 0x00ff00ff)
  }

  /** Per-channel byte subtraction mod 256 (SWAR, encoder side). */
  private def subPixels(a: Int, b: Int): Int = {
    val ag = ((a >>> 8) & 0x00ff00ff) - ((b >>> 8) & 0x00ff00ff) + 0x01000100
    val rb = (a & 0x00ff00ff) - (b & 0x00ff00ff) + 0x01000100
    ((ag & 0x00ff00ff) << 8) | (rb & 0x00ff00ff)
  }

  /** Per-channel (a+b)/2 (SWAR). */
  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Predictor-transform spatial modes 0..13 (spec §4.1). */
  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => // Select: the neighbor closer to the gradient T+L-TL;
        // ties take T (the spec's `<= 0` branch)
        var pL = 0
        var pT = 0
        var s = 0
        while (s < 32) {
          val lc = (l >>> s) & 0xff
          val tc = (t >>> s) & 0xff
          val tlc = (tl >>> s) & 0xff
          val g = lc + tc - tlc
          pL += math.abs(g - lc)
          pT += math.abs(g - tc)
          s += 8
        }
        if (pT <= pL) t else l
      case 12 => // ClampAddSubtractFull: clamp(L + T - TL) per channel
        var out = 0
        var s = 0
        while (s < 32) {
          val v = clip255(((l >>> s) & 0xff) + ((t >>> s) & 0xff) -
            ((tl >>> s) & 0xff))
          out |= v << s
          s += 8
        }
        out
      case 13 => // ClampAddSubtractHalf(Average2(L,T), TL):
        // clamp(a + (a - b)/2), /2 truncating toward zero like the spec
        val a = avg2(l, t)
        var out = 0
        var s = 0
        while (s < 32) {
          val ac = (a >>> s) & 0xff
          val bc = (tl >>> s) & 0xff
          out |= clip255(ac + (ac - bc) / 2) << s
          s += 8
        }
        out
      case m => throw new IllegalArgumentException(
        s"VP8L predictor mode $m (spec defines 0..13)")
    }

  /** ColorTransformDelta: signed-int8 product, arithmetic >> 5. */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  /** LZ77 prefix coding (spec §5.2.2): code -> value with extra bits. */
  private def prefixValue(br: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** Inverse of [[prefixValue]]: value -> (code, extraBits, extraVal). */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"prefix-coded value $v")
    if (v <= 4) (v - 1, 0, 0)
    else {
      val vm = v - 1
      val highest = 31 - Integer.numberOfLeadingZeros(vm)
      val extra = highest - 1
      val second = (vm >> extra) & 1
      (2 * highest + second, extra, vm & ((1 << extra) - 1))
    }
  }

  private def cacheHash(px: Int, bits: Int): Int =
    (0x1e35a7bd * px) >>> (32 - bits)

  // -------------------------------------------------------------------
  // Decoder

  private def readHuffman(br: BitReader, alphabetSize: Int): Huffman = {
    if (br.readBit() == 1) { // SIMPLE code: 1 or 2 symbols, <= 8 bits each
      val numSymbols = br.readBit() + 1
      val first = if (br.readBit() == 1) br.bits(8) else br.readBit()
      require(first < alphabetSize,
        s"simple-code symbol $first outside alphabet $alphabetSize")
      if (numSymbols == 1) Huffman.singleSymbol(first)
      else {
        val second = br.bits(8)
        require(second < alphabetSize && second != first,
          s"simple-code symbol pair ($first,$second) invalid")
        Huffman.pair(first, second)
      }
    } else { // normal: code-length-coded lengths
      val numCl = 4 + br.bits(4)
      require(numCl <= ClOrder.length, s"$numCl code-length codes")
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val clCode = Huffman.fromLengths(clLengths)
      // optional cap on the number of transmitted length symbols
      var remaining =
        if (br.readBit() == 1) {
          val nb = 2 + 2 * br.bits(3)
          2 + br.bits(nb)
        } else alphabetSize
      val lengths = new Array[Int](alphabetSize)
      var prev = 8 // spec default when no nonzero length seen yet
      var sym = 0
      while (sym < alphabetSize && remaining > 0) {
        remaining -= 1
        val c = clCode.decode(br)
        if (c < 16) {
          lengths(sym) = c
          sym += 1
          if (c != 0) prev = c
        } else {
          val (rep, fill) = c match {
            case 16 => (3 + br.bits(2), prev)
            case 17 => (3 + br.bits(3), 0)
            case _ => (11 + br.bits(7), 0)
          }
          require(sym + rep <= alphabetSize,
            s"repeat code overruns the $alphabetSize-symbol alphabet")
          if (fill != 0)
            java.util.Arrays.fill(lengths, sym, sym + rep, fill)
          sym += rep
        }
      }
      Huffman.fromLengths(lengths)
    }
  }

  private final case class Group(green: Huffman, red: Huffman,
      blue: Huffman, alpha: Huffman, dist: Huffman)

  private def readGroup(br: BitReader, cacheSize: Int): Group =
    Group(readHuffman(br, 256 + 24 + cacheSize), readHuffman(br, 256),
      readHuffman(br, 256), readHuffman(br, 256), readHuffman(br, 40))

  /** One entropy-coded ARGB image (spec §6.2): color cache, optional
    * meta-Huffman (top level only), Huffman groups, LZ77 + cache
    * symbols. Plain distances only — the <=120 2D-locality map is a
    * documented loud reject.
    */
  private def decodeEntropyImage(br: BitReader, w: Int, h: Int,
      level0: Boolean): Array[Int] = {
    val cacheBits =
      if (br.readBit() == 1) {
        val b = br.bits(4)
        require(b >= 1 && b <= 11, s"color-cache bits $b outside 1..11")
        b
      } else 0
    val cacheSize = if (cacheBits == 0) 0 else 1 << cacheBits
    var metaBits = 0
    var metaW = 0
    var meta: Array[Int] = null
    var nGroups = 1
    if (level0 && br.readBit() == 1) {
      metaBits = 2 + br.bits(3)
      metaW = subSize(w, metaBits)
      val metaImg =
        decodeEntropyImage(br, metaW, subSize(h, metaBits), level0 = false)
      meta = metaImg.map(p => (p >>> 8) & 0xffff) // (red<<8)|green
      nGroups = meta.max + 1
      require(nGroups <= 256, s"$nGroups meta-Huffman groups")
    }
    val groups = Array.fill(nGroups)(readGroup(br, cacheSize))
    val cache = new Array[Int](math.max(cacheSize, 1))
    val out = new Array[Int](w * h)
    val total = w * h
    var pos = 0
    while (pos < total) {
      val g =
        if (meta == null) groups(0)
        else {
          val x = pos % w
          val y = pos / w
          groups(meta((y >> metaBits) * metaW + (x >> metaBits)))
        }
      val s = g.green.decode(br)
      if (s < 256) { // literal: green, then red/blue/alpha codes
        val red = g.red.decode(br)
        val blue = g.blue.decode(br)
        val alpha = g.alpha.decode(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        if (cacheBits > 0) cache(cacheHash(px, cacheBits)) = px
        pos += 1
      } else if (s < 256 + 24) { // LZ77 backward reference
        val length = prefixValue(br, s - 256)
        val distVal = prefixValue(br, g.dist.decode(br))
        require(distVal > 120,
          "2D-locality distance codes (<=120) unsupported " +
            "(documented seam — plain distances only)")
        val dist = distVal - 120
        require(dist <= pos && pos + length <= total,
          s"LZ77 reference (dist=$dist len=$length) out of range at $pos")
        var k = 0
        while (k < length) {
          val px = out(pos - dist)
          out(pos) = px
          if (cacheBits > 0) cache(cacheHash(px, cacheBits)) = px
          pos += 1
          k += 1
        }
      } else { // color-cache hit
        require(cacheBits > 0, "cache symbol in a stream without a cache")
        val idx = s - 280
        require(idx < cacheSize, s"cache index $idx of $cacheSize")
        out(pos) = cache(idx)
        pos += 1
      }
    }
    out
  }

  // transform records, in STREAM order; inverses apply in reverse
  private sealed trait Transform
  private final case class PredictorTx(bits: Int, mw: Int,
      modes: Array[Int], w: Int) extends Transform
  private final case class ColorTx(bits: Int, mw: Int,
      elems: Array[Int], w: Int) extends Transform
  private case object SubtractGreenTx extends Transform
  private final case class IndexingTx(palette: Array[Int], widthBits: Int,
      fullW: Int) extends Transform

  /** Decode a bare VP8L stream (starting at the 0x2f signature byte). */
  def decodeStream(p: Array[Byte], off: Int): Vp8lImage = {
    require(off < p.length && (p(off) & 0xff) == 0x2f,
      "VP8L without its 0x2f signature")
    val br = new BitReader(p, off + 1)
    val w = 1 + br.bits(14)
    val h = 1 + br.bits(14)
    require(w.toLong * h <= (1L << 26),
      s"scale guard: refusing a $w x $h raster from a 4-byte header")
    val hasAlpha = br.readBit() == 1
    val version = br.bits(3)
    require(version == 0, s"VP8L version $version (spec pins 0)")
    var transforms = List.empty[Transform] // head = last read
    var seen = Set.empty[Int]
    var xsize = w // color-indexing bundling shrinks the coded width
    while (br.readBit() == 1) {
      val t = br.bits(2)
      require(!seen.contains(t), s"VP8L transform $t repeated")
      seen += t
      t match {
        case 0 =>
          val bits = 2 + br.bits(3)
          val mw = subSize(xsize, bits)
          val img = decodeEntropyImage(br, mw, subSize(h, bits),
            level0 = false)
          transforms ::= PredictorTx(bits, mw,
            img.map(p => (p >>> 8) & 0xff), xsize)
        case 1 =>
          val bits = 2 + br.bits(3)
          val mw = subSize(xsize, bits)
          val img = decodeEntropyImage(br, mw, subSize(h, bits),
            level0 = false)
          transforms ::= ColorTx(bits, mw, img, xsize)
        case 2 => transforms ::= SubtractGreenTx
        case _ =>
          val paletteSize = 1 + br.bits(8)
          val pal = decodeEntropyImage(br, paletteSize, 1, level0 = false)
          var i = 1
          while (i < paletteSize) { // palette entries are delta-coded
            pal(i) = addPixels(pal(i), pal(i - 1))
            i += 1
          }
          val widthBits =
            if (paletteSize <= 2) 3
            else if (paletteSize <= 4) 2
            else if (paletteSize <= 16) 1
            else 0
          transforms ::= IndexingTx(pal, widthBits, xsize)
          xsize = subSize(xsize, widthBits)
      }
    }
    var img = decodeEntropyImage(br, xsize, h, level0 = true)
    var curW = xsize
    transforms.foreach {
      case PredictorTx(bits, mw, modes, fullW) =>
        require(curW == fullW, "predictor transform width mismatch")
        var y = 0
        while (y < h) {
          var x = 0
          while (x < curW) {
            val pred =
              if (x == 0 && y == 0) 0xff000000
              else if (y == 0) img(x - 1) // top row: L regardless of mode
              else if (x == 0) img((y - 1) * curW) // left col: T
              else {
                val mode = modes((y >> bits) * mw + (x >> bits))
                val l = img(y * curW + x - 1)
                val t = img((y - 1) * curW + x)
                val tl = img((y - 1) * curW + x - 1)
                // TR at x = w-1 wraps to (0, y) — the contiguous-buffer
                // convention (already decoded: y*w < y*w + x here)
                val tr = img((y - 1) * curW + x + 1)
                predict(mode, l, t, tl, tr)
              }
            img(y * curW + x) = addPixels(img(y * curW + x), pred)
            x += 1
          }
          y += 1
        }
      case ColorTx(bits, mw, elems, fullW) =>
        require(curW == fullW, "color transform width mismatch")
        var y = 0
        while (y < h) {
          var x = 0
          while (x < curW) {
            val e = elems((y >> bits) * mw + (x >> bits))
            val g2r = e & 0xff
            val g2b = (e >>> 8) & 0xff
            val r2b = (e >>> 16) & 0xff
            val px = img(y * curW + x)
            val green = (px >>> 8) & 0xff
            val red = ((px >>> 16) + ctDelta(g2r, green)) & 0xff
            val blue =
              ((px & 0xff) + ctDelta(g2b, green) + ctDelta(r2b, red)) & 0xff
            img(y * curW + x) = (px & 0xff00ff00) | (red << 16) | blue
            x += 1
          }
          y += 1
        }
      case SubtractGreenTx =>
        var i = 0
        while (i < img.length) {
          val px = img(i)
          val g = (px >>> 8) & 0xff
          val r = ((px >>> 16) + g) & 0xff
          val b = ((px & 0xff) + g) & 0xff
          img(i) = (px & 0xff00ff00) | (r << 16) | b
          i += 1
        }
      case IndexingTx(pal, widthBits, fullW) =>
        val packedW = subSize(fullW, widthBits)
        require(curW == packedW, "color-indexing packed width mismatch")
        val bitsPerIdx = 8 >> widthBits
        val mask = (1 << bitsPerIdx) - 1
        val full = new Array[Int](fullW * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < fullW) {
            val packed = img(y * packedW + (x >> widthBits))
            val idx = (((packed >>> 8) & 0xff) >>>
              ((x & ((1 << widthBits) - 1)) * bitsPerIdx)) & mask
            require(idx < pal.length,
              s"palette index $idx past ${pal.length} entries")
            full(y * fullW + x) = pal(idx)
            x += 1
          }
          y += 1
        }
        img = full
        curW = fullW
    }
    require(curW == w, "transform chain did not restore the full width")
    Vp8lImage(w, h, hasAlpha, img)
  }

  /** Decode the VP8L chunk inside a RIFF/WEBP container. The lossy
    * "VP8 " payload rejects loudly with the documented reason.
    */
  def decode(p: Array[Byte]): Vp8lImage = {
    require(p.length > 20 && new String(p, 0, 4, "US-ASCII") == "RIFF" &&
      new String(p, 8, 4, "US-ASCII") == "WEBP",
      "not a RIFF/WEBP container")
    var o = 12
    while (o + 8 <= p.length) {
      val typ = new String(p, o, 4, "US-ASCII")
      val len = (p(o + 4) & 0xff) | ((p(o + 5) & 0xff) << 8) |
        ((p(o + 6) & 0xff) << 16) | ((p(o + 7) & 0xff) << 24)
      if (typ == "VP8L") return decodeStream(p, o + 8)
      if (typ == "VP8 ") throw new IllegalArgumentException(
        "VP8 lossy pixel decode unsupported (documented seam: its " +
          "default probability tables cannot be verified offline)")
      o += 8 + len + (len & 1)
    }
    throw new IllegalArgumentException("WEBP without a VP8L chunk")
  }

  // -------------------------------------------------------------------
  // Encoder (fixture side) — writes real VP8L streams: canonical
  // Huffman codes built from the actual symbol histograms, optional
  // color cache, dist-1 RLE backward references, meta-Huffman groups,
  // and the four transforms. Exact inverse of the decoder above, so
  // every stream roundtrips bit-exactly.

  final case class EncodeOptions(
      cacheBits: Int = 0, // 0 = no color cache
      rle: Boolean = false, // emit dist-1 copies for pixel runs
      metaBits: Int = 0, // 0 = single Huffman group
      subtractGreen: Boolean = false,
      predictorBits: Int = 0, // 0 = no predictor transform
      predictorMode: (Int, Int) => Int = (_, _) => 2,
      colorBits: Int = 0, // 0 = no color transform
      colorElem: (Int, Int) => Int = (_, _) => 0,
      palette: Array[Int] = null) // color-indexing (pixels must be entries)

  // one LZ77-ish token: literal pixel, cache hit, or dist-1 copy
  private sealed trait Token
  private final case class Lit(px: Int) extends Token
  private final case class CacheHit(idx: Int) extends Token
  private final case class Copy(len: Int) extends Token

  /** Tokenize a pixel array mirroring decoder cache/copy semantics. */
  private def tokenize(px: Array[Int], cacheBits: Int,
      rle: Boolean): Array[(Int, Token)] = {
    val cache = new Array[Int](if (cacheBits > 0) 1 << cacheBits else 1)
    val cacheValid = new Array[Boolean](cache.length)
    val out = Vector.newBuilder[(Int, Token)] // (start pos, token)
    var pos = 0
    def insert(p: Int): Unit = if (cacheBits > 0) {
      val hsh = cacheHash(p, cacheBits)
      cache(hsh) = p
      cacheValid(hsh) = true
    }
    while (pos < px.length) {
      var run = 0
      if (rle && pos > 0) {
        val prev = px(pos - 1)
        while (pos + run < px.length && px(pos + run) == prev &&
          run < 4096) run += 1
      }
      if (run >= 3) {
        out += ((pos, Copy(run)))
        var k = 0
        while (k < run) { insert(px(pos + k)); k += 1 }
        pos += run
      } else {
        val p = px(pos)
        val hsh = if (cacheBits > 0) cacheHash(p, cacheBits) else 0
        if (cacheBits > 0 && cacheValid(hsh) && cache(hsh) == p)
          out += ((pos, CacheHit(hsh)))
        else out += ((pos, Lit(p)))
        insert(p)
        pos += 1
      }
    }
    out.result().toArray
  }

  /** Write one Huffman code description (simple or normal form). */
  private def writeHuffman(bw: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.indices.filter(lengths(_) > 0)
    if (used.size == 1 && used.head < 256) {
      bw.writeBit(1) // simple
      bw.writeBit(0) // one symbol
      if (used.head == 0 || used.head == 1) {
        bw.writeBit(0); bw.writeBit(used.head)
      } else { bw.writeBit(1); bw.bits(used.head, 8) }
      return
    }
    if (used.size == 2 && used.forall(_ < 256) &&
      used.forall(lengths(_) == 1)) {
      bw.writeBit(1) // simple
      bw.writeBit(1) // two symbols
      // smaller symbol first: symbols[0] takes code 0 in the simple
      // form, which matches the canonical assignment [[Huffman.codes]]
      // used when writing the symbol stream below
      val sortedU = used.sorted
      val a = sortedU(0)
      val b = sortedU(1)
      if (a == 0 || a == 1) { bw.writeBit(0); bw.writeBit(a) }
      else { bw.writeBit(1); bw.bits(a, 8) }
      bw.bits(b, 8)
      return
    }
    bw.writeBit(0) // normal form
    // every length transmitted literally (no 16/17/18 repeats — legal,
    // just not minimal; fixtures favor decoder-path clarity)
    val clFreq = new Array[Int](19)
    lengths.foreach(l => clFreq(l) += 1)
    val clLengths = Huffman.lengthsFor(clFreq)
    val clCodes = Huffman.codes(clLengths)
    bw.bits(19 - 4, 4) // transmit all 19 code-length codes
    ClOrder.foreach(i => bw.bits(clLengths(i), 3))
    bw.writeBit(0) // no max-symbol cap
    lengths.foreach(l => bw.huff(clCodes(l), clLengths(l)))
  }

  /** Entropy-encode an ARGB image (mirrors [[decodeEntropyImage]]). */
  private def writeEntropyImage(bw: BitWriter, px: Array[Int], w: Int,
      h: Int, cacheBits: Int, rle: Boolean, level0: Boolean,
      metaBits: Int): Unit = {
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    if (cacheBits > 0) { bw.writeBit(1); bw.bits(cacheBits, 4) }
    else bw.writeBit(0)
    val tokens = tokenize(px, cacheBits, rle)
    // group assignment (meta-Huffman): tile parity, two groups — any
    // grid with >= 2 tiles contains both parities (adjacent tiles
    // differ), so nGroups matches what the decoder derives from the
    // entropy image's max index; a 1-tile grid degenerates to 1 group
    val metaW = if (metaBits > 0) subSize(w, metaBits) else 0
    val metaH = if (metaBits > 0) subSize(h, metaBits) else 0
    val nGroups = if (metaBits > 0 && metaW * metaH >= 2) 2 else 1
    def groupOf(pos: Int): Int =
      if (nGroups == 1) 0
      else {
        val tx = (pos % w) >> metaBits
        val ty = (pos / w) >> metaBits
        (tx + ty) % 2
      }
    if (level0) {
      if (metaBits > 0) {
        bw.writeBit(1)
        bw.bits(metaBits - 2, 3)
        val metaImg = Array.tabulate(metaW * metaH) { i =>
          val g = if (nGroups == 1) 0 else ((i % metaW) + (i / metaW)) % 2
          0xff000000 | (g << 8) // index in (red<<8)|green, red = 0
        }
        writeEntropyImage(bw, metaImg, metaW, metaH, cacheBits = 0,
          rle = false, level0 = false, metaBits = 0)
      } else bw.writeBit(0)
    } else require(metaBits == 0, "meta-Huffman is top-level only")
    // histograms per group
    val greenF = Array.fill(nGroups)(new Array[Int](256 + 24 + cacheSize))
    val redF = Array.fill(nGroups)(new Array[Int](256))
    val blueF = Array.fill(nGroups)(new Array[Int](256))
    val alphaF = Array.fill(nGroups)(new Array[Int](256))
    val distF = Array.fill(nGroups)(new Array[Int](40))
    tokens.foreach { case (pos, tok) =>
      val g = groupOf(pos)
      tok match {
        case Lit(p) =>
          greenF(g)((p >>> 8) & 0xff) += 1
          redF(g)((p >>> 16) & 0xff) += 1
          blueF(g)(p & 0xff) += 1
          alphaF(g)((p >>> 24) & 0xff) += 1
        case CacheHit(idx) => greenF(g)(280 + idx) += 1
        case Copy(len) =>
          greenF(g)(256 + prefixEncode(len)._1) += 1
          distF(g)(prefixEncode(121)._1) += 1 // dist 1 -> value 121
      }
    }
    // every code needs >= 1 symbol even if unused in this group
    for (g <- 0 until nGroups) {
      if (greenF(g).forall(_ == 0)) greenF(g)(0) = 1
      if (redF(g).forall(_ == 0)) redF(g)(0) = 1
      if (blueF(g).forall(_ == 0)) blueF(g)(0) = 1
      if (alphaF(g).forall(_ == 0)) alphaF(g)(0) = 1
      if (distF(g).forall(_ == 0)) distF(g)(0) = 1
    }
    val codes = (0 until nGroups).map { g =>
      Seq(greenF(g), redF(g), blueF(g), alphaF(g), distF(g)).map { f =>
        val lens = Huffman.lengthsFor(f)
        (lens, Huffman.codes(lens))
      }
    }
    codes.foreach(_.foreach { case (lens, _) => writeHuffman(bw, lens) })
    def put(g: Int, which: Int, sym: Int): Unit = {
      val (lens, cs) = codes(g)(which)
      // a code written in SIMPLE 1-symbol form costs zero bits; a
      // single-symbol code that fell through to the NORMAL form (symbol
      // >= 256, e.g. an all-copy green code) still costs its 1-bit
      // canonical code — mirror writeHuffman's branch exactly
      val used = lens.count(_ > 0)
      if (used == 1 && lens.indexWhere(_ > 0) < 256) return
      bw.huff(cs(sym), lens(sym))
    }
    tokens.foreach { case (pos, tok) =>
      val g = groupOf(pos)
      tok match {
        case Lit(p) =>
          put(g, 0, (p >>> 8) & 0xff)
          put(g, 1, (p >>> 16) & 0xff)
          put(g, 2, p & 0xff)
          put(g, 3, (p >>> 24) & 0xff)
        case CacheHit(idx) => put(g, 0, 280 + idx)
        case Copy(len) =>
          val (lc, le, lv) = prefixEncode(len)
          put(g, 0, 256 + lc)
          bw.bits(lv, le)
          val (dc, de, dv) = prefixEncode(121) // plain distance 1
          put(g, 4, dc)
          bw.bits(dv, de)
      }
    }
  }

  // -------------------------------------------------------------------
  // Closed-form fixture family (mirrored by the DuckDB oracle)

  def fixtureDims(id: Long): (Int, Int) =
    (8 + (id % 25).toInt, 8 + ((id * 3) % 21).toInt)

  def fixturePaletteSize(id: Long): Int =
    Array(2, 4, 16, 64)(((id / 6) % 4).toInt)

  /** The decoded ARGB value at (x, y) — a pure closed form of the id,
    * identical for every coding class (the rotation below is lossless).
    * x/4 plateaus make real RLE runs and cache hits; class id%6==4
    * draws from a small palette so color-indexing is honest.
    */
  def fixturePixel(id: Long, x: Int, y: Int): Int =
    if (id % 6 == 4) {
      val size = fixturePaletteSize(id)
      val i = ((x + y + id) % size).toInt
      0xff000000 | (((i * 37) % 256) << 16) | (((i * 59) % 256) << 8) |
        ((i * 83) % 256)
    } else {
      val r = (((x / 4) * 7 + y * 11 + id * 13) % 256).toInt
      val g = (((x / 4) * 3 + y * 5 + id * 17) % 256).toInt
      val b = (((x / 4) * 11 + y * 13 + id * 19) % 256).toInt
      val a =
        if (id % 3 == 1) (200 + ((x / 4 + y + id) % 56)).toInt else 255
      (a << 24) | (r << 16) | (g << 8) | b
    }

  /** doc_id → a complete VP8L WebP whose coding class (id%6) rotates
    * the features — plain literals (meta-Huffman groups on id%12==6),
    * color cache + RLE, subtract-green, predictor transform (all 14
    * modes over the corpus), palette (every bundling width), and
    * cross-color — while the DECODED pixels stay the closed form above
    * (lossless), so the SQL oracle regenerates [[fixturePixel]] and
    * never needs to know which coding path produced it.
    */
  def fixtureLosslessPayload(id: Long): Array[Byte] = {
    val (w, h) = fixtureDims(id)
    val px = Array.tabulate(w * h)(i => fixturePixel(id, i % w, i / w))
    val opts = (id % 6).toInt match {
      case 0 => EncodeOptions(metaBits = if (id % 12 == 6) 2 else 0)
      case 1 =>
        EncodeOptions(cacheBits = 1 + ((id / 6) % 11).toInt, rle = true)
      case 2 => EncodeOptions(subtractGreen = true, cacheBits = 6,
        rle = true)
      case 3 => EncodeOptions(predictorBits = 2 + ((id / 6) % 3).toInt,
        predictorMode = (tx, ty) => ((tx + ty * 3 + id) % 14).toInt)
      case 4 =>
        val size = fixturePaletteSize(id)
        EncodeOptions(palette = Array.tabulate(size)(i => 0xff000000 |
          (((i * 37) % 256) << 16) | (((i * 59) % 256) << 8) |
          ((i * 83) % 256)))
      case _ => EncodeOptions(colorBits = 2 + ((id / 6) % 3).toInt,
        colorElem = (tx, ty) => ((tx * 19 + ty * 7 + id) % 256).toInt |
          (((tx * 5 + ty * 11) % 256) << 8) |
          (((tx * 3 + ty * 13) % 256) << 16))
    }
    encode(w, h, px, opts)
  }

  /** Encode `pixels` (w x h ARGB) as a RIFF/WEBP VP8L file. */
  def encode(w: Int, h: Int, pixels: Array[Int],
      opts: EncodeOptions = EncodeOptions()): Array[Byte] = {
    require(pixels.length == w * h, "pixel buffer does not match dims")
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384,
      "VP8L dims are 14-bit")
    val bw = new BitWriter()
    val hasAlpha = pixels.exists(p => (p >>> 24) != 0xff)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.writeBit(if (hasAlpha) 1 else 0)
    bw.bits(0, 3) // version
    var img = pixels.clone()
    var curW = w
    // transforms, applied forward here in the order written; the decoder
    // inverts in reverse order
    if (opts.palette != null) {
      val pal = opts.palette
      require(pal.length >= 1 && pal.length <= 256, "palette size 1..256")
      bw.writeBit(1); bw.bits(3, 2) // COLOR_INDEXING
      bw.bits(pal.length - 1, 8)
      val delta = Array.tabulate(pal.length)(i =>
        if (i == 0) pal(0) else subPixels(pal(i), pal(i - 1)))
      writeEntropyImage(bw, delta, pal.length, 1, cacheBits = 0,
        rle = false, level0 = false, metaBits = 0)
      val widthBits =
        if (pal.length <= 2) 3
        else if (pal.length <= 4) 2
        else if (pal.length <= 16) 1
        else 0
      val lookup = pal.zipWithIndex.toMap
      val packedW = subSize(curW, widthBits)
      val bitsPerIdx = 8 >> widthBits
      val packed = new Array[Int](packedW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < curW) {
          val idx = lookup.getOrElse(img(y * curW + x),
            throw new IllegalArgumentException(
              "pixel not in the declared palette"))
          val slot = y * packedW + (x >> widthBits)
          packed(slot) = packed(slot) |
            ((idx << ((x & ((1 << widthBits) - 1)) * bitsPerIdx)) << 8)
          x += 1
        }
        y += 1
      }
      // packed image pixels need opaque alpha-zero shape? green carries
      // the bundle; other channels zero (the decoder only reads green)
      img = packed
      curW = packedW
    }
    if (opts.subtractGreen) {
      bw.writeBit(1); bw.bits(2, 2)
      img = img.map { px =>
        val g = (px >>> 8) & 0xff
        val r = ((px >>> 16) - g) & 0xff
        val b = ((px & 0xff) - g) & 0xff
        (px & 0xff00ff00) | (r << 16) | b
      }
    }
    if (opts.colorBits > 0) {
      require(opts.colorBits >= 2 && opts.colorBits <= 9, "color bits 2..9")
      bw.writeBit(1); bw.bits(1, 2)
      bw.bits(opts.colorBits - 2, 3)
      val mw = subSize(curW, opts.colorBits)
      val mh = subSize(h, opts.colorBits)
      val elems = Array.tabulate(mw * mh)(i =>
        opts.colorElem(i % mw, i / mw) & 0x00ffffff)
      writeEntropyImage(bw, elems.map(0xff000000 | _), mw, mh,
        cacheBits = 0, rle = false, level0 = false, metaBits = 0)
      val out = img.clone()
      var y = 0
      while (y < h) {
        var x = 0
        while (x < curW) {
          val e = elems((y >> opts.colorBits) * mw + (x >> opts.colorBits))
          val g2r = e & 0xff
          val g2b = (e >>> 8) & 0xff
          val r2b = (e >>> 16) & 0xff
          val px = img(y * curW + x)
          val green = (px >>> 8) & 0xff
          val redActual = (px >>> 16) & 0xff
          val red = (redActual - ctDelta(g2r, green)) & 0xff
          val blue = ((px & 0xff) - ctDelta(g2b, green) -
            ctDelta(r2b, redActual)) & 0xff
          out(y * curW + x) = (px & 0xff00ff00) | (red << 16) | blue
          x += 1
        }
        y += 1
      }
      img = out
    }
    if (opts.predictorBits > 0) {
      require(opts.predictorBits >= 2 && opts.predictorBits <= 9,
        "predictor bits 2..9")
      bw.writeBit(1); bw.bits(0, 2)
      bw.bits(opts.predictorBits - 2, 3)
      val mw = subSize(curW, opts.predictorBits)
      val mh = subSize(h, opts.predictorBits)
      val modes = Array.tabulate(mw * mh) { i =>
        val m = opts.predictorMode(i % mw, i / mw)
        require(m >= 0 && m <= 13, s"predictor mode $m")
        m
      }
      writeEntropyImage(bw, modes.map(m => 0xff000000 | (m << 8)), mw, mh,
        cacheBits = 0, rle = false, level0 = false, metaBits = 0)
      // residuals: actual - predict(actual neighbors), raster order
      val res = new Array[Int](img.length)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < curW) {
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) img(x - 1)
            else if (x == 0) img((y - 1) * curW)
            else {
              val mode =
                modes((y >> opts.predictorBits) * mw +
                  (x >> opts.predictorBits))
              predict(mode, img(y * curW + x - 1), img((y - 1) * curW + x),
                img((y - 1) * curW + x - 1), img((y - 1) * curW + x + 1))
            }
          res(y * curW + x) = subPixels(img(y * curW + x), pred)
          x += 1
        }
        y += 1
      }
      img = res
    }
    bw.writeBit(0) // end of transforms
    writeEntropyImage(bw, img, curW, h, opts.cacheBits, opts.rle,
      level0 = true, metaBits = opts.metaBits)
    val stream = Array(0x2f.toByte) ++ bw.toBytes
    // RIFF container
    val payloadLen = stream.length
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val chunk = "VP8L".getBytes("US-ASCII") ++ le32(payloadLen) ++
      stream ++
      (if (payloadLen % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
    "RIFF".getBytes("US-ASCII") ++ le32(chunk.length + 4) ++
      "WEBP".getBytes("US-ASCII") ++ chunk
  }
}
