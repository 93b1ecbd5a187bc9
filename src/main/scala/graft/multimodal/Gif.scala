package graft.multimodal

/** Real GIF pixel codec (pure JVM) — completes the image-container triple
  * next to [[Jpeg]] (lossy DCT) and [[Png]] (lossless filters+zlib): a
  * genuine variable-width LZW decoder/encoder with clear/EOI handling and
  * the spec's "early change" width bump, 255-byte sub-block framing,
  * global and local color tables, multi-frame animation, and GIF's
  * 4-pass row interlacing.
  *
  * The deterministic [[fixturePayload]] family is mirrored by the DuckDB
  * oracle formula-for-formula, and decode parity against the JDK's
  * ImageIO GIF reader is EXACT (indexed color is lossless) — see GifSpec.
  *
  * Reference context: the reference stores no binary media; this tier is
  * part of the beyond-reference multimodal surface (SURVEY §5 scope).
  */
object Gif {

  /** One decoded frame: packed 0xAARRGGBB pixels, row-major, full-screen
    * placement already applied.
    */
  final case class GifImage(width: Int, height: Int, interlaced: Boolean,
      frames: Vector[Array[Int]])

  // GIF interlace passes: (start row, step)
  private val Passes = Array((0, 8), (4, 8), (2, 4), (1, 2))

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  def decode(p: Array[Byte]): GifImage = Torn.guard("GIF") {
    require(p.length > 13 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F',
      "not a GIF signature")
    val w = le16(p, 6); val h = le16(p, 8)
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"scale guard: refusing a $w x $h logical screen")
    val flags = p(10) & 0xff
    var o = 13
    var gct: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      gct = Array.tabulate(n) { i =>
        (0xff << 24) | ((p(o + 3 * i) & 0xff) << 16) |
          ((p(o + 3 * i + 1) & 0xff) << 8) | (p(o + 3 * i + 2) & 0xff)
      }
      o += 3 * n
    }
    val frames = Vector.newBuilder[Array[Int]]
    var anyInterlace = false
    var done = false
    while (!done && o < p.length) {
      (p(o) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          o += 2
          while ((p(o) & 0xff) != 0) o += 1 + (p(o) & 0xff)
          o += 1
        case 0x2c =>
          val left = le16(p, o + 1); val top = le16(p, o + 3)
          val iw = le16(p, o + 5); val ih = le16(p, o + 7)
          val f = p(o + 9) & 0xff
          o += 10
          var table = gct
          if ((f & 0x80) != 0) {
            val n = 2 << (f & 7)
            table = Array.tabulate(n) { i =>
              (0xff << 24) | ((p(o + 3 * i) & 0xff) << 16) |
                ((p(o + 3 * i + 1) & 0xff) << 8) | (p(o + 3 * i + 2) & 0xff)
            }
            o += 3 * n
          }
          require(table != null, "GIF image without any color table")
          val interlaced = (f & 0x40) != 0
          anyInterlace ||= interlaced
          val minCode = p(o) & 0xff; o += 1
          // reassemble the sub-block-framed LZW stream
          val data = new java.io.ByteArrayOutputStream()
          while ((p(o) & 0xff) != 0) {
            val n = p(o) & 0xff
            data.write(p, o + 1, n)
            o += 1 + n
          }
          o += 1
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
          val frame = new Array[Int](w * h)
          // row order: interlaced frames store rows in 4-pass order
          val rows =
            if (!interlaced) (0 until ih).toArray
            else Passes.flatMap { case (s, st) => s until ih by st }
          var ri = 0
          while (ri < ih) {
            val y = rows(ri)
            var x = 0
            while (x < iw) {
              frame((top + y) * w + (left + x)) = table(idx(ri * iw + x))
              x += 1
            }
            ri += 1
          }
          frames += frame
        case b =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$b%02x")
      }
    }
    GifImage(w, h, anyInterlace, frames.result())
  }

  /** Variable-width LZW with the GIF "early change": the code width bumps
    * as soon as the NEXT entry to assign would need it (12-bit cap).
    */
  private def lzwDecode(z: Array[Byte], minCode: Int,
      nPixels: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Int](nPixels)
    var outN = 0
    // dictionary as (prefix code, appended index); roots are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var next = eoi + 1
    var width = minCode + 1
    var bitPos = 0
    def read(): Int = {
      var v = 0
      var i = 0
      while (i < width) {
        val byteI = bitPos >> 3
        if (byteI >= z.length) return eoi // truncated → stop loudly below
        if ((z(byteI) & (1 << (bitPos & 7))) != 0) v |= 1 << i
        bitPos += 1
        i += 1
      }
      v
    }
    def emit(code: Int): Int = { // returns first index of the string
      // walk the chain into a stack, then unwind
      var stack = List.empty[Int]
      var c = code
      while (c >= clear) { stack = append(c) :: stack; c = prefix(c) }
      stack = c :: stack
      val first = c
      stack.foreach { v => out(outN) = v; outN += 1 }
      first
    }
    var prev = -1
    var stop = false
    while (!stop && outN < nPixels) {
      val code = read()
      if (code == eoi) stop = true
      else if (code == clear) { next = eoi + 1; width = minCode + 1; prev = -1 }
      else if (prev < 0) { emit(code); prev = code }
      else {
        require(code <= next, s"LZW code $code beyond dictionary $next")
        val first =
          if (code < next) emit(code)
          else { // code == next: the KwKwK case
            var c = prev
            while (c >= clear) c = prefix(c)
            val f = c
            emit(prev); out(outN) = f; outN += 1
            f
          }
        if (next < 4096) {
          prefix(next) = prev; append(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(outN == nPixels,
      s"LZW stream ended at $outN of $nPixels pixels")
    out
  }

  private def lzwEncode(idx: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0
    var curBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      cur |= code << curBits
      curBits += width
      while (curBits >= 8) { out.write(cur & 0xff); cur >>>= 8; curBits -= 8 }
    }
    // dictionary: (prefix code, index) → code
    var dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    def key(p: Int, k: Int): Long = (p.toLong << 12) | k
    put(clear)
    var prev = -1
    idx.foreach { k =>
      if (prev < 0) prev = k
      else {
        val c = dict.get(key(prev, k))
        if (c != null) prev = c
        else {
          put(prev)
          dict.put(key(prev, k), next)
          next += 1
          // early change: widen as soon as code `next-1` was assigned
          // at the limit, so the NEXT emitted code uses the new width
          if (next - 1 == (1 << width) && width < 12) width += 1
          if (next == 4096) { // full: clear and restart
            put(clear); dict = new java.util.HashMap[Long, Integer]()
            next = eoi + 1; width = minCode + 1
          }
          prev = k
        }
      }
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (curBits > 0) out.write(cur & 0xff)
    out.toByteArray
  }

  /** Real multi-frame GIF89a: global color table, per-frame graphic
    * control extensions, genuine LZW image data in 255-byte sub-blocks,
    * optional interlaced row order. `sample(x, y, frame)` supplies the
    * palette index.
    */
  def encode(w: Int, h: Int, frames: Int, palette: Array[Int],
      interlace: Boolean, sample: (Int, Int, Int) => Int): Array[Byte] = {
    require(palette.length >= 4 && (palette.length & (palette.length - 1)) == 0,
      "palette size must be a power of two >= 4")
    val sizeCode = 31 - Integer.numberOfLeadingZeros(palette.length) - 1
    val minCode = math.max(2, sizeCode + 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0x80 | sizeCode) // GCT present
    out.write(0); out.write(0)
    palette.foreach { rgb =>
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
    }
    (0 until frames).foreach { f =>
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(new Array[Byte](4), 0, 4); out.write(0)
      out.write(0x2c)
      w16(0); w16(0); w16(w); w16(h)
      out.write(if (interlace) 0x40 else 0x00)
      val rows =
        if (!interlace) (0 until h).toArray
        else Passes.flatMap { case (s, st) => s until h by st }
      val idx = new Array[Int](w * h)
      var ri = 0
      while (ri < h) {
        val y = rows(ri)
        var x = 0
        while (x < w) { idx(ri * w + x) = sample(x, y, f); x += 1 }
        ri += 1
      }
      out.write(minCode)
      val z = lzwEncode(idx, minCode)
      var o = 0
      while (o < z.length) {
        val n = math.min(255, z.length - o)
        out.write(n); out.write(z, o, n)
        o += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** 16-entry palette shared with the PNG fixture family. */
  def fixturePalette: Array[Int] = Png.fixturePalette

  /** Per-doc deterministic animated GIF, parameters id-derived so the
    * oracle recomputes every pixel of every frame.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val w = 8 + (id % 16).toInt
    val h = 8 + ((id * 3) % 16).toInt
    val frames = 1 + (id % 3).toInt
    encode(w, h, frames, fixturePalette, interlace = id % 2 == 1,
      (x, y, f) => ((x + 3L * y + 7L * f + id) % 16).toInt)
  }
}
