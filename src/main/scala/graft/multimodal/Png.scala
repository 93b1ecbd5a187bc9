package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real PNG pixel codec (pure JVM, zero native deps) — the lossless image
  * tier next to [[Jpeg]]: grayscale (0), truecolor (2), palette (3),
  * gray+alpha (4) and RGBA (6) at EVERY legal bit depth — 1/2/4-bit
  * packed rows for gray and palette (the favicon/icon shape), 8-bit, and
  * 16-bit projected to 8 via the canonical high byte — all five scanline
  * filters (None/Sub/Up/Average/Paeth), and BOTH interlace modes —
  * sequential and Adam7 (each of the 7 passes is its own
  * independently-filtered sub-image). IDAT is a genuine zlib stream
  * (java.util.zip); the encoder emits CRC-correct chunks, the decoder
  * walks the length-tagged chunk structure (payload integrity is the
  * storage layer's job — PNG CRCs are redundant under
  * parquet/object-store checksumming, so the read path skips them).
  *
  * Out-of-scope inputs reject LOUDLY (illegal depth/color-type pairs,
  * unknown color/interlace types, missing PLTE, out-of-range palette
  * indexes) — the same honest-boundary convention as the other tiers.
  *
  * The deterministic [[encode]] fixture cycles the filter type per
  * scanline (row % 5), so every filter path is exercised on every image,
  * and a position-weighted checksum downstream catches misplacement bugs
  * (a plain pixel SUM is invariant under wrong Adam7 placement).
  *
  * Reference context: the reference pipeline stores no binary media — this
  * tier is part of the beyond-reference multimodal surface (builder
  * prompt; SURVEY §5 scope note).
  */
object Png {

  /** Decoded image: pixels packed (a<<24)|(r<<16)|(g<<8)|b row-major;
    * alpha = 255 where the color type carries none.
    */
  final case class PngImage(width: Int, height: Int, colorType: Int,
      interlaced: Boolean, pixels: Array[Int])

  // Adam7 pass geometry: (x0, y0, dx, dy)
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def bpp(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case t => throw new IllegalArgumentException(s"PNG color type $t")
  }

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  def decode(p: Array[Byte]): PngImage = Torn.guard("PNG") {
    require(p.length > 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
      p(2) == 'N' && p(3) == 'G', "not a PNG signature")
    var o = 8
    var w, h, colorType, interlace, depth = -1
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && o + 8 <= p.length) {
      val len = be32(p, o)
      val typ = new String(p, o + 4, 4, "US-ASCII")
      val data = o + 8
      typ match {
        case "IHDR" =>
          w = be32(p, data); h = be32(p, data + 4)
          depth = p(data + 8) & 0xff
          colorType = p(data + 9) & 0xff
          interlace = p(data + 12) & 0xff
          // the spec's legal (depth, color-type) matrix: sub-byte depths
          // only for grayscale and palette; 16-bit for everything BUT
          // palette; anything else rejects loudly
          require(depth == 8 ||
            ((depth == 1 || depth == 2 || depth == 4) &&
              (colorType == 0 || colorType == 3)) ||
            (depth == 16 && colorType != 3),
            s"PNG bit depth $depth invalid for color type $colorType")
          bpp(colorType) // validates the type
          require(interlace == 0 || interlace == 1,
            s"PNG interlace method $interlace")
        case "PLTE" =>
          palette = Array.tabulate(len / 3) { i =>
            (0xff << 24) | ((p(data + 3 * i) & 0xff) << 16) |
              ((p(data + 3 * i + 1) & 0xff) << 8) |
              (p(data + 3 * i + 2) & 0xff)
          }
        case "IDAT" => idat.write(p, data, len)
        case "IEND" => done = true
        case _ => // ancillary chunks skipped
      }
      o = data + len + 4 // skip crc
    }
    require(w > 0 && h > 0, "PNG without a leading IHDR chunk")
    require(w.toLong * h <= (1L << 26),
      "scale guard: refusing a >64M-pixel raster from a 13-byte header")
    require(colorType != 3 || palette != null, "palette PNG without PLTE")
    val raw = inflateAll(idat.toByteArray)
    val nCh = bpp(colorType)
    val bitsPP = depth * nCh
    val step = math.max(1, bitsPP / 8) // filter byte distance
    val out = new Array[Int](w * h)
    var off = 0
    val passes =
      if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        val rowBytes = (pw * bitsPP + 7) / 8
        var prev = new Array[Byte](rowBytes)
        var ry = 0
        while (ry < ph) {
          val ft = raw(off) & 0xff; off += 1
          val cur = java.util.Arrays.copyOfRange(raw, off, off + rowBytes)
          off += rowBytes
          unfilter(ft, cur, prev, step)
          var rx = 0
          while (rx < pw) {
            out((y0 + ry * dy) * w + (x0 + rx * dx)) =
              pixelAt(cur, rx, colorType, palette, depth, nCh)
            rx += 1
          }
          prev = cur
          ry += 1
        }
      }
    }
    PngImage(w, h, colorType, interlace == 1, out)
  }

  private def inflateAll(z: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished(), "truncated PNG zlib stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val pa = math.abs(b - c); val pb = math.abs(a - c)
    val pc = math.abs(a + b - 2 * c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** In-place reverse of filter `ft` over one scanline. */
  private def unfilter(ft: Int, cur: Array[Byte], prev: Array[Byte],
      nb: Int): Unit = {
    var i = 0
    while (i < cur.length) {
      val left = if (i >= nb) cur(i - nb) & 0xff else 0
      val up = prev(i) & 0xff
      val ul = if (i >= nb) prev(i - nb) & 0xff else 0
      val x = cur(i) & 0xff
      val v = ft match {
        case 0 => x
        case 1 => x + left
        case 2 => x + up
        case 3 => x + ((left + up) >> 1)
        case 4 => x + paeth(left, up, ul)
        case t => throw new IllegalArgumentException(s"PNG filter $t")
      }
      cur(i) = (v & 0xff).toByte
      i += 1
    }
  }

  /** Channel `c` of pixel `x` in an unfiltered scanline at any legal
    * bit depth: sub-byte depths unpack MSB-first; 16-bit keeps the high
    * byte (the standard 16→8 projection — the low byte is the same
    * value repeated for spec-conformant scaling, so this is exact for
    * v*257-shaped samples and the canonical downsample otherwise).
    */
  private def chanAt(row: Array[Byte], x: Int, c: Int, nCh: Int,
      depth: Int): Int = depth match {
    case 8 => row(x * nCh + c) & 0xff
    case 16 => row((x * nCh + c) * 2) & 0xff
    case d =>
      val bitOff = (x * nCh + c) * d
      ((row(bitOff >> 3) & 0xff) >> (8 - d - (bitOff & 7))) &
        ((1 << d) - 1)
  }

  // 255/(2^d - 1): the spec's sample scaling to full 8-bit range
  private def grayScaleFactor(depth: Int): Int = depth match {
    case 1 => 255; case 2 => 85; case 4 => 17; case _ => 1
  }

  private def pixelAt(row: Array[Byte], x: Int, ct: Int,
      pal: Array[Int], depth: Int, nCh: Int): Int = {
    def ch(c: Int) = chanAt(row, x, c, nCh, depth)
    ct match {
      case 0 =>
        val v = ch(0) * grayScaleFactor(depth)
        (0xff << 24) | (v << 16) | (v << 8) | v
      case 2 =>
        (0xff << 24) | (ch(0) << 16) | (ch(1) << 8) | ch(2)
      case 3 =>
        val i = ch(0)
        require(i < pal.length,
          s"palette index $i past the ${pal.length}-entry PLTE")
        pal(i)
      case 4 =>
        val v = ch(0) * grayScaleFactor(depth)
        (ch(1) << 24) | (v << 16) | (v << 8) | v
      case 6 =>
        (ch(3) << 24) | (ch(0) << 16) | (ch(1) << 8) | ch(2)
    }
  }

  // -------------------------------------------------------------------
  // Deterministic encoder fixture

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def w32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    w32(data.length)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    w32(crc.getValue.toInt)
  }

  /** Real PNG encoder: `sample(x, y, c)` supplies channel c of pixel
    * (x, y) — for color type 3 it supplies the PALETTE INDEX (c = 0).
    * Scanline filters cycle 0..4 over a global row counter so every
    * filter path is exercised; Adam7 output when `interlace`.
    */
  def encode(w: Int, h: Int, colorType: Int, interlace: Boolean,
      sample: (Int, Int, Int) => Int,
      palette: Array[Int] = null): Array[Byte] = {
    val nb = bpp(colorType)
    val raw = new java.io.ByteArrayOutputStream()
    var rowCounter = 0
    val passes = if (interlace) Adam7 else Array((0, 0, 1, 1))
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        var prev = new Array[Byte](pw * nb)
        var ry = 0
        while (ry < ph) {
          val cur = new Array[Byte](pw * nb)
          var rx = 0
          while (rx < pw) {
            var c = 0
            while (c < nb) {
              cur(rx * nb + c) =
                (sample(x0 + rx * dx, y0 + ry * dy, c) & 0xff).toByte
              c += 1
            }
            rx += 1
          }
          val ft = rowCounter % 5
          rowCounter += 1
          raw.write(ft)
          var i = 0
          while (i < cur.length) {
            val left = if (i >= nb) cur(i - nb) & 0xff else 0
            val up = prev(i) & 0xff
            val ul = if (i >= nb) prev(i - nb) & 0xff else 0
            val x = cur(i) & 0xff
            val enc = ft match {
              case 0 => x
              case 1 => x - left
              case 2 => x - up
              case 3 => x - ((left + up) >> 1)
              case 4 => x - paeth(left, up, ul)
            }
            raw.write(enc & 0xff)
            i += 1
          }
          prev = cur
          ry += 1
        }
      }
    }
    val defl = new Deflater()
    defl.setInput(raw.toByteArray)
    defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    def p32(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = ((v >>> 24) & 0xff).toByte; a(o + 1) = ((v >>> 16) & 0xff).toByte
      a(o + 2) = ((v >>> 8) & 0xff).toByte; a(o + 3) = (v & 0xff).toByte
    }
    p32(ihdr, 0, w); p32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = if (interlace) 1 else 0
    chunk(out, "IHDR", ihdr)
    if (colorType == 3) {
      require(palette != null, "palette encode needs a PLTE")
      val pl = new Array[Byte](palette.length * 3)
      palette.zipWithIndex.foreach { case (rgb, i) =>
        pl(3 * i) = ((rgb >> 16) & 0xff).toByte
        pl(3 * i + 1) = ((rgb >> 8) & 0xff).toByte
        pl(3 * i + 2) = (rgb & 0xff).toByte
      }
      chunk(out, "PLTE", pl)
    }
    chunk(out, "IDAT", zout.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Depth-capable encoder (spec-exercise surface): `sample(x, y, c)`
    * supplies RAW channel samples in [0, 2^depth) — palette indexes for
    * color type 3 — packed MSB-first for sub-byte depths and big-endian
    * for 16-bit, with the filter type cycling 0..4 over a global row
    * counter like [[encode]]. `interlace` emits the Adam7 pass
    * structure, each pass re-packed from bit 0 of its own scanlines —
    * the sub-byte/16-bit row packing under interlace the decoder must
    * mirror.
    */
  def encodeDepth(w: Int, h: Int, colorType: Int, depth: Int,
      sample: (Int, Int, Int) => Int,
      palette: Array[Int] = null,
      interlace: Boolean = false): Array[Byte] = {
    require(depth == 8 ||
      ((depth == 1 || depth == 2 || depth == 4) &&
        (colorType == 0 || colorType == 3)) ||
      (depth == 16 && colorType != 3),
      s"depth $depth invalid for color type $colorType")
    val nCh = bpp(colorType)
    val bitsPP = depth * nCh
    val step = math.max(1, bitsPP / 8)
    val raw = new java.io.ByteArrayOutputStream()
    var rowCounter = 0
    val passes = if (interlace) Adam7 else Array((0, 0, 1, 1))
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (pw > 0 && ph > 0) {
        val rowBytes = (pw * bitsPP + 7) / 8
        var prev = new Array[Byte](rowBytes)
        var ry = 0
        while (ry < ph) {
          val cur = new Array[Byte](rowBytes)
          var bitPos = 0
          def put(v: Int, n: Int): Unit = {
            var i = n - 1
            while (i >= 0) {
              if (((v >> i) & 1) != 0)
                cur(bitPos >> 3) =
                  (cur(bitPos >> 3) | (0x80 >> (bitPos & 7))).toByte
              bitPos += 1
              i -= 1
            }
          }
          var rx = 0
          while (rx < pw) {
            var c = 0
            while (c < nCh) {
              put(sample(x0 + rx * dx, y0 + ry * dy, c), depth); c += 1
            }
            rx += 1
          }
          val ft = rowCounter % 5
          rowCounter += 1
          raw.write(ft)
          var i = 0
          while (i < rowBytes) {
            val left = if (i >= step) cur(i - step) & 0xff else 0
            val up = prev(i) & 0xff
            val ul = if (i >= step) prev(i - step) & 0xff else 0
            val v = cur(i) & 0xff
            raw.write((ft match {
              case 0 => v
              case 1 => v - left
              case 2 => v - up
              case 3 => v - ((left + up) >> 1)
              case 4 => v - paeth(left, up, ul)
            }) & 0xff)
            i += 1
          }
          prev = cur
          ry += 1
        }
      }
    }
    val defl = new Deflater()
    defl.setInput(raw.toByteArray)
    defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    def p32(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = ((v >>> 24) & 0xff).toByte; a(o + 1) = ((v >>> 16) & 0xff).toByte
      a(o + 2) = ((v >>> 8) & 0xff).toByte; a(o + 3) = (v & 0xff).toByte
    }
    p32(ihdr, 0, w); p32(ihdr, 4, h)
    ihdr(8) = depth.toByte; ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = if (interlace) 1 else 0
    chunk(out, "IHDR", ihdr)
    if (colorType == 3) {
      require(palette != null, "palette encode needs a PLTE")
      val pl = new Array[Byte](palette.length * 3)
      palette.zipWithIndex.foreach { case (rgb, i) =>
        pl(3 * i) = ((rgb >> 16) & 0xff).toByte
        pl(3 * i + 1) = ((rgb >> 8) & 0xff).toByte
        pl(3 * i + 2) = (rgb & 0xff).toByte
      }
      chunk(out, "PLTE", pl)
    }
    chunk(out, "IDAT", zout.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Closed-form fixture family (mirrored by the DuckDB oracle)

  /** Palette i → (17i, 29i, 43i) mod 256, 16 entries. */
  def fixturePalette: Array[Int] = Array.tabulate(16) { i =>
    (0xff << 24) | (((i * 17) % 256) << 16) | (((i * 29) % 256) << 8) |
      ((i * 43) % 256)
  }

  /** Per-doc deterministic PNG: dims, color type, and interlace mode all
    * derive from the id; channel values follow the linear-congruential
    * formula the oracle recomputes.
    */
  def fixturePayload(id: Long): Array[Byte] = {
    val w = 8 + (id % 24).toInt
    val h = 8 + ((id * 3) % 24).toInt
    val ct = Array(0, 2, 3, 6)((id % 4).toInt)
    val il = id % 2 == 1
    if (ct == 3)
      encode(w, h, ct, il,
        (x, y, _) => ((x + y + id) % 16).toInt, fixturePalette)
    else
      encode(w, h, ct, il,
        (x, y, c) => ((x * 7 + y * 13 + id * 31 + c * 5) % 256).toInt)
  }
}
