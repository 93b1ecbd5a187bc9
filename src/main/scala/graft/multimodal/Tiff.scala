package graft.multimodal

/** Baseline TIFF 6.0 decoder (pure JVM) — the scanned-document /
  * archival member of the image family, and the only one whose container
  * is endian-switchable: both `II` (little) and `MM` (big) byte orders,
  * the IFD tag walk (SHORT/LONG values, inline when they fit 4 bytes),
  * BOTH data organizations — strips with any RowsPerStrip, and §15
  * tiles (TileWidth/TileLength multiples of 16, row-major tile walk,
  * edge padding clipped on copy-out) — all four common chunk
  * compressions — none, LZW (the spec §13 MSB-first early-change
  * variant), Deflate (8) and PackBits (32773) — the photometric
  * interpretations a baseline reader must know — BlackIsZero /
  * WhiteIsZero grayscale (8- and 16-bit, high-byte projection), chunky
  * RGB, and RGBPalette through the 16-bit-per-entry ColorMap — and
  * PlanarConfiguration 2 (component-planar strip RGB, §14).
  *
  * Out-of-scope shapes reject LOUDLY by name (16-bit color, planar
  * tiles, JPEG-in-TIFF compression, sub-byte depths, mixed strip+tile
  * tag sets) — the honest-boundary convention of the other tiers.
  * [[Exif]] walks the same IFD grammar for JPEG APP1 metadata; this
  * module owns actual TIFF pixel data.
  *
  * Format is the public Adobe TIFF 6.0 specification. Beyond-reference
  * multimodal surface (SURVEY §5 scope).
  */
object Tiff {

  final case class TiffImage(width: Int, height: Int, photometric: Int,
      compression: Int, pixels: Array[Int])

  private final class Reader(p: Array[Byte], le: Boolean) {
    def u8(o: Int): Int = p(o) & 0xff
    def u16(o: Int): Int =
      if (le) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long =
      if (le) u16(o).toLong | (u16(o + 2).toLong << 16)
      else (u16(o).toLong << 16) | u16(o + 2).toLong
  }

  def decode(p: Array[Byte]): TiffImage = {
    require(p.length >= 8, "not a TIFF: shorter than the header")
    val le = p(0) == 'I' && p(1) == 'I'
    val be = p(0) == 'M' && p(1) == 'M'
    require(le || be, "not a TIFF: bad byte-order mark")
    val r = new Reader(p, le)
    require(r.u16(2) == 42, "not a TIFF: magic is not 42")
    val ifd = r.u32(4)
    require(ifd >= 8 && ifd + 2 <= p.length, "torn TIFF: IFD offset")
    val o = ifd.toInt
    val n = r.u16(o)
    require(o + 2 + 12 * n + 4 <= p.length, "torn TIFF: IFD overruns")

    var w, h = -1
    var bits = 8
    var compression = 1
    var photometric = -1
    var samplesPP = 1
    var rowsPerStrip = Int.MaxValue
    var planar = 1
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var tileW, tileL = -1
    var tileOffsets: Array[Long] = null
    var tileCounts: Array[Long] = null
    var colorMapOff = -1L
    var colorMapCount = 0

    // a tag's value array: SHORT(3) or LONG(4), inline iff it fits
    def values(e: Int): Array[Long] = {
      val typ = r.u16(e + 2)
      val count = r.u32(e + 4)
      require(typ == 3 || typ == 4,
        s"unsupported IFD value type $typ (baseline uses SHORT/LONG)")
      val unit = if (typ == 3) 2 else 4
      require(count >= 1, "torn TIFF: zero-count IFD entry")
      require(count <= Int.MaxValue / unit, "IFD count overflows")
      val nBytes = unit * count.toInt
      val off =
        if (nBytes <= 4) e + 8
        else {
          val v = r.u32(e + 8)
          require(v + nBytes <= p.length,
            "torn TIFF: IFD value overruns the file")
          v.toInt
        }
      Array.tabulate(count.toInt) { i =>
        if (typ == 3) r.u16(off + 2 * i).toLong else r.u32(off + 4 * i)
      }
    }

    var i = 0
    while (i < n) {
      val e = o + 2 + 12 * i
      val tag = r.u16(e)
      tag match {
        case 256 => w = values(e)(0).toInt
        case 257 => h = values(e)(0).toInt
        case 258 =>
          val v = values(e)
          require(v.forall(_ == v(0)) && (v(0) == 8 || v(0) == 16),
            s"bit depth ${v.mkString("/")} unsupported (8/16 baseline)")
          bits = v(0).toInt
        case 259 =>
          compression = values(e)(0).toInt
          require(compression == 1 || compression == 5 ||
            compression == 8 || compression == 32773,
            s"compression $compression unsupported " +
              "(uncompressed / LZW / Deflate / PackBits)")
        case 262 =>
          photometric = values(e)(0).toInt
          require(photometric >= 0 && photometric <= 3,
            s"photometric $photometric unsupported")
        case 273 => stripOffsets = values(e)
        case 277 => samplesPP = values(e)(0).toInt
        case 278 => rowsPerStrip = values(e)(0).toInt
        case 279 => stripCounts = values(e)
        case 284 =>
          planar = values(e)(0).toInt
          require(planar == 1 || planar == 2,
            s"planar configuration $planar undefined")
        case 320 =>
          val typ = r.u16(e + 2)
          require(typ == 3, "ColorMap must be SHORT")
          colorMapCount = r.u32(e + 4).toInt
          colorMapOff = r.u32(e + 8)
        case 322 => tileW = values(e)(0).toInt
        case 323 => tileL = values(e)(0).toInt
        case 324 => tileOffsets = values(e)
        case 325 => tileCounts = values(e)
        case _ => () // ancillary tags skipped
      }
      i += 1
    }
    require(w > 0 && h > 0, "TIFF without ImageWidth/ImageLength")
    require(w.toLong * h <= (1L << 26),
      "scale guard: refusing a >64M-pixel raster from the IFD alone")
    require(photometric >= 0, "TIFF without PhotometricInterpretation")
    val tiled = tileW > 0 || tileL > 0 || tileOffsets != null ||
      tileCounts != null
    if (tiled) {
      require(stripOffsets == null && stripCounts == null,
        "TIFF mixes strip and tile organization")
      require(tileW > 0 && tileL > 0 && tileOffsets != null &&
        tileCounts != null && tileOffsets.length == tileCounts.length,
        "tiled TIFF without matching " +
          "TileWidth/TileLength/TileOffsets/TileByteCounts")
      require(tileW % 16 == 0 && tileL % 16 == 0,
        s"tile dims $tileW x $tileL must be multiples of 16 (spec §15)")
    } else require(stripOffsets != null && stripCounts != null &&
      stripOffsets.length == stripCounts.length,
      "TIFF without matching StripOffsets/StripByteCounts")
    require(bits == 8 || (samplesPP == 1 && photometric <= 1),
      "16-bit samples supported for grayscale only")
    require(planar == 1 || (photometric == 2 && !tiled && bits == 8),
      "planar configuration 2 supported for 8-bit strip RGB only")
    val expSamples = if (photometric == 2) 3 else 1
    require(samplesPP == expSamples,
      s"SamplesPerPixel $samplesPP contradicts photometric $photometric")
    val palette: Array[Int] =
      if (photometric == 3) {
        require(colorMapOff >= 0, "palette TIFF without ColorMap")
        val per = colorMapCount / 3
        require(per == 256, s"ColorMap of $colorMapCount entries " +
          "contradicts 8-bit palette")
        require(colorMapOff + 2L * colorMapCount <= p.length,
          "torn TIFF: ColorMap overruns")
        Array.tabulate(per) { j =>
          // 16-bit entries; the canonical 8-bit projection is the high byte
          def c(k: Int) =
            r.u16((colorMapOff + 2 * (k * per + j)).toInt) >> 8
          (0xff << 24) | (c(0) << 16) | (c(1) << 8) | c(2)
        }
      } else null

    // one compressed chunk (strip or tile) → exactly `need` raw bytes
    def decompressChunk(kind: String, idx: Int, off: Long, cnt: Long,
        need: Int): Array[Byte] = {
      require(off >= 0 && off + cnt <= p.length,
        s"torn TIFF: $kind $idx overruns the file")
      if (compression == 1) {
        require(cnt == need, s"$kind $idx holds $cnt bytes, expected $need")
        java.util.Arrays.copyOfRange(p, off.toInt, off.toInt + need)
      } else if (compression == 5) {
        lzwDecode(p, off.toInt, cnt.toInt, need)
      } else if (compression == 8) {
        val inf = new java.util.zip.Inflater()
        inf.setInput(p, off.toInt, cnt.toInt)
        val dst = new Array[Byte](need)
        var got = 0
        while (got < need && !inf.finished()) {
          val n2 = inf.inflate(dst, got, need - got)
          require(n2 > 0 || inf.finished(),
            s"truncated Deflate $kind $idx")
          got += n2
        }
        inf.end()
        require(got == need, s"Deflate $kind $idx yields $got of $need")
        dst
      } else { // PackBits
        val out = new Array[Byte](need)
        var src = off.toInt
        val end = (off + cnt).toInt
        var dst = 0
        while (dst < need) {
          require(src < end, s"torn PackBits $kind $idx")
          val ctl = p(src).toInt; src += 1
          if (ctl >= 0) {
            val len = ctl + 1
            require(src + len <= end && dst + len <= need,
              s"PackBits literal overruns $kind $idx")
            System.arraycopy(p, src, out, dst, len)
            src += len; dst += len
          } else if (ctl != -128) { // -128 is a no-op per the spec
            val len = 1 - ctl
            require(src < end && dst + len <= need,
              s"PackBits run overruns $kind $idx")
            java.util.Arrays.fill(out, dst, dst + len, p(src))
            src += 1; dst += len
          }
        }
        out
      }
    }

    // decode strips or tiles to one contiguous sample buffer: chunky
    // interleaved rows normally; for planar config 2, three w*h
    // component planes back to back (same total size: rowBytes = 3w)
    val bytesPS = bits / 8
    val rowBytes = w * samplesPP * bytesPS
    val data = new Array[Byte](rowBytes * h)
    if (tiled) {
      // §15: tiles are FULL tileW x tileL rasters left-to-right,
      // top-to-bottom; edge tiles carry padding the copy below clips
      val across = (w + tileW - 1) / tileW
      val down = (h + tileL - 1) / tileL
      require(tileOffsets.length == across * down,
        s"${tileOffsets.length} tiles, expected ${across * down} " +
          s"($across x $down)")
      val tileRowBytes = tileW * samplesPP * bytesPS
      val need = tileRowBytes * tileL
      var t = 0
      while (t < tileOffsets.length) {
        val dec = decompressChunk("tile", t, tileOffsets(t),
          tileCounts(t), need)
        val tx = (t % across) * tileW
        val ty = (t / across) * tileL
        val copyRows = math.min(tileL, h - ty)
        val copyBytes = math.min(tileW, w - tx) * samplesPP * bytesPS
        var ry = 0
        while (ry < copyRows) {
          System.arraycopy(dec, ry * tileRowBytes, data,
            (ty + ry) * rowBytes + tx * samplesPP * bytesPS, copyBytes)
          ry += 1
        }
        t += 1
      }
    } else if (planar == 2) {
      // component-planar strips: all of plane 0's strips, then plane 1,
      // then plane 2, each plane sliced by RowsPerStrip like a chunky
      // single-component image (spec §14, PlanarConfiguration 2)
      require(stripOffsets.length % 3 == 0,
        s"planar RGB needs 3N strips, got ${stripOffsets.length}")
      val perPlane = stripOffsets.length / 3
      val rps = math.min(rowsPerStrip, h)
      var sIdx = 0
      while (sIdx < stripOffsets.length) {
        val plane = sIdx / perPlane
        val row0 = (sIdx % perPlane) * rps
        val rows = math.min(rps, h - row0)
        require(rows > 0, "more planar strips than image rows")
        val need = rows * w
        val dec = decompressChunk("strip", sIdx, stripOffsets(sIdx),
          stripCounts(sIdx), need)
        System.arraycopy(dec, 0, data, plane * w * h + row0 * w, need)
        sIdx += 1
      }
      require(perPlane.toLong * rps >= h,
        s"planar strips cover only ${perPlane * rps} of $h rows")
    } else {
      var row = 0
      var s = 0
      while (s < stripOffsets.length) {
        val rows = math.min(rowsPerStrip, h - row)
        require(rows > 0, "more strips than image rows")
        val need = rows * rowBytes
        val dec = decompressChunk("strip", s, stripOffsets(s),
          stripCounts(s), need)
        System.arraycopy(dec, 0, data, row * rowBytes, need)
        row += rows
        s += 1
      }
      require(row >= h, s"strips cover only $row of $h rows")
    }

    // channel c of pixel j, projected to 8 bits: planar reads its
    // plane; 16-bit samples keep the high byte (byte-order aware), the
    // canonical 16->8 projection — exact for v*257-shaped samples
    def sampleAt(j: Int, c: Int): Int =
      if (planar == 2) data(c * w * h + j) & 0xff
      else if (bits == 8) data(j * samplesPP + c) & 0xff
      else {
        val o2 = (j * samplesPP + c) * 2
        if (le) data(o2 + 1) & 0xff else data(o2) & 0xff
      }
    val out = new Array[Int](w * h)
    var j = 0
    while (j < w * h) {
      out(j) = photometric match {
        case 0 => // WhiteIsZero: invert to the usual scale
          val v = 255 - sampleAt(j, 0)
          (0xff << 24) | (v << 16) | (v << 8) | v
        case 1 =>
          val v = sampleAt(j, 0)
          (0xff << 24) | (v << 16) | (v << 8) | v
        case 2 =>
          (0xff << 24) | (sampleAt(j, 0) << 16) |
            (sampleAt(j, 1) << 8) | sampleAt(j, 2)
        case _ => palette(sampleAt(j, 0))
      }
      j += 1
    }
    TiffImage(w, h, photometric, compression, out)
  }

  /** TIFF-variant LZW decode (spec §13): MSB-first code packing,
    * ClearCode 256 / EOI 257, 9→12-bit widths with the EARLY change —
    * width bumps as soon as the next free entry is `2^w - 1` (one code
    * sooner than GIF's LSB variant, the libtiff-compatible rule).
    */
  private def lzwDecode(p: Array[Byte], off: Int, len: Int,
      outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var outN = 0
    var bitPos = 0L
    def code(bits: Int): Int = {
      require(bitPos + bits <= len.toLong * 8, "torn LZW strip")
      var v = 0
      var i = 0
      while (i < bits) {
        val bp = bitPos + i
        v = (v << 1) |
          ((p(off + (bp >> 3).toInt) >> (7 - (bp & 7).toInt)) & 1)
        i += 1
      }
      bitPos += bits
      v
    }
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val strLen = new Array[Int](4096)
    val first = new Array[Byte](4096)
    var i = 0
    while (i < 256) {
      prefix(i) = -1; suffix(i) = i.toByte; strLen(i) = 1
      first(i) = i.toByte
      i += 1
    }
    var next = 258
    var width = 9
    var prev = -1
    def emit(c: Int): Unit = {
      val l = strLen(c)
      require(outN + l <= outLen, "LZW output overruns the strip")
      var j = outN + l - 1
      var cc = c
      while (cc >= 0) { out(j) = suffix(cc); j -= 1; cc = prefix(cc) }
      outN += l
    }
    def add(pfx: Int, fb: Byte): Unit = {
      require(next < 4096, "LZW table overflow without a ClearCode")
      prefix(next) = pfx; suffix(next) = fb
      strLen(next) = strLen(pfx) + 1; first(next) = first(pfx)
      next += 1
      // EARLY change, decode side: width bumps as soon as the next free
      // entry is 2^w - 1 (libtiff / JDK TIFFLZWDecompressor convention);
      // the encoder — whose table runs exactly one entry ahead at the
      // same stream position — bumps at 2^w
      if (next == (1 << width) - 1 && width < 12) width += 1
    }
    var done = false
    while (!done && outN < outLen) {
      val c = code(width)
      if (c == 256) { next = 258; width = 9; prev = -1 }
      else if (c == 257) done = true
      else if (prev == -1) {
        require(c < 256, s"first LZW code after clear must be literal, got $c")
        emit(c); prev = c
      } else if (c < next) {
        add(prev, first(c))
        emit(c); prev = c
      } else if (c == next) { // KwKwK
        add(prev, first(prev))
        emit(c); prev = c
      } else throw new IllegalArgumentException(
        s"LZW code $c beyond table $next")
    }
    require(outN == outLen, s"LZW strip yields $outN of $outLen bytes")
    out
  }

  /** The matching LZW compressor (fixture side), same early-change
    * rule; emits a leading ClearCode and a mid-stream one whenever the
    * table approaches full, like libtiff.
    */
  def lzwEncode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    var width = 9
    def put(c: Int): Unit = {
      acc = (acc << width) | c
      nBits += width
      while (nBits >= 8) {
        out.write(((acc >> (nBits - 8)) & 0xff).toInt)
        nBits -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = 258
    def reset(): Unit = { dict.clear(); next = 258 }
    put(256)
    var prev = -1
    var i = 0
    while (i < src.length) {
      val b = src(i) & 0xff
      if (prev == -1) prev = b
      else {
        val key = (prev << 8) | b
        val hit = dict.get(key)
        if (hit != null) prev = hit
        else {
          put(prev)
          dict.put(key, next)
          next += 1
          // see lzwDecode: the encode-side early change fires at 2^w
          if (next == (1 << width) && width < 12) width += 1
          else if (next >= 4094) { put(256); width = 9; reset() }
          prev = b
        }
      }
      i += 1
    }
    if (prev != -1) put(prev)
    put(257)
    if (nBits > 0) out.write(((acc << (8 - nBits)) & 0xff).toInt)
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Encoder (fixture side)

  /** Real PackBits compression: replicate runs of 3+ become (1-len, v),
    * literals accumulate up to 128 — the canonical Apple algorithm.
    */
  def packBits(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < src.length) {
      var run = 1
      while (i + run < src.length && run < 128 &&
        src(i + run) == src(i)) run += 1
      if (run >= 3) {
        out.write(1 - run)
        out.write(src(i))
        i += run
      } else {
        var lit = i + run
        var litRun = 1
        while (lit < src.length && lit - i < 128 && litRun < 3) {
          litRun = 1
          while (lit + litRun < src.length && litRun < 3 &&
            src(lit + litRun) == src(lit)) litRun += 1
          if (litRun < 3) lit += litRun
        }
        val len = math.min(lit - i, 128) // literal control byte caps at 128
        out.write(len - 1)
        out.write(src, i, len)
        i += len
      }
    }
    out.toByteArray
  }

  /** One-IFD TIFF writer: `photometric` 0 (WhiteIsZero gray, samples
    * stored raw), 1 (gray), 2 (RGB) or 3 (palette, 256
    * 16-bit-per-channel entries derived from `palette`); `le` picks the
    * byte order; `compression` 1 (none), 5 (LZW), 8 (Deflate) or 32773
    * (PackBits) applied per chunk. Organization: strips sliced by
    * `rowsPerStrip`, or — when `tileW`/`tileL` are set (multiples of
    * 16 per spec §15) — full-size tiles left-to-right top-to-bottom
    * with zero padding past the image edge. `bitsPerSample` 16 stores
    * byte-ordered 16-bit grayscale; `planar` 2 stores strip RGB as
    * three component planes (plane-major strip order).
    */
  def encode(w: Int, h: Int, photometric: Int, le: Boolean,
      compression: Int, rowsPerStrip: Int,
      sample: (Int, Int, Int) => Int,
      palette: Array[Int] = null,
      tileW: Int = 0, tileL: Int = 0,
      bitsPerSample: Int = 8, planar: Int = 1): Array[Byte] = {
    require(photometric >= 0 && photometric <= 3)
    require(compression == 1 || compression == 5 || compression == 8 ||
      compression == 32773, s"writer compression $compression")
    val tiledOut = tileW > 0 || tileL > 0
    require(!tiledOut || (tileW % 16 == 0 && tileL % 16 == 0 &&
      tileW > 0 && tileL > 0), "tile dims must be positive multiples of 16")
    require(bitsPerSample == 8 ||
      (bitsPerSample == 16 && photometric <= 1),
      "writer: 16-bit samples for grayscale only")
    require(planar == 1 ||
      (planar == 2 && photometric == 2 && !tiledOut && bitsPerSample == 8),
      "writer: planar config 2 for 8-bit strip RGB only")
    val bps = bitsPerSample / 8
    val spp = if (photometric == 2) 3 else 1
    val rowBytes = w * spp * bps
    def compress(raw: Array[Byte]): Array[Byte] = compression match {
      case 1 => raw
      case 5 => lzwEncode(raw)
      case 8 =>
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val zo = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 14)
        while (!d.finished()) zo.write(buf, 0, d.deflate(buf))
        d.end()
        zo.toByteArray
      case _ => packBits(raw)
    }
    // store one sample at byte offset `o` (1 or 2 bytes, byte-ordered)
    def putSample(raw: Array[Byte], o: Int, v: Int): Unit =
      if (bps == 1) raw(o) = (v & 0xff).toByte
      else if (le) {
        raw(o) = (v & 0xff).toByte
        raw(o + 1) = ((v >> 8) & 0xff).toByte
      } else {
        raw(o) = ((v >> 8) & 0xff).toByte
        raw(o + 1) = (v & 0xff).toByte
      }
    val across = if (tiledOut) (w + tileW - 1) / tileW else 0
    val down = if (tiledOut) (h + tileL - 1) / tileL else 0
    val chunkData: Array[Array[Byte]] =
      if (tiledOut) Array.tabulate(across * down) { t =>
        val tx = (t % across) * tileW
        val ty = (t / across) * tileL
        val raw = new Array[Byte](tileW * tileL * spp * bps)
        for (ry <- 0 until tileL; x <- 0 until tileW; c <- 0 until spp) {
          val gx = tx + x; val gy = ty + ry
          if (gx < w && gy < h)
            putSample(raw, ((ry * tileW + x) * spp + c) * bps,
              sample(gx, gy, c))
        }
        compress(raw)
      } else if (planar == 2) {
        // plane-major strips: all component-0 strips, then 1, then 2
        val strips = (h + rowsPerStrip - 1) / rowsPerStrip
        Array.tabulate(3 * strips) { si =>
          val c = si / strips
          val s = si % strips
          val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
          val raw = new Array[Byte](rows * w)
          for (ry <- 0 until rows; x <- 0 until w)
            raw(ry * w + x) =
              (sample(x, s * rowsPerStrip + ry, c) & 0xff).toByte
          compress(raw)
        }
      } else {
        val strips = (h + rowsPerStrip - 1) / rowsPerStrip
        Array.tabulate(strips) { s =>
          val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
          val raw = new Array[Byte](rows * rowBytes)
          for (ry <- 0 until rows; x <- 0 until w; c <- 0 until spp)
            putSample(raw, ry * rowBytes + (x * spp + c) * bps,
              sample(x, s * rowsPerStrip + ry, c))
          compress(raw)
        }
      }
    val nChunks = chunkData.length
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (le) { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
      else { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    w16(42)
    w32(8) // IFD right after the header
    // strips carry 273/278/279 (3 tags); tiles carry 322/323/324/325 (4)
    val nTags = (if (tiledOut) 10 else 9) +
      (if (photometric == 3) 1 else 0) + (if (planar == 2) 1 else 0)
    // layout: header(8) IFD(2 + 12n + 4) [chunk offset/count arrays if
    // needed] [BitsPerSample array for RGB] [ColorMap] chunk data
    var tail = 8 + 2 + 12 * nTags + 4
    val chunkOffArr = if (nChunks > 1) { val a = tail; tail += 4 * nChunks; a }
      else -1
    val chunkCntArr = if (nChunks > 1) { val a = tail; tail += 4 * nChunks; a }
      else -1
    val bpsArr = if (spp == 3) { val a = tail; tail += 6; a } else -1
    val cmapArr = if (photometric == 3) { val a = tail; tail += 1536; a }
      else -1
    val dataStart = tail
    val chunkOffs = chunkData.scanLeft(dataStart.toLong)(_ + _.length)
    w16(nTags)
    def tag(t: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(t); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value.toInt); w16(0) }
      else w32(value)
    }
    tag(256, 4, 1, w)
    tag(257, 4, 1, h)
    if (spp == 3) tag(258, 3, 3, bpsArr)
    else tag(258, 3, 1, bitsPerSample)
    tag(259, 3, 1, compression)
    tag(262, 3, 1, photometric)
    if (!tiledOut) {
      if (nChunks > 1) tag(273, 4, nChunks, chunkOffArr)
      else tag(273, 4, 1, chunkOffs(0))
    }
    tag(277, 3, 1, spp)
    if (!tiledOut) {
      tag(278, 4, 1, rowsPerStrip)
      if (nChunks > 1) tag(279, 4, nChunks, chunkCntArr)
      else tag(279, 4, 1, chunkData(0).length)
    }
    if (planar == 2) tag(284, 3, 1, 2)
    if (photometric == 3) tag(320, 3, 768, cmapArr)
    if (tiledOut) { // tags stay ascending: 320 < 322
      tag(322, 4, 1, tileW)
      tag(323, 4, 1, tileL)
      if (nChunks > 1) tag(324, 4, nChunks, chunkOffArr)
      else tag(324, 4, 1, chunkOffs(0))
      if (nChunks > 1) tag(325, 4, nChunks, chunkCntArr)
      else tag(325, 4, 1, chunkData(0).length)
    }
    w32(0) // no next IFD
    if (nChunks > 1) {
      chunkOffs.init.foreach(w32)
      chunkData.foreach(d => w32(d.length))
    }
    if (spp == 3) { w16(8); w16(8); w16(8) }
    if (photometric == 3) {
      require(palette != null && palette.length == 256,
        "palette encode needs 256 entries")
      for (c <- 0 until 3; j <- 0 until 256) {
        val v8 = (palette(j) >> (16 - 8 * c)) & 0xff
        w16(v8 * 257) // 8→16-bit expansion
      }
    }
    chunkData.foreach(d => out.write(d, 0, d.length))
    out.toByteArray
  }

  /** Per-doc deterministic TIFF: photometric, byte order, compression
    * (rotating none/PackBits/LZW/Deflate) and organization — strip
    * slicing for id%5 in {0,1,2}, 16x16 / 32x16 TILES for id%5 in
    * {3,4} (edge tiles carry real padding since w<=32, h<=20) — all
    * derive from the id; the run-friendly sample formula (x/5
    * plateaus) makes PackBits replicate runs and LZW repeats real.
    * Rotation is lossless, so the decoded pixels keep the closed form
    * for every id.
    */
  def fixturePalette: Array[Int] = Array.tabulate(256) { i =>
    (0xff << 24) | (((i * 37) % 256) << 16) | (((i * 59) % 256) << 8) |
      ((i * 83) % 256)
  }

  def fixturePayload(id: Long): Array[Byte] = {
    val w = 16 + (id % 17).toInt
    val h = 8 + ((id * 3) % 13).toInt
    val photometric = Array(1, 2, 3)((id % 3).toInt)
    val le = id % 2 == 0
    val compression = Array(1, 32773, 5, 8)((id % 4).toInt)
    val org = (id % 5).toInt
    val sample = (x: Int, y: Int, c: Int) =>
      ((x / 5) * 31 + y * 7 + id * 13 + c * 5).toInt % 256
    val pal = if (photometric == 3) fixturePalette else null
    // depth/planar rotation (id%7 axis, orthogonal to the others):
    // gray ids with id%7==0 store 16-bit samples shaped v*257, whose
    // high-byte projection restores v exactly; strip RGB ids with
    // id%7==1 store planar config 2 — both LOSSLESS re-layouts, so the
    // decoded pixels (and the mm_tiff_decode oracle) are unchanged
    val bits16 = photometric == 1 && id % 7 == 0
    val planar2 = photometric == 2 && org < 3 && id % 7 == 1
    val s16 = if (bits16) (x: Int, y: Int, c: Int) => sample(x, y, c) * 257
      else sample
    if (org >= 3)
      encode(w, h, photometric, le, compression, rowsPerStrip = 0,
        s16, pal, tileW = if (org == 3) 16 else 32, tileL = 16,
        bitsPerSample = if (bits16) 16 else 8)
    else
      encode(w, h, photometric, le, compression,
        Array(4, 7, 1000)(org), s16, pal,
        bitsPerSample = if (bits16) 16 else 8,
        planar = if (planar2) 2 else 1)
  }
}
